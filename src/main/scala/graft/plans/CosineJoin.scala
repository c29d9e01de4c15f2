package graft.plans

import graft.functions.ArrayCosineSimilarity
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Add, Alias, And, Ascending, Attribute, AttributeReference, AttributeSet,
  BindReferences, Descending, Divide, EqualNullSafe, EqualTo, Expression,
  Floor, GreaterThanOrEqual, JoinedRow, LessThanOrEqual, Literal, Multiply,
  NamedExpression, NullsFirst, Predicate, PredicateHelper, RowNumber,
  SortOrder, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{
  Join, LogicalPlan, Project, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.{BinaryExecNode, ProjectExec, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Transparent operator selection for similarity theta-joins — the
  * optimizer-level rung of the extension ladder, complementing the
  * as-of join's explicit custom LogicalPlan ([[AsOfJoin]]).
  *
  * A user writes the DECLARATIVE form:
  *
  *   a.crossJoin(b).filter(expr("graft_cosine(a.v, b.v) >= 0.9"))
  *
  * After predicate pushdown that is `Join(a, b, cond = cosine >= θ ∧ …)`,
  * which Spark's built-in planner can only run as a BroadcastNestedLoop /
  * Cartesian join evaluating the cosine expression per pair — allocating
  * a 64-element ArrayData per candidate. This strategy recognizes the
  * shape and plans the broadcast cosine kernel instead: the right side is
  * broadcast ONCE, vectors are extracted to primitive double[] ONCE per
  * row (norms precomputed), and each task runs a tight dot-product loop
  * over its slice of the left side — O(n·m/P) with zero per-pair
  * allocation.
  *
  * When the query's own SELECT projects the same (rounded) cosine the
  * filter thresholds on, the strategy matches `Project(..., Join(...))`
  * and the kernel EMITS the score as an extra column instead of letting
  * the projection recompute it per pair, and the kernel's output row is
  * pruned to exactly the attributes the projection and the residual
  * predicate need — so an (id, id, score) result never materializes the
  * two 64-double vectors per emitted pair.
  *
  * Bit parity: dot/na/nb accumulated left-to-right over the common prefix
  * of the two arrays — identical to ArrayCosineSimilarity's eval/codegen,
  * so the rewrite is indistinguishable from the naive plan, row for row
  * and bit for bit (norms are PREcomputed per row only when the two
  * lengths match; an unequal-length pair recomputes both norms over the
  * shared prefix exactly as the expression form does). NaN (zero vector)
  * fails `>= θ` in both paths; null arrays produce no pairs in both
  * paths. Residual conjuncts (e.g. `a.id < b.id`) are evaluated per
  * emitted pair.
  *
  * The strategy declines (returns Nil, Spark plans normally) when:
  *   - any conjunct is a left=right equi-join key — a hash join on that
  *     key with the cosine as a residual beats an O(n·m) loop;
  *   - the build side's stats exceed `spark.graft.cosineJoin
  *     .maxBroadcastBytes` (default 256 MiB) — mirroring Spark's own
  *     autoBroadcastJoinThreshold guard, so a planner rewrite can never
  *     OOM the executors on a large right side. At that scale the LSH/IVF
  *     candidate pruning path (AnnQueries) bounds the pair set instead.
  */
object CosineJoinStrategy extends SparkStrategy with PredicateHelper {

  val MAX_BROADCAST_KEY = "spark.graft.cosineJoin.maxBroadcastBytes"
  private val MAX_BROADCAST_DEFAULT: Long = 256L << 20

  /** `floor(cos * 1000.0 + 0.5) / 1000.0` — QueryGroup.r3's engine-
    * independent rounding, as the optimizer sees it. Thresholding on the
    * ROUNDED cosine is the oracle-checkable dedup form (q_dedup_embed),
    * so the strategy recognizes both the plain and the rounded shape. */
  private object R3Cosine {
    // FLOOR(double) returns LongType, so the DSL form inserts a cast back
    // to double before the division — accept it either way
    private object MaybeCastToDouble {
      def unapply(e: Expression): Option[Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.Cast(child, DoubleType, _, _) => Some(child)
        case other => Some(other)
      }
    }
    def unapply(e: Expression): Option[ArrayCosineSimilarity] = e match {
      case Divide(MaybeCastToDouble(Floor(Add(Multiply(c: ArrayCosineSimilarity,
            Literal(1000.0, DoubleType), _), Literal(0.5, DoubleType), _))),
          Literal(1000.0, DoubleType), _) => Some(c)
      case _ => None
    }
  }

  /** (cosExprOnLeft, cosExprOnRight, threshold, rounded?, residual) */
  private def extract(cond: Expression, l: LogicalPlan, r: LogicalPlan)
  : Option[(Expression, Expression, Double, Boolean, Seq[Expression])] = {
    val conjuncts = splitConjunctivePredicates(cond)
    conjuncts.iterator.map {
      case ge @ GreaterThanOrEqual(ArrayCosineSimilarity(a, b), Literal(t: Double, DoubleType)) =>
        Some((a, b, t, false, ge))
      case le @ LessThanOrEqual(Literal(t: Double, DoubleType), ArrayCosineSimilarity(a, b)) =>
        Some((a, b, t, false, le))
      case ge @ GreaterThanOrEqual(R3Cosine(c), Literal(t: Double, DoubleType)) =>
        Some((c.left, c.right, t, true, ge))
      case le @ LessThanOrEqual(Literal(t: Double, DoubleType), R3Cosine(c)) =>
        Some((c.left, c.right, t, true, le))
      case _ => None
    }.collectFirst { case Some((a, b, t, rounded, conjunct)) =>
      val rest = conjuncts.filterNot(_ eq conjunct)
      // each cosine argument must be computable from exactly one side
      if (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet))
        Some((a, b, t, rounded, rest))
      else if (b.references.subsetOf(l.outputSet) && a.references.subsetOf(r.outputSet))
        Some((b, a, t, rounded, rest))
      else None
    }.flatten
  }

  /** An equi-conjunct (l-col = r-col) means Spark's own hash joins beat
    * the O(n·m) kernel — the cosine becomes a cheap post-join residual. */
  private def hasEquiKeys(rest: Seq[Expression], l: LogicalPlan, r: LogicalPlan): Boolean =
    JoinPatterns.hasCrossSideEquiConjunct(rest, l, r)

  private def fitsBroadcast(r: LogicalPlan): Boolean = {
    val cap = SQLConf.get
      .getConfString(MAX_BROADCAST_KEY, MAX_BROADCAST_DEFAULT.toString).toLong
    val fits = r.stats.sizeInBytes <= BigInt(cap)
    if (!fits) {
      // stats-unknown inputs (LogicalRDD/checkpoints default to
      // spark.sql.defaultSizeInBytes = Long.MaxValue) land here too —
      // the pattern matched but the size guard declined, and the query
      // falls back to the O(n·m) nested-loop plan. Say so: a silent 19s
      // cliff is far harder to diagnose than this one line.
      logWarning(s"graft_cosine join pattern matched but build side " +
        s"(stats ${r.stats.sizeInBytes} B, cap $cap B — Long.MaxValue means " +
        s"stats unknown, e.g. a checkpointed/RDD input) declined the broadcast " +
        s"kernel; falling back to Spark's nested-loop plan. Raise $MAX_BROADCAST_KEY " +
        s"or materialize the build side as a sized relation to re-enable the kernel.")
    }
    fits
  }

  /** Shared planner for `Project(projList, Join)` shapes whose SELECT
    * re-projects the filter's (rounded) cosine: emit the score from the
    * kernel, prune its output row, optionally fuse a per-left-row top-k
    * (`topK` = limit + the right-side tiebreak column + its
    * nulls-first-ness). `sortKey`, when set, must be an alias of EXACTLY
    * the filter's (rounded) cosine — fusing a top-k whose window orders
    * by some OTHER cosine (unrounded, or over different vectors) would
    * prune by the wrong score and silently drop true top-k rows. */
  private def planProjectedKernel(
      projList: Seq[NamedExpression], l: LogicalPlan, r: LogicalPlan,
      cond: Expression, topK: Option[(Int, Expression, Boolean)],
      sortKey: Option[Attribute] = None): Option[SparkPlan] =
    extract(cond, l, r) match {
      case Some((lv, rv, thr, rounded, rest))
          if !hasEquiKeys(rest, l, r) && fitsBroadcast(r) =>
        // cosine is symmetric bit-for-bit (per-element multiply commutes;
        // sqrt(na)*sqrt(nb) commutes), so either argument order matches
        def sameVecs(c: ArrayCosineSimilarity): Boolean =
          (c.left.semanticEquals(lv) && c.right.semanticEquals(rv)) ||
            (c.left.semanticEquals(rv) && c.right.semanticEquals(lv))
        def isScore(e: Expression): Boolean = e match {
          case R3Cosine(c) if rounded => sameVecs(c)
          case c: ArrayCosineSimilarity if !rounded => sameVecs(c)
          case _ => false
        }
        val sortKeyIsScore = sortKey.forall(sa => projList.exists {
          case a @ Alias(child, _) => a.exprId == sa.exprId && isScore(child)
          case _ => false
        })
        if (!projList.exists(_.exists(isScore)) || !sortKeyIsScore) None
        else {
          val scoreAttr = AttributeReference("_cos_score", DoubleType, nullable = false)()
          val newProj = projList.map(ne =>
            ne.transformDown { case e if isScore(e) => scoreAttr }
              .asInstanceOf[NamedExpression])
          val needed = AttributeSet(newProj.flatMap(_.references) ++ rest.flatMap(_.references))
          val pruned = (l.output ++ r.output).filter(needed.contains)
          val exec = CosineJoinExec(planLater(l), planLater(r), lv, rv, thr, rounded,
            rest, Some(scoreAttr), Some(pruned), topK)
          Some(ProjectExec(newProj, exec))
        }
      case _ => None
    }

  /** Is `attr` (an output attribute of the Project) an alias/pass-through
    * of a child-side attribute from `side`? Returns that source. */
  private def sourceAttr(projList: Seq[NamedExpression], attr: Attribute,
                         side: LogicalPlan): Option[Attribute] =
    projList.collectFirst {
      case a @ Alias(child: Attribute, _)
          if a.exprId == attr.exprId && side.outputSet.contains(child) => child
      case a: Attribute if a.exprId == attr.exprId && side.outputSet.contains(a) => a
    }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // Top-k-per-key above the join (the kNN shape): the optimizer has
    // already inserted WindowGroupLimit below the row_number window for
    // `filter(rn <= k)`. Spark's physical WindowGroupLimit still EMITS
    // every join row and sorts it before trimming — O(n·m) row copies.
    // Fusing the limit into the kernel keeps a k-slot insert-sorted
    // buffer per LEFT row and emits only k rows — per-left-row top-k is
    // a superset of per-key top-k (equal when the left key is unique),
    // and the Window + Filter above this node still do the exact trim,
    // the same contract Partial-mode WindowGroupLimit relies on.
    // Requires: partition key = one left-side column, order =
    // (score DESC, right-side long column ASC) — else decline and the
    // Project(Join) below is planned by the case underneath.
    case WindowGroupLimit(Seq(pAttr: Attribute),
        Seq(SortOrder(s1: Attribute, Descending, _, _), SortOrder(s2: Attribute, Ascending, no2, _)),
        _: RowNumber, limit, Project(projList, Join(l, r, Inner | Cross, Some(cond), _)))
        if sourceAttr(projList, pAttr, l).isDefined =>
      sourceAttr(projList, s2, r) match {
        case Some(tie) if tie.dataType == LongType =>
          // planProjectedKernel verifies s1 aliases EXACTLY the filter's
          // (rounded) cosine before fusing; the tie's null ordering rides
          // into the kernel so null tiebreaks rank as the window would
          planProjectedKernel(projList, l, r, cond,
            Some((limit, tie, no2 == NullsFirst)), sortKey = Some(s1)).toSeq
        case _ => Nil
      }
    // SELECT of the same (rounded) cosine above the join: emit the score
    // from the kernel and prune its output row to what the SELECT needs
    case Project(projList, Join(l, r, Inner | Cross, Some(cond), _)) =>
      planProjectedKernel(projList, l, r, cond, None).toSeq
    case Join(l, r, Inner | Cross, Some(cond), _) =>
      extract(cond, l, r) match {
        case Some((lv, rv, thr, rounded, rest))
            if !hasEquiKeys(rest, l, r) && fitsBroadcast(r) =>
          CosineJoinExec(planLater(l), planLater(r), lv, rv, thr, rounded, rest) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }

  /** Idempotently install on a session (config-free path; the config
    * path is `spark.sql.extensions=graft.GraftExtensions`). */
  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(CosineJoinStrategy)) {
      spark.experimental.extraStrategies =
        CosineJoinStrategy +: spark.experimental.extraStrategies
    }
}

case class CosineJoinExec(left: SparkPlan, right: SparkPlan,
                          leftVec: Expression, rightVec: Expression,
                          threshold: Double, rounded: Boolean,
                          residual: Seq[Expression],
                          scoreAttr: Option[Attribute] = None,
                          prunedOutput: Option[Seq[Attribute]] = None,
                          topK: Option[(Int, Expression, Boolean)] = None)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    prunedOutput.getOrElse(left.output ++ right.output) ++ scoreAttr

  override def producedAttributes: AttributeSet = AttributeSet(scoreAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  private def toVec(a: Any): Array[Double] = a match {
    case null => null
    case ad: ArrayData => ad.toDoubleArray()
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    val boundRight = BindReferences.bindReference(rightVec, right.output)
    val boundLeft = BindReferences.bindReference(leftVec, left.output)
    val boundTie = topK.map { case (_, t, _) => BindReferences.bindReference(t, right.output) }
    val kLimit = topK.map(_._1).getOrElse(0)
    val tieNullsFirst = topK.exists(_._3)
    val residualCond = residual.reduceOption(And)
    val thr = threshold
    val doRound = rounded
    val outAttrs = output
    val fullAttrs = left.output ++ right.output ++ scoreAttr
    val hasScore = scoreAttr.isDefined

    left.execute().mapPartitions { li =>
      // materialize the broadcast side ONCE per task: primitive vectors +
      // full-length norms, original rows kept for output assembly
      val bRows = broadcastRows.value
      val rSide = new Array[(InternalRow, Array[Double], Double)](bRows.length)
      val tieVals = if (boundTie.isDefined) new Array[Long](bRows.length) else null
      val tieNulls = if (boundTie.isDefined) new Array[Boolean](bRows.length) else null
      var nR = 0
      var j = 0
      while (j < bRows.length) {
        val v = toVec(boundRight.eval(bRows(j)))
        if (v != null) {
          if (tieVals != null) {
            val tv = boundTie.get.eval(bRows(j))
            if (tv == null) tieNulls(nR) = true
            else tieVals(nR) = tv.asInstanceOf[Long]
          }
          rSide(nR) = (bRows(j), v, math.sqrt({
            var acc = 0.0; var i = 0
            while (i < v.length) { acc += v(i) * v(i); i += 1 }
            acc
          })); nR += 1
        }
        j += 1
      }
      val proj = UnsafeProjection.create(outAttrs, fullAttrs)
      // residual conjuncts come from the JOIN condition, so they can only
      // reference child attributes — never the kernel's score column. Bind
      // them over (left ++ right) and evaluate BEFORE the dot product:
      // for `a.id < b.id` self-join pruning this halves the O(n·m) kernel
      // work (the n²/2 shape), and And-conjunct reordering cannot change
      // which pairs survive.
      val pred = residualCond.map(Predicate.create(_, left.output ++ right.output)).orNull
      val inner = new JoinedRow
      val outer = new JoinedRow
      val scoreRow = new SpecificInternalRow(Seq(DoubleType))

      li.flatMap { lrow =>
        val v1 = toVec(boundLeft.eval(lrow))
        if (v1 == null) Iterator.empty
        else {
          var acc = 0.0; var i = 0
          while (i < v1.length) { acc += v1(i) * v1(i); i += 1 }
          val n1full = math.sqrt(acc)
          val lcopy = lrow.copy()

          // bit parity with ArrayCosineSimilarity: dot and norms accumulate
          // left-to-right over the common prefix; the precomputed
          // full-length norms only apply when the two lengths match
          def cosOf(k: Int): Double = {
            val (_, v2, n2full) = rSide(k)
            val n = math.min(v1.length, v2.length)
            var dot = 0.0; var i2 = 0
            while (i2 < n) { dot += v1(i2) * v2(i2); i2 += 1 }
            var na = n1full; var nb = n2full
            if (v1.length != v2.length) {
              var a1 = 0.0; var b1 = 0.0; var m = 0
              while (m < n) { a1 += v1(m) * v1(m); b1 += v2(m) * v2(m); m += 1 }
              na = math.sqrt(a1); nb = math.sqrt(b1)
            }
            val cosRaw = dot / (na * nb)
            if (doRound) math.floor(cosRaw * 1000.0 + 0.5) / 1000.0 else cosRaw
          }

          def emit(k: Int, cos: Double): InternalRow = {
            inner(lcopy, rSide(k)._1)
            val row: InternalRow =
              if (hasScore) { scoreRow.setDouble(0, cos); outer(inner, scoreRow) }
              else inner
            proj(row).copy()
          }

          if (kLimit > 0) {
            // fused top-k: a k-slot insert-sorted buffer ordered by
            // (cos DESC, tie ASC with the window's null ordering) —
            // O(n·m) arithmetic but only k emitted rows per left row, vs
            // O(n·m) row copies through the physical WindowGroupLimit's
            // pre-limit sort
            val tc = new Array[Double](kLimit)
            val tt = new Array[Long](kLimit)
            val tn = new Array[Boolean](kLimit)
            val ti = new Array[Int](kLimit)
            var size = 0
            // does tie (aN, a) sort strictly before (bN, b) under
            // ASC + the captured null ordering?
            def tieBefore(aN: Boolean, a: Long, bN: Boolean, b: Long): Boolean =
              if (aN && bN) false
              else if (aN) tieNullsFirst
              else if (bN) !tieNullsFirst
              else a < b
            var k = 0
            while (k < nR) {
              inner(lcopy, rSide(k)._1)
              if (pred == null || pred.eval(inner)) {
                val cos = cosOf(k)
                if (cos >= thr) {
                  val tie = tieVals(k)
                  val tieN = tieNulls(k)
                  def beats(i: Int): Boolean =
                    cos > tc(i) || (cos == tc(i) && tieBefore(tieN, tie, tn(i), tt(i)))
                  if (size < kLimit || beats(size - 1)) {
                    var pos = math.min(size, kLimit - 1)
                    while (pos > 0 && beats(pos - 1)) {
                      tc(pos) = tc(pos - 1); tt(pos) = tt(pos - 1)
                      tn(pos) = tn(pos - 1); ti(pos) = ti(pos - 1)
                      pos -= 1
                    }
                    tc(pos) = cos; tt(pos) = tie; tn(pos) = tieN; ti(pos) = k
                    if (size < kLimit) size += 1
                  }
                }
              }
              k += 1
            }
            (0 until size).iterator.map(x => emit(ti(x), tc(x)))
          } else {
            (0 until nR).iterator.flatMap { k =>
              inner(lcopy, rSide(k)._1)
              if (pred != null && !pred.eval(inner)) Iterator.empty
              else {
                val cos = cosOf(k)
                if (cos >= thr) Iterator.single(emit(k, cos)) else Iterator.empty
              }
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): CosineJoinExec =
    copy(left = newLeft, right = newRight)
}
