package graft.plans

import graft.functions.ArrayCosineSimilarity
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Add, And, Attribute, AttributeReference, AttributeSet, BindReferences,
  Divide, EqualNullSafe, EqualTo, Expression, Floor, GreaterThanOrEqual,
  JoinedRow, LessThanOrEqual, Literal, Multiply, NamedExpression, Predicate,
  PredicateHelper, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.{BinaryExecNode, ProjectExec, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.DoubleType

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

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // SELECT of the same (rounded) cosine above the join: emit the score
    // from the kernel and prune its output row to what the SELECT needs
    case Project(projList, Join(l, r, Inner | Cross, Some(cond), _)) =>
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
          if (!projList.exists(_.exists(isScore))) Nil
          else {
            val scoreAttr = AttributeReference("_cos_score", DoubleType, nullable = false)()
            val newProj = projList.map(ne =>
              ne.transformDown { case e if isScore(e) => scoreAttr }
                .asInstanceOf[NamedExpression])
            val needed = AttributeSet(newProj.flatMap(_.references) ++ rest.flatMap(_.references))
            val pruned = (l.output ++ r.output).filter(needed.contains)
            val exec = CosineJoinExec(planLater(l), planLater(r), lv, rv, thr, rounded,
              rest, Some(scoreAttr), Some(pruned))
            ProjectExec(newProj, exec) :: Nil
          }
        case _ => Nil
      }
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
                          prunedOutput: Option[Seq[Attribute]] = None)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    prunedOutput.getOrElse(left.output ++ right.output) ++ scoreAttr

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
      var nR = 0
      var j = 0
      while (j < bRows.length) {
        val v = toVec(boundRight.eval(bRows(j)))
        if (v != null) {
          var acc = 0.0; var i = 0
          while (i < v.length) { acc += v(i) * v(i); i += 1 }
          rSide(nR) = (bRows(j), v, math.sqrt(acc)); nR += 1
        }
        j += 1
      }
      val proj = UnsafeProjection.create(outAttrs, fullAttrs)
      val pred = residualCond.map(Predicate.create(_, fullAttrs)).orNull
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
          (0 until nR).iterator.flatMap { k =>
            val (brow, v2, n2full) = rSide(k)
            val n = math.min(v1.length, v2.length)
            var dot = 0.0; var i2 = 0
            while (i2 < n) { dot += v1(i2) * v2(i2); i2 += 1 }
            // norm parity with ArrayCosineSimilarity: norms accumulate
            // over the SAME prefix as the dot product, so the precomputed
            // full-length norms only apply when the lengths match
            var na = n1full; var nb = n2full
            if (v1.length != v2.length) {
              var a1 = 0.0; var b1 = 0.0; var m = 0
              while (m < n) { a1 += v1(m) * v1(m); b1 += v2(m) * v2(m); m += 1 }
              na = math.sqrt(a1); nb = math.sqrt(b1)
            }
            val cosRaw = dot / (na * nb)
            val cos = if (doRound) math.floor(cosRaw * 1000.0 + 0.5) / 1000.0 else cosRaw
            if (cos >= thr) {
              inner(lcopy, brow)
              val row: InternalRow =
                if (hasScore) { scoreRow.setDouble(0, cos); outer(inner, scoreRow) }
                else inner
              if (pred == null || pred.eval(row)) Iterator.single(proj(row).copy())
              else Iterator.empty
            } else Iterator.empty
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): CosineJoinExec =
    copy(left = newLeft, right = newRight)
}
