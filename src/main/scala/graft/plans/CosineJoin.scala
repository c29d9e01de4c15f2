package graft.plans

import graft.functions.ArrayCosineSimilarity
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Add, And, Attribute, BindReferences, Divide, Expression, Floor,
  GreaterThanOrEqual, JoinedRow, LessThanOrEqual, Literal, Multiply,
  Predicate, PredicateHelper, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
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
  * allocation, the exact CosineKernel shape behind q_sim_knn.
  *
  * Bit parity: dot/(√na·√nb) accumulated left-to-right — identical to
  * ArrayCosineSimilarity's eval/codegen, so the rewrite is
  * indistinguishable from the naive plan, row for row and bit for bit.
  * NaN (zero vector) fails `>= θ` in both paths; null arrays produce no
  * pairs in both paths. Residual conjuncts (e.g. `a.id < b.id`) are
  * evaluated per emitted pair.
  *
  * 100 TB note: valid while one side fits in an executor (same contract
  * as every broadcast join); the planner only sees the pattern when the
  * user ALREADY wrote a cross-shaped cosine join, so no regression risk
  * for other plans. At larger scale, LSH/IVF pruning (AnnQueries)
  * bounds the candidate set before this kernel.
  */
object CosineJoinStrategy extends SparkStrategy with PredicateHelper {

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

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, Inner | Cross, Some(cond), _) =>
      extract(cond, l, r) match {
        case Some((lv, rv, thr, rounded, rest)) =>
          CosineJoinExec(planLater(l), planLater(r), lv, rv, thr, rounded, rest) :: Nil
        case None => Nil
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
                          residual: Seq[Expression])
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

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

    left.execute().mapPartitions { li =>
      // materialize the broadcast side ONCE per task: primitive vectors +
      // norms, original rows kept for output assembly
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
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val pred = residualCond.map(Predicate.create(_, outAttrs)).orNull
      val joined = new JoinedRow

      li.flatMap { lrow =>
        val v1 = toVec(boundLeft.eval(lrow))
        if (v1 == null) Iterator.empty
        else {
          var acc = 0.0; var i = 0
          while (i < v1.length) { acc += v1(i) * v1(i); i += 1 }
          val n1 = math.sqrt(acc)
          val lcopy = lrow.copy()
          (0 until nR).iterator.flatMap { k =>
            val (brow, v2, n2) = rSide(k)
            var dot = 0.0; var i2 = 0
            val n = math.min(v1.length, v2.length)
            while (i2 < n) { dot += v1(i2) * v2(i2); i2 += 1 }
            val cosRaw = dot / (n1 * n2)
            val cos = if (doRound) math.floor(cosRaw * 1000.0 + 0.5) / 1000.0 else cosRaw
            if (cos >= thr) {
              joined(lcopy, brow)
              if (pred == null || pred.eval(joined)) Iterator.single(proj(joined).copy())
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
