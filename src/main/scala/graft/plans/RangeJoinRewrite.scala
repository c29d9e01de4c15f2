package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule (the `Rule[LogicalPlan]` extension rung, next to the
  * `ArrayCosineSimilarity` Expression and the AsOfJoin/CosineJoin
  * strategies): rewrites a pure range join
  *
  *   fact JOIN dim ON f >= s AND f < e          -- f from one side,
  *                                              -- s, e from the other
  *
  * which Spark can only plan as an O(n·m) BroadcastNestedLoopJoin, into
  * a bucketed EQUI-join: the fact side gets `bucket(f)`, the interval
  * side explodes to `sequence(bucket(s), bucket(e))` (one row per
  * W-wide bucket its interval touches), the join keys on bucket
  * equality, and the ORIGINAL range conjuncts stay as residual filters
  * — so the rewrite is exact for ANY interval endpoints (monotonicity
  * of truncating division guarantees bucket(f) ∈ [bucket(s), bucket(e)]
  * whenever s <= f <= e; the residual discards the rest). This is the
  * interval-bucketing strategy native range-join engines implement in
  * their planners, expressed as a Catalyst rewrite: at 100 TB the fact
  * side hash-shuffles (or the dim side broadcasts) on the bucket key
  * instead of every fact row touching every interval.
  *
  * Cost model: the interval side grows by ceil(span/W)+1 rows per
  * interval (span ≈ W → ~2×); W is `spark.graft.rangeJoin.bucketMicros`
  * (default 32 days), sized to the expected interval width. Degenerate
  * open-ended intervals (a 9999-12-31 sentinel endpoint) inflate their
  * row's expansion to span/W rows — still correct, but raise W (or
  * close the sentinel) for interval sets orders wider than W; the
  * expansion is linear per interval, never O(n·m).
  *
  * The rule declines (plan unchanged) when:
  *   - the join already has a cross-side equi conjunct — Spark's hash
  *     joins handle it, the ranges are already cheap residuals (the
  *     CosineJoinStrategy ADVICE lesson: never demote a hash join);
  *   - both bounds don't target the SAME fact expression, or the bound
  *     type is not timestamp/long;
  *   - any matched expression is non-deterministic.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WIDTH_KEY = "spark.graft.rangeJoin.bucketMicros"
  private val WIDTH_DEFAULT: Long = 32L * 86400L * 1000000L // 32 days

  private def width: Long =
    SQLConf.get.getConfString(WIDTH_KEY, WIDTH_DEFAULT.toString).toLong

  /** x as epoch micros (LongType passes through, so the rule also covers
    * pre-computed numeric event times). */
  private def micros(x: Expression): Option[Expression] = x.dataType match {
    case TimestampType => Some(UnixMicros(x))
    case LongType => Some(x)
    case _ => None
  }

  private def bucket(x: Expression): Option[Expression] =
    micros(x).map(m => IntegralDivide(m, Literal(width)))

  /** A lower bound `f >= s` / `f > s` in either written orientation. */
  private object Lower {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(f, s) => Some((f, s))
      case GreaterThan(f, s) => Some((f, s))
      case LessThanOrEqual(s, f) => Some((f, s))
      case LessThan(s, f) => Some((f, s))
      case _ => None
    }
  }

  /** An upper bound `f < e` / `f <= e` in either written orientation. */
  private object Upper {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThan(f, s) => Some((f, s))
      case LessThanOrEqual(f, s) => Some((f, s))
      case GreaterThanOrEqual(s, f) => Some((f, s))
      case GreaterThan(s, f) => Some((f, s))
      case _ => None
    }
  }

  private def sidesSplit(f: Expression, bound: Expression,
                         l: LogicalPlan, r: LogicalPlan): Boolean =
    f.deterministic && bound.deterministic && bound.references.nonEmpty &&
      ((f.references.subsetOf(l.outputSet) && bound.references.subsetOf(r.outputSet)) ||
        (f.references.subsetOf(r.outputSet) && bound.references.subsetOf(l.outputSet)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, Inner | Cross, Some(cond), hint) =>
      rewrite(j, l, r, cond, hint).getOrElse(j)
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
                      cond: Expression, hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (JoinPatterns.hasCrossSideEquiConjunct(conjuncts, l, r)) return None
    // find a lower and an upper bound on the SAME fact-side expression,
    // with both interval endpoints on the other side
    val lowers = conjuncts.collect { case Lower(f, s) if sidesSplit(f, s, l, r) => (f, s) }
    val uppers = conjuncts.collect { case Upper(f, e) if sidesSplit(f, e, l, r) => (f, e) }
    val matched = (for {
      (f1, s) <- lowers; (f2, e) <- uppers if f1.semanticEquals(f2)
      if s.references.nonEmpty && e.references.nonEmpty &&
        // both endpoints from the same (interval) side, f from the other
        ((s.references ++ e.references).subsetOf(l.outputSet) ||
          (s.references ++ e.references).subsetOf(r.outputSet))
    } yield (f1, s, e)).headOption
    matched.flatMap { case (f, s, e) =>
      val factOnLeft = f.references.subsetOf(l.outputSet)
      val (fact, dim) = if (factOnLeft) (l, r) else (r, l)
      for {
        fb <- bucket(f); sb <- bucket(s); eb <- bucket(e)
      } yield {
        val factBucket = Alias(fb, "graft_bucket_f")()
        val factP = Project(fact.output :+ factBucket, fact)
        val dimBucket = AttributeReference("graft_bucket_d", LongType)()
        // timeZoneId must be supplied here: the analyzer's ResolveTimeZone
        // has already run, and a TimeZoneAwareExpression without it makes
        // the whole plan unresolved (PLAN_VALIDATION_FAILED_RULE_IN_BATCH).
        // Reversed/empty intervals (s > e) must stay a zero-match row, not
        // a Sequence boundary crash — Explode of an empty array drops the
        // row, matching what the nested-loop join would have emitted.
        val seq = Sequence(sb, eb, Some(Literal(1L)), Some(SQLConf.get.sessionLocalTimeZone))
        val safeSeq = If(LessThanOrEqual(sb, eb), seq,
          Literal.create(Array.empty[Long], seq.dataType))
        val gen = Generate(Explode(safeSeq),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(dimBucket), child = dim)
        val newCond = (EqualTo(factBucket.toAttribute, dimBucket) +: conjuncts)
          .reduce(And)
        val (nl, nr) = if (factOnLeft) (factP: LogicalPlan, gen: LogicalPlan)
                       else (gen: LogicalPlan, factP: LogicalPlan)
        Project(j.output, Join(nl, nr, j.joinType, Some(newCond), hint))
      }
    }
  }

  /** Runtime hook for sessions built without `spark.sql.extensions`
    * (the harness path) — idempotent. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite)) {
      spark.experimental.extraOptimizations =
        RangeJoinRewrite +: spark.experimental.extraOptimizations
    }
}
