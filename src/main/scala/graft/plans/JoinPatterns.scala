package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Join-condition pattern helpers shared by the planner extensions
  * (CosineJoinStrategy, RangeJoinRewrite). */
object JoinPatterns {

  /** True when any conjunct is a cross-side equality (l-expr = r-expr):
    * Spark's own hash joins beat any custom O(n·m) kernel or rewrite
    * there — the custom paths must decline and leave the predicate as a
    * cheap post-join residual. */
  def hasCrossSideEquiConjunct(conjuncts: Seq[Expression],
                               l: LogicalPlan, r: LogicalPlan): Boolean = {
    def splitsAcross(a: Expression, b: Expression): Boolean =
      (a.references.nonEmpty && b.references.nonEmpty) &&
        ((a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (b.references.subsetOf(l.outputSet) && a.references.subsetOf(r.outputSet)))
    conjuncts.exists {
      case EqualTo(a, b) => splitsAcross(a, b)
      case EqualNullSafe(a, b) => splitsAcross(a, b)
      case _ => false
    }
  }
}
