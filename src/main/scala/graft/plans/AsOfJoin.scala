package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, SortOrder, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** SURVEY §2.3 / round-2 — AS-OF JOIN as a first-class engine operator:
  * custom LogicalPlan + SparkStrategy + SparkPlan (the (c) rung of the
  * extension ladder, for semantics Spark's builtin operators can't
  * express as one operator). For each left row (key k, time t), attach
  * the greatest right time t' with the same key and t' < t (strict).
  *
  * Physical execution is a co-partitioned streaming merge:
  *   - requiredChildDistribution clusters BOTH children on the key, so
  *     EnsureRequirements inserts compatible hash exchanges (exactly how
  *     SortMergeJoin gets co-partitioning);
  *   - requiredChildOrdering sorts each partition by (key, time);
  *   - doExecute zips partitions and runs a single forward pass — O(n+m)
  *     per partition, no buffering beyond one row, no state.
  *
  * 100 TB note: this is shuffle-once, stream-merge — the same shape SMJ
  * uses, so skew/AQE reasoning carries over; per-key state is one Long.
  *
  * (The window-trick formulation q_join_asof remains as the composition
  * baseline; q_asof_custom runs THIS operator against the same DuckDB
  * native ASOF JOIN oracle.)
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    keyCol: String, timeCol: String,
                    // constructor member (not a body val): plan transforms
                    // copy() this node, and the output attribute's exprId
                    // must survive the copy or downstream BindReferences
                    // sees a phantom attribute
                    asofAttr: AttributeReference =
                      AttributeReference("asof_ts", LongType, nullable = true)()) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ asofAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofAttr :: Nil)
  // declare the join columns as referenced, or ColumnPruning removes them
  // from the children when the parent query doesn't project them
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      (left.output ++ right.output).filter(a => a.name == keyCol || a.name == timeCol))
  // The physical merge reads key/time via getLong — require both columns
  // to exist and resolve to a type whose InternalRow storage IS a long
  // (LongType, or TimestampType's micros) on BOTH sides (a silent getLong
  // on e.g. a string column reads garbage). `resolved` must only REPORT
  // resolution state, never throw: analyzer rules probe it speculatively,
  // and an exception aborts rules that merely check. An unmet requirement
  // leaves the node unresolved; CheckAnalysis then reports the unresolved
  // operator, and simpleString carries the per-column diagnosis —
  // distinguishing a missing column from a wrongly-typed one.
  // Nullability can't be required statically (parquet attrs are nullable
  // by default); AsOfJoinExec instead throws on an actual null at runtime.
  private def longBacked(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == LongType ||
      dt == org.apache.spark.sql.types.TimestampType ||
      dt == org.apache.spark.sql.types.TimestampNTZType

  private def diagnose: Seq[String] =
    for {
      (side, label) <- Seq((left, "left"), (right, "right"))
      name <- Seq(keyCol, timeCol)
      msg <- side.output.find(_.name == name) match {
        case None => Some(s"$label side has no column '$name'")
        case Some(a) if !longBacked(a.dataType) =>
          Some(s"$label.$name is ${a.dataType.simpleString}, needs bigint/timestamp")
        case _ => None
      }
    } yield msg

  override lazy val resolved: Boolean = childrenResolved && diagnose.isEmpty

  override def simpleString(maxFields: Int): String = {
    val base = s"AsOfJoin [key=$keyCol, time=$timeCol]"
    if (childrenResolved && diagnose.nonEmpty)
      s"$base UNRESOLVABLE: ${diagnose.mkString("; ")}"
    else base
  }
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        keyCol: String, timeCol: String,
                        output: Seq[Attribute]) extends BinaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output.last :: Nil)

  private def leftKey = left.output.find(_.name == keyCol).get
  private def rightKey = right.output.find(_.name == keyCol).get
  private def leftTime = left.output.find(_.name == timeCol).get
  private def rightTime = right.output.find(_.name == timeCol).get

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.name == keyCol)
    val lTimeIdx = left.output.indexWhere(_.name == timeCol)
    val rKeyIdx = right.output.indexWhere(_.name == keyCol)
    val rTimeIdx = right.output.indexWhere(_.name == timeCol)
    val lTypes = left.output.map(_.dataType).toArray
    val width = lTypes.length

    left.execute().zipPartitions(right.execute(), preservesPartitioning = false) { (li, ri) =>
      val r = ri.buffered
      var curKey = Long.MinValue
      var haveKey = false
      var lastMatch = 0L
      var haveMatch = false
      li.map { lrow =>
        if (lrow.isNullAt(lKeyIdx) || lrow.isNullAt(lTimeIdx))
          throw new IllegalStateException(
            s"AsOfJoin: null $keyCol/$timeCol on the left side — filter nulls before joining")
        val k = lrow.getLong(lKeyIdx)
        val t = lrow.getLong(lTimeIdx)
        if (!haveKey || k != curKey) { curKey = k; haveKey = true; haveMatch = false }
        // advance the right side up to (but excluding) time t for this key;
        // rows of earlier keys are drained, monotone in (key, time)
        var advancing = true
        while (advancing && r.hasNext) {
          if (r.head.isNullAt(rKeyIdx) || r.head.isNullAt(rTimeIdx))
            throw new IllegalStateException(
              s"AsOfJoin: null $keyCol/$timeCol on the right side — filter nulls before joining")
          val rk = r.head.getLong(rKeyIdx)
          val rt = r.head.getLong(rTimeIdx)
          if (rk < k || (rk == k && rt < t)) {
            if (rk == k) { lastMatch = rt; haveMatch = true }
            r.next()
          } else advancing = false
        }
        val out = new GenericInternalRow(width + 1)
        var i = 0
        while (i < width) { out.update(i, lrow.get(i, lTypes(i))); i += 1 }
        if (haveMatch) out.setLong(width, lastMatch) else out.setNullAt(width)
        out: InternalRow
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(planLater(j.left), planLater(j.right), j.keyCol, j.timeCol, j.output) :: Nil
    case _ => Nil
  }
}
