package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.{Column, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Theta-sketch distinct aggregation — the "novel sketch" rung of the
  * extension ladder, as a native `TypedImperativeAggregate` (object
  * buffer on the heap, serialized only at shuffle boundaries — the same
  * mechanism Spark's own HLL/percentile sketches use, far cheaper than a
  * UDAF that re-serializes per row).
  *
  * Why Theta next to the built-in HLL (`q_hll_merge`): HLL unions, but
  * only Theta supports set INTERSECTION/difference estimates — audience
  * overlap ("distinct users active in BOTH halves of the month") without
  * an exact distinct-join, the query that costs two full shuffles at
  * 100 TB and here costs two 4 KB sketches. Update order does not affect
  * the retained-hash set (min-k property), so results are deterministic
  * for a fixed corpus regardless of partitioning — golden-pinnable.
  */
case class ThetaSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_sketch"

  // fail at ANALYSIS, not as a mid-job ClassCastException in update():
  // the unchecked asInstanceOf[Long] below is only safe because of this
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArrayCompressed

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArrayCompressed

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ThetaSketchAgg {

  /** DataFrame-facing aggregate column: theta sketch of a long column. */
  def thetaSketch(c: Column): Column =
    GraftPlanBridge.column(
      ThetaSketchAgg(GraftPlanBridge.expression(c)).toAggregateExpression())

  /** null-safe: a missing sketch (e.g. the empty side of an outer join
    * between sketch tables) reads as the empty set, so the estimate
    * helpers compose with outer joins instead of NPE-ing in Memory.wrap */
  private def wrap(b: Array[Byte]): CompactSketch =
    if (b == null) SetOperation.builder().buildUnion().getResult
    else Sketches.wrapCompactSketch(Memory.wrap(b))

  /** Estimate of a serialized sketch, rounded to a long. */
  val thetaEstimate = udf((b: Array[Byte]) =>
    math.round(wrap(b).getEstimate))

  /** Intersection estimate of two serialized sketches. */
  val thetaIntersect = udf((a: Array[Byte], b: Array[Byte]) => {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(wrap(a)); i.intersect(wrap(b))
    math.round(i.getResult.getEstimate)
  })

  /** Union estimate of two serialized sketches. */
  val thetaUnion = udf((a: Array[Byte], b: Array[Byte]) => {
    val u = SetOperation.builder().buildUnion()
    u.union(wrap(a)); u.union(wrap(b))
    math.round(u.getResult.getEstimate)
  })
}
