package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Native sketch-probe expressions — the round-8 replacement for the two
  * Scala-UDF probes that were the last codegen barriers on hot row paths
  * (q_dedup_bloom's bloom prune, q_cms_heavy's CMS prune).
  *
  * Spark ships no public scalar function for probing a driver-built
  * `BloomFilter`/`CountMinSketch` (the internal `might_contain` is
  * reserved for injected runtime filters), so a probe is either a Scala
  * UDF — an interpreter boundary that splits the whole-stage-codegen
  * span right where 10¹¹ rows stream by — or a native expression. These
  * follow the [[BpeEncode]]/[[LshSignature]] pattern: the sketch rides
  * the expression as a reference object (broadcast-in-spirit, exactly
  * like the merge table), eval and generated code share one kernel, and
  * the filter stays inside the fused scan stage
  * (NativeExpressionSpec pins both the semantics and the codegen
  * residency).
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = BooleanType

  /** Kernel entry point shared by eval and generated code. */
  def probe(s: UTF8String): Boolean = bloom.mightContain(s.toString)

  override def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
      s"${ev.value} = $ref.probe($str);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_contains"
}

/** CMS candidate gate: estimated count ≥ threshold. CMS never
  * undercounts, so with `threshold` = the exact cutoff every true heavy
  * hitter passes — the prune is recall-1 by construction and the exact
  * confirm aggregate downstream removes the overestimates. */
case class CmsAtLeast(child: Expression, cms: CountMinSketch, threshold: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_atleast expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = BooleanType

  /** Kernel entry point shared by eval and generated code. */
  def probe(s: UTF8String): Boolean = cms.estimateCount(s.toString) >= threshold

  override def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val ref = ctx.addReferenceObj("cmsProbe", this, classOf[CmsAtLeast].getName)
      s"${ev.value} = $ref.probe($str);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_cms_atleast"
}
