package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Unicode normalization (`graft_normalize(str)` → NFC)
  * — the canonical-composition pass every text-dedup pipeline needs
  * BEFORE hashing: "é" as U+00E9 and as "e"+U+0301 are byte-different,
  * so exact dedup, MinHash shingles, and md5 fingerprints all silently
  * miss equal text until both sides are brought to one canonical form.
  * Spark has no built-in for this (DuckDB: nfc_normalize; Trino/Presto:
  * normalize) — the third `doGenCode` expression in the extension ladder
  * next to [[ArrayCosineSimilarity]] and [[LshSignature]].
  *
  * Semantics: `java.text.Normalizer.normalize(s, NFC)` exactly — the
  * JDK's implementation of UAX #15 canonical decomposition +
  * composition, the same algorithm DuckDB's utf8proc-based
  * nfc_normalize implements, so the two engines agree byte-for-byte on
  * any valid input (NativeExpressionSpec pins codegen-vs-interpreted
  * agreement; the q_normalize_text oracle pins cross-engine agreement).
  * Codegen note: the kernel fast-paths via `Normalizer.isNormalized` —
  * for the ASCII-dominant corpus case that check is a linear scan with
  * no allocation, so already-normalized rows (the overwhelming majority
  * at 100 TB) pay no string rebuild.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_normalize expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val js = ctx.freshName("js")
      s"""
         |java.lang.String $js = $str.toString();
         |if (java.text.Normalizer.isNormalized($js, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $str;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($js, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_normalize"
}

object NormalizeNfc {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_normalize"),
    new ExpressionInfo(classOf[NormalizeNfc].getName, "graft_normalize"),
    (children: Seq[Expression]) => NormalizeNfc(children.head),
  )

  /** Idempotent runtime registration (same contract as
    * [[ArrayCosineSimilarity.register]]). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(descriptor._1)) {
      registry.registerFunction(descriptor._1, descriptor._2, descriptor._3)
    }
  }
}
