package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_linear_score` — fastText-style linear text-classifier APPLY
  * pass as one map-side codegen'd expression: whitespace-tokenize the
  * (already lowercased) document, sum the learned per-token integer
  * weights (unknown tokens contribute 0 — the usual OOV treatment), and
  * return the milli-scaled mean weight per token. The model (token → weight_milli map)
  * rides the expression exactly like [[BpeEncode]]'s merge table and
  * [[LshSignature]]'s hyperplanes — learn-small / apply-at-scale, the
  * apply pass needs no join, no shuffle, no driver.
  *
  * The WEIGHTS here are the sandbox stand-in for trained coefficients —
  * derived deterministically from md5(token) (see
  * TextAnalysisQueries.q_quality_classifier), the same stub discipline
  * as MediaPipeline's codec stub: the plumbing (bounded vocabulary
  * learning, model-in-expression application, integer scoring) is the
  * real, tested shape; only the coefficient VALUES are fake. A real
  * deployment swaps the map for logistic-regression weights without
  * touching the plan.
  *
  * Integer weights make the score exact — no float summation order
  * issues, so the result is partitioning-independent and
  * oracle-hash-gateable.
  */
case class LinearTextScore(child: Expression, weights: Map[String, Long])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_linear_score expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType

  /** Kernel entry point shared by eval and generated code: the
    * milli-scaled mean weight per token, `floor(Σweight·1000 / n_tok)`
    * (0 for the zero-token document). Token counting lives HERE rather
    * than in a companion `size(filter(split(...)))` column because that
    * HOF is CodegenFallback and would drag the whole apply projection
    * out of whole-stage codegen — the kernel walks the tokens once
    * anyway. */
  def score(s: UTF8String): Long = {
    var total = 0L
    var n = 0L
    val it = BpeEncode.Ws.split(s.toString).iterator
    while (it.hasNext) {
      val w = it.next()
      if (w.nonEmpty) { total += weights.getOrElse(w, 0L); n += 1L }
    }
    if (n == 0L) 0L else total * 1000L / n
  }

  override def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val ref = ctx.addReferenceObj("linearScore", this, classOf[LinearTextScore].getName)
      s"${ev.value} = $ref.score($str);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_linear_score"
}
