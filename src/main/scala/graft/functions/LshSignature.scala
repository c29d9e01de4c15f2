package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Deterministic integer hyperplanes shared by the ANN queries and the
  * codegen'd [[LshSignature]] expression — ONE definition so the
  * expression is provably computing the same planes the declarative HOF
  * form used (AnnSpec pins bit-for-bit agreement). LCG sequence, values
  * in [-2^15, 2^15): exactly representable as doubles, identical
  * everywhere, no RNG dependency. */
object Hyperplanes {
  val DIM = 64
  def plane(j: Int): Array[Double] =
    Array.tabulate(DIM) { i =>
      val x = (1103515245L * (j * DIM + i + 1) + 12345L) & 0x7FFFFFFFL
      ((x % 65536L) - 32768L).toDouble
    }
}

/** Native codegen'd sign-LSH signature: bit b of the result is the sign
  * of `v · plane(firstPlane + b)` — the second `doGenCode` expression in
  * the extension ladder next to [[ArrayCosineSimilarity]]. The
  * declarative form (one `aggregate(zip_with(...))` HOF fold PER BIT)
  * runs interpreted lambdas per element; this kernel is one fused loop
  * over the vector with all `nBits` accumulators live in registers,
  * inside whole-stage codegen.
  *
  * Bit-parity contract with the HOF form it replaces: each plane's dot
  * accumulates left-to-right and bit b is set iff dot >= 0.0 — identical
  * IEEE-754 op order for the corpus contract |v| = DIM (every embedding
  * is exactly DIM-dimensional), so signatures — and therefore LSH
  * buckets, candidates, and golden outputs — are unchanged
  * (NativeExpressionSpec pins expression-vs-HOF equality on the real
  * table). Off-contract lengths diverge deliberately: zip_with pads the
  * shorter side with nulls and nulls the whole fold (bit unset), while
  * this kernel uses the prefix dot — the saner semantics for a kernel.
  */
case class LshSignature(child: Expression, firstPlane: Int, nBits: Int)
  extends UnaryExpression {

  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_lsh_sig expects array<double>, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType

  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nBits)(b => Hyperplanes.plane(firstPlane + b))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var sig = 0L
    var b = 0
    while (b < nBits) {
      val hp = planes(b)
      val n = math.min(v.numElements(), hp.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getDouble(i) * hp(i); i += 1 }
      if (acc >= 0.0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val hp = ctx.freshName("hp")
      val sig = ctx.freshName("sig")
      s"""
         |long $sig = 0L;
         |for (int $b = 0; $b < $nBits; $b++) {
         |  double[] $hp = $planesRef[$b];
         |  int $n = java.lang.Math.min($arr.numElements(), $hp.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) $acc += $arr.getDouble($i) * $hp[$i];
         |  if ($acc >= 0.0) $sig |= 1L << $b;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_sig"
}

object LshSignature {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  /** SQL surface: graft_lsh_sig(vec, firstPlane, nBits) — the plane
    * window must be FOLDABLE integer literals (the plane family is part
    * of the expression's identity, like a seed), enforced at resolution
    * time so a non-literal fails loudly, not at runtime. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_lsh_sig"),
    new ExpressionInfo(classOf[LshSignature].getName, "graft_lsh_sig"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        s"graft_lsh_sig expects (array<double>, firstPlane, nBits), got ${children.length} args")
      def intLit(e: Expression, what: String): Int = e match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_lsh_sig: $what must be an integer literal, got $other")
      }
      LshSignature(children.head,
        intLit(children(1), "firstPlane"), intLit(children(2), "nBits"))
    },
  )

  /** Idempotent runtime registration (same contract as
    * [[ArrayCosineSimilarity.register]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(descriptor._1)) {
      registry.registerFunction(descriptor._1, descriptor._2, descriptor._3)
    }
  }
}
