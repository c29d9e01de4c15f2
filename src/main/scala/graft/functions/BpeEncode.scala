package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer (Sennrich et al., arXiv:1508.07909 —
  * the algorithm GPT-2/BPE-family tokenizers apply at corpus scale).
  *
  * [[Bpe.learn]] runs the LEARNING loop on a (word → count) table: count
  * adjacent symbol pairs weighted by word frequency, merge the most
  * frequent pair everywhere, repeat. Production pipelines learn on a
  * k-bounded sample/vocabulary table (here: the distinct-word census,
  * driver-side) and then APPLY the learned merge ranks to the full
  * corpus — applying is the 100 TB part, and [[BpeEncode]] makes it one
  * map-side codegen'd expression: per word, repeatedly merge the
  * lowest-rank adjacent pair until none applies (exact greedy BPE
  * inference; the merge-rank map rides the expression like
  * [[LshSignature]]'s hyperplanes ride it).
  *
  * Determinism: learning breaks count ties on the lexicographically
  * smaller pair, and inference merges strictly by learned rank then
  * left-to-right — no hash iteration order anywhere, so tokenization is
  * reproducible across engines, JVMs and partitionings (BpeSpec pins
  * the detokenization identity and agreement with an independent
  * reference implementation).
  */
object Bpe {

  /** Learn `nMerges` merges from a weighted word census. */
  def learn(wordCounts: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var words: Seq[(Array[String], Long)] =
      wordCounts.map { case (w, n) => (w.map(_.toString).toArray, n) }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max count, ties to the lexicographically smallest pair
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.map { case (syms, n) => (mergeAll(syms, best), n) }
        k += 1
      }
    }
    merges.result()
  }

  /** Merge every (left-to-right, non-overlapping) occurrence of `pair`. */
  def mergeAll(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (syms(i) + syms(i + 1)); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Greedy BPE inference on one word: repeatedly merge the adjacent
    * pair with the LOWEST learned rank until no pair is in the table. */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        var bestPair: (String, String) = null
        var j = 0
        while (bestPair == null && j < syms.length - 1) {
          if (rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue) == bestRank)
            bestPair = (syms(j), syms(j + 1))
          j += 1
        }
        syms = mergeAll(syms, bestPair)
        if (syms.length < 2) continue = false
      }
    }
    syms
  }
}

/** `graft_bpe`-shaped expression: string → array<string> of BPE tokens
  * (whitespace-split words, each greedily merged by learned rank). The
  * generated code calls the kernel through a reference object — the
  * projection stays inside whole-stage codegen (no interpreter
  * fallback), which is what matters for the scan-dominated corpus pass;
  * the per-word loop itself is branchy string work either way. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Kernel entry point shared by eval and generated code. */
  def encode(s: UTF8String): GenericArrayData = {
    val toks = Array.newBuilder[Any]
    BpeEncode.Ws.split(s.toString).foreach { w =>
      if (w.nonEmpty)
        Bpe.encodeWord(w, rank).foreach(t => toks += UTF8String.fromString(t))
    }
    new GenericArrayData(toks.result())
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val ref = ctx.addReferenceObj("bpeExpr", this, classOf[BpeEncode].getName)
      s"${ev.value} = $ref.encode($str);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe"
}

object BpeEncode {
  /** Precompiled once — String.split would Pattern.compile per ROW on
    * the corpus-wide map pass. */
  private[functions] val Ws = java.util.regex.Pattern.compile("[ \t\n\r\f]+")
}
