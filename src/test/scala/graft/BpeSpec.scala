package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bpe, BpeEncode}

/** The BPE tokenizer (graft.functions.Bpe / BpeEncode): learning
  * determinism, the detokenization identity, merge monotonicity, and
  * agreement with an independent reference implementation. */
class BpeSpec extends SparkSpec {

  // independent reference: encode by replaying the merge LIST in learned
  // order (equivalent to greedy lowest-rank inference when, as in BPE,
  // a later merge can only consume symbols produced by earlier ones)
  private def referenceEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    merges.foreach { m => syms = Bpe.mergeAll(syms, m) }
    syms.toSeq
  }

  private val fixture = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learning is deterministic and reproduces the textbook merges") {
    val m1 = Bpe.learn(fixture, 4)
    val m2 = Bpe.learn(fixture.reverse, 4)
    assert(m1 == m2, "learning must not depend on census order")
    // 'es' (9), then 'est' (9), then 'lo' (7) are the classic first
    // merges of this Sennrich example; tie-breaks are lexicographic
    assert(m1.take(3) == Seq(("e", "s"), ("es", "t"), ("l", "o")), s"got $m1")
  }

  test("encodeWord agrees with the replay reference and detokenizes exactly") {
    val merges = Bpe.learn(fixture, 8)
    val rank = merges.zipWithIndex.toMap
    (fixture.map(_._1) ++ Seq("lowest", "newer", "wide", "x", "", "unrelated"))
      .filter(_.nonEmpty).foreach { w =>
        val got = Bpe.encodeWord(w, rank).toSeq
        assert(got == referenceEncode(w, merges), s"$w: $got")
        assert(got.mkString("") == w, s"detokenization broke on $w: $got")
      }
  }

  test("more merges never increase token count") {
    val merges = Bpe.learn(fixture, 8)
    (0 to merges.length).sliding(2).foreach { case Seq(a, b) =>
      fixture.map(_._1).foreach { w =>
        val na = Bpe.encodeWord(w, merges.take(a).zipWithIndex.toMap).length
        val nb = Bpe.encodeWord(w, merges.take(b).zipWithIndex.toMap).length
        assert(nb <= na, s"$w: $a merges -> $na tokens but $b merges -> $nb")
      }
    }
  }

  test("expression detokenizes the real corpus and runs in codegen") {
    val docs = Tables.documents(spark, sf0001)
    val census = docs
      .select(explode(split(lower(col("text")), "[ \\t\\n\\r\\f]+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy("w").collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val merges = Bpe.learn(census, 32)
    val bpe = org.apache.spark.sql.GraftPlanBridge.column(
      BpeEncode(org.apache.spark.sql.GraftPlanBridge.expression(lower(col("text"))), merges))
    val bad = docs.select(
        concat_ws("", bpe).as("rejoined"),
        regexp_replace(lower(col("text")), "[ \\t\\n\\r\\f]+", "").as("stripped"))
      .filter(col("rejoined") =!= col("stripped")).count()
    assert(bad == 0, s"$bad documents fail the detokenization identity")
    // tokens shrink: 32 merges on a 31-word vocabulary must compress
    val Seq(chars, toks) = docs.select(
        sum(length(regexp_replace(lower(col("text")), "[ \\t\\n\\r\\f]+", ""))).cast("long"),
        sum(size(bpe)).cast("long")).collect().head.toSeq.map(_.asInstanceOf[Long])
    assert(toks < chars, s"BPE must compress: $toks tokens vs $chars chars")
    val plan = docs.select(bpe).queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_bpe"))
    assert(line.exists(_.trim.startsWith("*")),
      s"graft_bpe not inside a codegen span:\n$plan")
  }
}
