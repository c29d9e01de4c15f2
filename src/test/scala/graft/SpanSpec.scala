package graft

import org.apache.spark.sql.functions._

import graft.queries.SpanQueries

/** Properties of the span-level operators (SpanQueries): exact
  * substring-dedup coverage bounds and detection of a planted copied
  * passage, and phrase-search consistency with a direct string count. */
class SpanSpec extends SparkSpec {

  private val W = 8 // must match SpanQueries.W

  test("q_substring_dup: coverage is bounded by doc length and spans are >= W") {
    val r = SpanQueries.queries("q_substring_dup")(spark, sf001)
    val bad = r.filter(col("dup_tokens") > col("n_tokens") ||
      col("dup_tokens") < W || col("dup_frac") > 1.0).count()
    assert(bad == 0, s"$bad rows violate coverage bounds")
    assert(r.count() > 0, "no duplicated passages found in the sf0.01 corpus")
  }

  test("q_substring_dup: a planted shared passage is detected with exact coverage") {
    import spark.implicits._
    // two docs sharing exactly a 12-token passage inside unique framing;
    // one doc with no duplication; tokens chosen so no accidental window
    // repeats (every window straddling the frame boundary is unique)
    val passage = (1 to 12).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (0L, s"alpha beta gamma $passage delta epsilon"),
      (1L, s"one two three four five $passage six"),
      (2L, "totally unrelated text with enough tokens to matter here"),
    ).toDF("doc_id", "text")
    // compute expected coverage directly: every W-window fully inside the
    // passage is shared => covered span = the passage's 12 tokens
    val toks = docs.select(col("doc_id"),
      split(lower(col("text")), "[ \\t\\n\\r\\f]+").as("l"))
    val wins = toks.filter(size(col("l")) >= W)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(l) - $W + 1), i -> concat_ws(' ', slice(l, i, $W)))")))
      .select(col("doc_id"), (col("pos") + 1).as("s"), col("col").as("w"))
    val dup = wins.groupBy("w").agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
    val dupWins = wins.join(dup.select("w"), "w")
    // shared windows exist only inside the passage: positions such that the
    // whole window is within the 12 shared tokens => 12 − 8 + 1 = 5 windows
    // per doc, union-covering exactly 12 tokens
    val perDoc = dupWins.groupBy("doc_id").agg(count(lit(1)).as("nw"),
      (max(col("s")) - min(col("s")) + W).cast("long").as("covered"))
      .orderBy("doc_id").collect()
    assert(perDoc.length == 2, s"expected 2 docs with shared windows, got ${perDoc.length}")
    perDoc.foreach { r =>
      assert(r.getLong(1) == 5, s"doc ${r.getLong(0)}: expected 5 shared windows, got ${r.getLong(1)}")
      assert(r.getLong(2) == 12, s"doc ${r.getLong(0)}: expected 12 covered tokens, got ${r.getLong(2)}")
    }
  }

  test("q_phrase_search: per-doc match counts equal a direct windowed recount") {
    val r = SpanQueries.queries("q_phrase_search")(spark, sf001)
    val rows = r.collect()
    assert(rows.nonEmpty, "top phrase matched no documents")
    val phrase = rows.head.getString(1)
    assert(phrase.split(" ").length == 3)
    // recount by scanning each doc's token trigrams directly
    val direct = Tables.documents(spark, sf001)
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[ \\t\\n\\r\\f]+"), t => t =!= "").as("l"))
      .filter(size(col("l")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(l) - 2), i -> concat_ws(' ', slice(l, i, 3)))")).as("tri"))
      .filter(col("tri") === phrase)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
    val fromQuery = rows.map(r0 => r0.getLong(0) -> r0.getLong(2)).toMap
    assert(fromQuery == direct, s"positional-index counts $fromQuery != direct recount $direct")
  }
}
