package graft

import graft.typed.TypedOps
import org.apache.spark.sql.functions._

/** The typed Dataset surface agrees with its untyped equivalents. */
class TypedOpsSpec extends SparkSpec {

  test("typed langStats equals untyped groupBy aggregation") {
    val ds = TypedOps.docs(spark, sf0001)
    val typed = TypedOps.langStats(ds, 100L).collect()
      .map(s => s.lang -> (s.n_docs, s.total_chars, s.longest)).toMap
    val untyped = Tables.documents(spark, sf0001)
      .filter(col("n_chars") >= 100)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("t"), max("n_chars").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(typed == untyped)
  }

  test("typed representatives: one deterministic doc per (lang, source)") {
    val ds = TypedOps.docs(spark, sf0001)
    val reps = TypedOps.representatives(ds).collect()
    val groups = ds.collect().groupBy(d => (d.lang, d.source))
    assert(reps.length == groups.size)
    reps.foreach { r =>
      val g = groups((r.lang, r.source))
      val best = g.maxBy(d => (d.n_chars, -d.doc_id))
      assert(r.doc_id == best.doc_id, s"(${r.lang},${r.source})")
    }
  }

  test("encoder round-trip preserves the case class") {
    val ds = TypedOps.docs(spark, sf0001)
    val first = ds.orderBy("doc_id").head()
    assert(first.doc_id == 0L && first.text.nonEmpty && first.n_chars > 0)
  }

  test("TopKAgg is partition-invariant and equals a full sort under any split") {
    val agg = graft.functions.TopKAgg(3)
    val rnd = new scala.util.Random(42)
    val data = Seq.fill(200)((rnd.nextInt(20).toLong, rnd.nextLong().abs % 1000))
    val expected = data.sortBy(t => (-t._1, t._2)).take(3)
    // reduce in several orders and merge partial buffers from arbitrary
    // splits — the associativity/commutativity partial aggregation needs
    for (seed <- 1 to 5) {
      val r = new scala.util.Random(seed)
      val shuffled = r.shuffle(data)
      val parts = shuffled.grouped(1 + r.nextInt(50)).toSeq
      val partials = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      partials.foreach(p => assert(p.length <= 3, "buffer exceeded k"))
      val merged = agg.finish(partials.foldLeft(agg.zero)(agg.merge))
      assert(merged == expected, s"split (seed $seed) diverged: $merged vs $expected")
    }
  }

  test("q_topk_peragg equals the window top-k it replaces") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val win = Tables.orders(spark, sf0001)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("o_orderstatus").orderBy(col("cents").desc, col("o_orderkey"))).cast("long"))
      .filter(col("rank") <= 3)
      .select("o_orderstatus", "rank", "o_orderkey", "cents")
      .orderBy("o_orderstatus", "rank")
      .collect().toSeq
    val got = graft.queries.UdxQueries.queries("q_topk_peragg")(spark, sf0001)
      .collect().toSeq
    assert(got == win, s"aggregator top-k diverged from the window form")
  }
}
