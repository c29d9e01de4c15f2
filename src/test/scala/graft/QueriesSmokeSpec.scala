package graft

/** Every declared query runs end-to-end on sf0.001 and produces a
  * non-degenerate result. This is the in-repo mirror of the fact that
  * Verify swallows per-query exceptions (SURVEY §7.3.7) — a broken query
  * must fail HERE, not silently zero a driver round. */
class QueriesSmokeSpec extends SparkSpec {

  // queries whose correct sf0.001 output may legitimately be empty
  private val mayBeEmpty = Set("q_join_anti", "q_dedup_simhash", "q_dedup_near", "q_dedup_ngram",
    "q_graph_triangles")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.schema.nonEmpty, s"$name: empty schema")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name: returned 0 rows")
    }
  }

  test("entry() smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
