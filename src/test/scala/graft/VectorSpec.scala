package graft

import graft.queries.{VectorQueries, RelationalQueries, AggQueries, EventQueries}

/** Invariants for the round-3 operators (SURVEY §2.13) beyond the DuckDB
  * hash gate: conservation (partitions cover every row exactly once),
  * quantization error bounds, and funnel monotonicity. */
class VectorSpec extends SparkSpec {

  test("int8 quantization: every vector accounted, relative error small") {
    val rows = VectorQueries.queries("q_vec_quantize")(spark, sf001).collect()
    val total = Tables.embeddings(spark, sf001).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    // int8 symmetric quantization of a 64-dim float vector: avg relative
    // reconstruction error is well under 1% (worst case scale/2 per elem)
    rows.foreach { r =>
      val err = r.getAs[Double]("avg_rel_err")
      assert(err >= 0.0 && err < 0.01, s"label ${r.get(0)}: avg_rel_err $err")
    }
  }

  test("k-means assignment: partition of all vectors; centroids self-assign") {
    val rows = VectorQueries.queries("q_kmeans_assign")(spark, sf001).collect()
    val total = Tables.embeddings(spark, sf001).count()
    assert(rows.map(_.getAs[Long]("n_assigned")).sum == total)
    assert(rows.length == 8)
    // every centroid has cosine 1.000 with itself, so each cid's bucket
    // holds at least one vector and max avg_cos <= 1
    rows.foreach { r =>
      assert(r.getAs[Long]("n_assigned") >= 1L)
      assert(r.getAs[Double]("avg_cos") <= 1.0)
    }
  }

  test("range join partitions orders across months exactly once") {
    val rows = RelationalQueries.queries("q_join_range")(spark, sf001).collect()
    val total = Tables.orders(spark, sf001).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == total)
  }

  test("histogram buckets partition all orders") {
    val rows = AggQueries.queries("q_histogram")(spark, sf001).collect()
    val total = Tables.orders(spark, sf001).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == total)
  }

  test("funnel stages are monotonically non-increasing") {
    val rows = EventQueries.queries("q_funnel")(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("1_view", "2_click", "3_purchase"))
    assert(rows("1_view") >= rows("2_click"))
    assert(rows("2_click") >= rows("3_purchase"))
    assert(rows("3_purchase") > 0L) // corpus is dense enough to convert
  }
}
