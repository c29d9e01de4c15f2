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

  test("q_matryoshka equals a driver-side grid-exact ranking recomputation") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray)
      .toMap
    def cos(a: Array[Long], b: Array[Long], dims: Int): Double = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < dims) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val expected = (0L until 10L).map { q =>
      val cands = vecs.keys.filter(_ != q).toSeq
      def top10(dims: Int) = cands
        .sortBy(c => (-cos(vecs(c), vecs(q), dims), c)).take(10).toSet
      q -> (top10(64) & top10(16)).size.toLong
    }.toMap
    val got = VectorQueries.queries("q_matryoshka")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"matryoshka drift: got $got expected $expected")
    assert(expected.values.exists(_ < 10L),
      "truncation lost nothing at sf0.001 — eval is vacuous")
    assert(expected.values.exists(_ > 0L), "no overlap at all — grid or ranking broken")
  }
}
