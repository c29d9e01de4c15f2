package graft

/** Global anti-pattern sweep over EVERY declared query's physical plan —
  * the per-query pins in PlanAuditSpec check the shapes that matter most,
  * this guards the whole surface against the two plans that are never
  * acceptable at 100 TB: an unbounded Cartesian product, and a
  * BroadcastNestedLoopJoin whose build side isn't a deliberate tiny
  * relation. A new query that accidentally plans one fails here before
  * the driver ever benches it. */
class PlanSweepSpec extends SparkSpec {

  // queries that legitimately plan a BroadcastNestedLoopJoin: a one-row
  // (or few-row) aggregate/constant side cross-joined in as a scalar —
  // a broadcast of a single row is a plan choice, not a scale bug
  private val onerowCross = Set(
    "q_subquery_scalar",   // scalar subquery vs whole table
    "q_tfidf_top",         // corpus-size scalar
    "q_bm25_top",          // corpus stats scalar
    "q_pmi_cooccur",       // corpus-size scalar
    "q_token_drift",       // split-size scalar
    "q_having_global",     // global-total scalar
    "q_dedup_bloom",       // bloom-filter literal
    "q_cms_heavy",         // sketch threshold scalar
    "q_join_cross",        // the deliberate cross-join demo (5x5 dims)
    "q_histogram",         // bucket-bounds scalar
    "q_vec_quantize",      // per-corpus scale scalar
    "q_sample_det",
    "q_keywords",          // corpus-size scalar
    "q_kmeans_assign",     // 8-row centroid table crossed for per-vector argmax
    "q_kmeans_update",     // same broadcast centroids as the assign step
    "q_ann_ivf",           // k-row coarse-quantizer codebook
    "q_surprisal",         // one-row corpus-token-total scalar vs the vocab
    "q_churn",             // one-row max-week scalar vs the presence table
    "q_rfm",               // one-row max-orderdate scalar vs the customer aggregate
    "q_vocab_coverage",    // one-row token-mass scalar vs the ≤1000-row top-k
    "q_dup_family_size",   // one-row corpus-count scalar vs the k-row histogram
    "q_mix_weights",       // one-row weight/token-total scalar vs the k-row source table
    "q_ngram_novelty",     // one-row max-doc-id scalar for the decile bucketing
    "q_vocab_growth",      // one-row max-doc-id scalar for the decile bucketing
    "q_sim_sparse",        // one-row corpus-count scalar for the idf weights
    "q_chi2_tokens",       // k-row source totals + one-row corpus total for the grid
    "q_ecdf_ks",           // one-row (n0, n1) totals vs the length census
    "q_matryoshka",        // 10-probe broadcast vs the corpus — the deliberate probe fan-out
    "q_basket_lift",       // one-row order-total scalar vs the ≥5-support pair table
    "q_benford",           // one-row grand-total scalar vs the 9-digit census
  )

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans no Cartesian product and no stray nested-loop join") {
      val p = fn(spark, sf0001).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$p")
      if (!onerowCross(name)) {
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin outside the one-row allowlist:\n$p")
      }
    }
  }
}
