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
    "q_paginate_keyset",   // 1-row page-boundary tuple broadcast into the seek predicate
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
    "q_sales_opportunity", // one-row positive-balance (n, sum) scalar vs customers
    "q_mask_join",         // one-row token-collision audit scalar vs the k-segment rollup
    "q_target_encode",     // one-row global-prior (gn, ghits) scalar vs the k-category table
    "q_theil_sen",         // month-census self-pairing (≤ months², k-bounded) + 1-row median slope
    "q_kendall",           // the same k-bounded month-census self-pairing, concordance census
  )

  // queries that legitimately plan an UNPARTITIONED window (empty
  // PARTITION BY = every input row through one reducer — a scale-killer
  // on corpus-scale input, tolerable only on k-bounded intermediates).
  // Each entry's window input is bounded by construction, independent of
  // corpus size:
  private val kBoundedGlobalWindow = Set(
    "q_autocorr",       // daily rollup series (≤ #days in the corpus)
    "q_ecdf_ks",        // ~300-row document-length census
    "q_pareto",         // supplier census after aggregation
    "q_rolling_7d",     // daily revenue rollup (≤ #days)
    "q_tok_zipf",       // rank over the top-k token census
    "q_vocab_coverage", // ≤1000-row top-k vocabulary
    "q_vocab_growth",   // decile buckets over a ≤10-row census
    "q_win_ntile_pct",  // ShardedRank's shards-row (=shuffle.partitions)
                        // offset census — the corpus itself is ranked via
                        // range-repartition + per-shard local row numbers
    "q_percentile_global", // same ShardedRank census window
    "q_seasonal_decompose", // 7-day MA over the ~#days daily census
    "q_changepoint",    // CUSUM windows over the ≤#days daily census
    "q_theil_sen",      // median windows over the ≤months² pair census
  )

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans no Cartesian product and no stray nested-loop join") {
      val df = fn(spark, sf0001)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$p")
      if (!onerowCross(name)) {
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin outside the one-row allowlist:\n$p")
      }
      // No corpus-scale single-reducer sorts: an unpartitioned window is
      // only acceptable on a k-bounded intermediate (allowlisted above).
      // This is the permanent tripwire behind r5's manual window audit.
      val unpart = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      if (!kBoundedGlobalWindow(name)) {
        assert(unpart.isEmpty,
          s"$name plans an unpartitioned Window over ${unpart.map(_.child.nodeName)} " +
            s"outside the k-bounded allowlist — shard it (see graft.plans.ShardedRank):\n$p")
      }
    }
  }

  test("q_win_ntile_pct's only global window consumes the shard census, not the corpus") {
    val qe = SparkEntry.queries("q_win_ntile_pct")(spark, sf0001).queryExecution
    val unpart = qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(unpart.size == 1)
    // the window's subtree must aggregate before it ranks: the input is
    // the per-shard count census (≤ spark.sql.shuffle.partitions rows)
    val aggBelow = unpart.head.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggBelow.nonEmpty,
      "ntile census window no longer sits on an aggregate — corpus-scale regression?")
  }
}
