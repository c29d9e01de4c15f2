package graft

/** Cross-partitioning determinism pin for the float-sensitive queries:
  * changing spark.sql.shuffle.partitions changes how partial aggregates
  * merge, which is exactly where an order-dependent float sum leaks a
  * last-ulp divergence (the failure class SURVEY §7.3's nano-grid /
  * cents / DECIMAL(38) discipline exists to prevent). Every query here
  * must return IDENTICAL rows — bitwise, not approximately — under a
  * different partition count, or its oracle hash-match is a coincidence
  * of one partitioning. */
class RepartitionDeterminismSpec extends SparkSpec {

  // the queries whose outputs pass through ln/sqrt/ratio arithmetic or
  // big-integer moment sums — the ones a partial-merge reorder could bite
  private val floatSensitive = Seq(
    "q_entropy", "q_tfidf_top", "q_bm25_top", "q_pmi_cooccur",
    "q_surprisal", "q_tok_zipf", "q_autocorr", "q_gini",
    "q_vector_norms", "q_agg_stats", "q_corr_regr", "q_keywords",
    // round-5 additions: sqrt-of-decimal-moment (centroid drift), the
    // digit-bucketed prefix ratio, and the trimmed/LM ratios
    "q_emb_centroid", "q_pareto", "q_trimmed_mean", "q_bigram_lm",
    "q_lang_overlap", "q_vocab_coverage", "q_mix_weights",
    // late round-5 additions: the similarity-ratio joins and the
    // packing/waste ratios (integer-decided, r3-displayed — pin it)
    "q_dedup_prefix", "q_snapshot_neardup", "q_pack_efficiency",
    "q_pack_assign",
    // round-5 batch 2: rank-moment ratio, ln²-grid sparse cosine, and
    // the two first-occurrence ratio/cumulative reports
    "q_corr_spearman", "q_sim_sparse", "q_ngram_novelty", "q_vocab_growth",
    // round-5 batch 3: rolling-average, micro-χ², and KS ratios
    "q_rolling_7d", "q_chi2_tokens", "q_ecdf_ks",
    // round-5 batch 4: share/lift/t-stat ratios and the forward as-of avg
    "q_market_share", "q_decile_lift", "q_ab_ttest", "q_asof_forward",
    // round-5 batch 5: grid-exact cosine rankings
    "q_matryoshka",
    // round-5 batch 6: micro-grid lift/share/balance ratios
    "q_basket_lift", "q_benford", "q_epoch_shards",
    // round-6: ShardedRank consumers (global rank stitched from
    // per-shard numbering — the shard count itself must not matter),
    // the interpolating resampler, and the EWMA dyadic sum
    "q_win_ntile_pct", "q_percentile_global", "q_resample_linear",
    "q_ewma", "q_winsorized_mean",
    // round-6 late: revenue/balance ratio displays and the iterated
    // graph top-k merge (its (cos desc, id) key must stay total under
    // any partial-merge order)
    "q_returned_items", "q_sales_opportunity", "q_ann_nndescent")

  test("float-sensitive queries return identical rows across shuffle-partition settings") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def run(name: String): Seq[org.apache.spark.sql.Row] =
      SparkEntry.queries(name)(spark, sf0001).collect().toSeq
    try {
      val baseline = floatSensitive.map(n => n -> run(n)).toMap
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      floatSensitive.foreach { n =>
        assert(run(n) == baseline(n),
          s"$n output depends on the shuffle partitioning — order-dependent float path")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
