package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.13 round-4 analytics operators: anomaly detection, skyline
  * (Pareto frontier), token-entropy scoring, a composite Gopher-style
  * quality gate, compaction bin-packing, and PMI token association.
  *
  * All six are ORACLE queries. The float discipline (§7.3) is the usual
  * three tools: decisions made by CROSS-MULTIPLIED integer comparisons
  * (never a float mean/ratio), per-term values snapped to an integer
  * nano-grid BEFORE any order-dependent sum, and r2/r3 single-op rounding
  * for displayed ratios.
  */
object AnalyticsQueries extends QueryGroup {

  private val enStops = Seq("the", "a", "of", "and", "is")

  private def toks(c: Column): Column =
    filter(split(lower(c), wsRegex), t => t =!= "")

  /** DuckDB mirror of toks(text) */
  private val oToks =
    "list_filter(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+'), x -> x <> '')"

  val queries: Map[String, QFn] = Map(
    // ---- corpus snapshot diff (ORACLE) ----------------------------------
    // The incremental-curation primitive: diff two corpus versions into
    // added / removed / changed / unchanged. Versions are carved
    // deterministically from the corpus (v1 drops doc_id % 10 == 0,
    // v2 drops % 7 == 0 and rewrites % 5 == 0 docs), change detection
    // compares md5 DIGESTS, never bodies — at 100 TB the full outer
    // join moves doc_id + 32-byte digest + a length per side, and the
    // same digest artifact is what an incremental pipeline persists
    // between runs to diff against next week's crawl. One join keyed on
    // doc_id + a 4-row rollup.
    "q_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val v1 = docs.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), md5(col("text")).as("h1"),
          length(col("text")).cast("long").as("len1"))
      val v2 = docs.filter(col("doc_id") % 7 =!= 0)
        .withColumn("t2", when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
        .select(col("doc_id"), md5(col("t2")).as("h2"),
          length(col("t2")).cast("long").as("len2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("h1").isNull, "added")
            .when(col("h2").isNull, "removed")
            .when(col("h1") === col("h2"), "unchanged")
            .otherwise("changed"))
        .groupBy("status")
        .agg(count(lit(1)).as("n_docs"), sum(coalesce(col("len2"), col("len1"))).as("n_chars"))
        .orderBy("status")
    }),

    // ---- CUSUM changepoint detection (ORACLE) ---------------------------
    // Where did the level of daily revenue shift? The classic CUSUM
    // statistic S_t = Σ(x_i − mean) is float-hostile (a running mean),
    // but cross-multiplying clears it exactly: n·S_t = n·C_t − t·T with
    // C_t the cumulative daily cents and T/n the global total/count —
    // all BIGINT (n ≈ 2.4k days; daily cents ~1e13 at 100 TB keeps
    // n·C_t < 2^63). The changepoint is argmax |n·S_t| with a date
    // tiebreak. Shape at scale: one hash shuffle to the ≤#days daily
    // census, then every window — cumulative, index, and the full-frame
    // totals — runs over that k-bounded series (PlanSweep-allowlisted),
    // and a 1-row TakeOrdered picks the argmax.
    "q_changepoint" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").as("d"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
      val wCum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      daily
        .withColumn("cum", sum(col("x")).over(wCum))
        .withColumn("idx", row_number().over(Window.orderBy("d")).cast("long"))
        .withColumn("tot", sum(col("x")).over(wAll))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("sv", col("n") * col("cum") - col("idx") * col("tot"))
        .orderBy(abs(col("sv")).desc, col("d"))
        .limit(1)
        .select(col("d").as("cp_date"), abs(col("sv")).as("s_abs"), col("n").as("n_days"))
    }),

    // ---- anomaly detection without a float mean (ORACLE) ---------------
    // Events whose value exceeds 2× their user's mean. The naive form
    // (value > 2*avg(value)) can never hash-match an oracle — avg is an
    // order-dependent float sum. Cross-multiplying clears it: with exact
    // integer cents, value > 2·mean  ⟺  cents·n > 2·sum_cents, all
    // BIGINT (cents ≤ 1e4, n ≤ corpus rows — no overflow until ~1e15
    // rows per user). Shape at 100 TB: ONE hash shuffle on user_id (both
    // window aggregates share the partition), then a k-group aggregate.
    "q_anomaly_mean" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
      val anom = col("cents") * col("n_u") > col("s_u") * lit(2L)
      Tables.events(s, d)
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .withColumn("n_u", count(col("cents")).over(w))
        .withColumn("s_u", sum(col("cents")).over(w))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(anom, 1L).otherwise(0L)).as("n_anom"),
          sum(when(anom, col("cents")).otherwise(0L)).as("anom_cents"))
        .orderBy("event_type")
    }),

    // ---- 2-D skyline / Pareto frontier (ORACLE) -------------------------
    // Per order status: orders not dominated on (price↑, recency↑) — the
    // classic skyline operator, O(n log n) via one window sort instead of
    // the O(n²) NOT EXISTS self-join. A row survives iff its date beats
    // the max date among STRICTLY higher prices (RANGE … 1 PRECEDING on
    // descending integer cents = "cents ≥ mine+1") and ties the max date
    // among equal prices (RANGE CURRENT ROW = the peer group). Both
    // frames ride ONE (status, cents desc) sort — a single exchange, no
    // join. Dominance is evaluated on exact integers and raw timestamps;
    // nothing floats.
    "q_skyline" -> ((s, d) => {
      val ws = Window.partitionBy("o_orderstatus").orderBy(col("cents").desc)
      val wGt = ws.rangeBetween(Window.unboundedPreceding, -1)
      val wEq = ws.rangeBetween(Window.currentRow, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .withColumn("m_gt", max(col("o_orderdate")).over(wGt))
        .withColumn("m_eq", max(col("o_orderdate")).over(wEq))
        .filter((col("m_gt").isNull || col("o_orderdate") > col("m_gt")) &&
          col("o_orderdate") === col("m_eq"))
        .select(col("o_orderstatus"), col("o_orderkey"), col("cents"),
          fmtTs(col("o_orderdate")).as("odate"))
        .orderBy("o_orderstatus", "o_orderkey")
    }),

    // ---- token-entropy quality scoring (ORACLE) -------------------------
    // Shannon entropy of each doc's token distribution — the information-
    // density signal that separates natural text (high) from boilerplate
    // and keyword stuffing (low). Entropy is Σ -p·ln(p): an order-
    // dependent float sum, so each term is snapped to an integer nano-nat
    // grid FIRST (floor(-p·ln(p)·1e9 + 0.5)); the BIGINT sum is then
    // order-free and engine-exact (§7.3.13 — p is a single division of
    // exact counts, ln-bit agreement is already load-bearing for tf-idf/
    // BM25). Half-nat buckets → per-lang histogram. Shape at 100 TB: one
    // (doc, tok) count aggregate, a window sharing the doc_id partition,
    // then two k-group aggregates — one shuffle family on doc_id.
    "q_entropy" -> ((s, d) => {
      val p = col("c").cast("double") / col("n").cast("double")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(toks(col("text"))).as("tok"))
        .groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("c"))
        .withColumn("n", sum(col("c")).over(Window.partitionBy("doc_id")))
        .withColumn("term_nano",
          floor(-p * log(p) * lit(1000000000.0) + lit(0.5)).cast("long"))
        .groupBy("doc_id", "lang").agg(sum(col("term_nano")).as("ent_nano"))
        .withColumn("bucket", expr("ent_nano div 500000000"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("ent_nano")).as("sum_ent_nano"))
        .orderBy("lang", "bucket")
    }),

    // ---- composite Gopher-style quality gate (ORACLE) -------------------
    // The production curation shape (Gopher/C4/Dolma): a doc passes a
    // CONJUNCTION of cheap rules — token count in range, mean word length
    // in [3,10], ≥2 stopwords, duplicated-3-gram fraction < 0.3. Every
    // rule is an integer cross-multiplication (3·n ≤ Σlen ≤ 10·n, not
    // Σlen/n ∈ [3,10]; 10·dups < 3·grams, not dups/grams < 0.3), so the
    // report is exact. Pure map-side until one k-group aggregate — zero
    // pre-agg shuffle at any scale.
    "q_quality_gate" -> ((s, d) => {
      val t = toks(col("text"))
      val n2 = size(t) - 2
      val grams = zip_with(
        zip_with(slice(t, lit(1), n2), slice(t, lit(2), n2), (x, y) => concat(x, lit(" "), y)),
        slice(t, lit(3), n2), (x, y) => concat(x, lit(" "), y))
      val cnt1 = (c: Column) => sum(when(c, 1L).otherwise(0L))
      Tables.documents(s, d)
        .select(col("lang"),
          size(t).cast("long").as("n_tok"),
          length(concat_ws("", t)).cast("long").as("sum_len"),
          size(filter(t, x => x.isin(enStops: _*))).cast("long").as("n_stop"),
          when(size(t) >= 3, grams).otherwise(array(concat_ws(" ", t))).as("g"))
        .select(col("lang"), col("n_tok"), col("sum_len"), col("n_stop"),
          size(col("g")).cast("long").as("n_grams"),
          size(array_distinct(col("g"))).cast("long").as("n_distinct"))
        .withColumn("r_len", col("n_tok").between(20L, 200L))
        .withColumn("r_word",
          col("sum_len") >= col("n_tok") * 3L && col("sum_len") <= col("n_tok") * 10L)
        .withColumn("r_stop", col("n_stop") >= 2L)
        .withColumn("r_rep",
          (col("n_grams") - col("n_distinct")) * lit(10L) < col("n_grams") * lit(3L))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          cnt1(col("r_len")).as("n_len_ok"), cnt1(col("r_word")).as("n_word_ok"),
          cnt1(col("r_stop")).as("n_stop_ok"), cnt1(col("r_rep")).as("n_rep_ok"),
          cnt1(col("r_len") && col("r_word") && col("r_stop") && col("r_rep")).as("n_pass"))
        .orderBy("lang")
    }),

    // ---- compaction bin-packing planner (ORACLE) ------------------------
    // The table-maintenance operator behind every lakehouse OPTIMIZE:
    // group small files (stand-in: orders, size = exact cents) into
    // target-sized compaction bins. Greedy running-sum packing —
    // bin = (cumulative_size - 1) div target — is deterministic and
    // single-pass, exactly how distributed compaction planners batch
    // files per partition. One window sort per status partition + two
    // k-group aggregates; at 100 TB the per-partition file lists are
    // metadata-scale, orders smaller than the data they describe.
    "q_compact_plan" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .withColumn("cum", sum(col("cents")).over(w))
        .withColumn("bin", expr("(cum - 1) div 1000000000"))
        .groupBy("o_orderstatus", "bin")
        .agg(count(lit(1)).as("n_files"), sum(col("cents")).as("bin_cents"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_bins"), sum(col("n_files")).as("n_files"),
          max(col("bin_cents")).as("max_bin_cents"),
          r2(sum(col("bin_cents")).cast("double") / count(lit(1))).as("avg_bin_cents"))
        .orderBy("o_orderstatus")
    }),

    // ---- PMI token association (ORACLE) ---------------------------------
    // Pointwise mutual information over within-doc token co-occurrence —
    // the collocation/phrase-mining signal (top pairs by support, PMI
    // attached). Pairs are generated ROW-LOCALLY from each doc's sorted
    // distinct-token array (indexed transform + flatten — no self-join on
    // the corpus; per-doc vocab is bounded, so the expansion is O(v²)
    // per row, not O(corpus²)). PMI's inputs are exact BIGINT counts;
    // products stay < 2^53, so the single division + ln is bit-identical
    // in both engines (r3 for display). Doc-frequency and corpus-size
    // sides are tiny aggregates → broadcast joins at any scale.
    "q_pmi_cooccur" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), array_sort(array_distinct(toks(col("text")))).as("td"))
        .filter(size(col("td")) > 0)
        .localCheckpoint(true) // one tokenizer pass for pairs + df + N (§7.3.11)
      val pairs = docs
        .select(explode(flatten(transform(col("td"), (x, i) =>
          transform(slice(col("td"), i + lit(2), size(col("td"))),
            y => struct(x.as("t1"), y.as("t2")))))).as("p"))
        .select(col("p.t1"), col("p.t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("n_co"))
      val df = docs.select(explode(col("td")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("nd"))
      pairs
        .join(broadcast(df.select(col("tok").as("t1"), col("df").as("df1"))), "t1")
        .join(broadcast(df.select(col("tok").as("t2"), col("df").as("df2"))), "t2")
        .crossJoin(broadcast(n))
        .withColumn("pmi", r3(log((col("n_co") * col("nd")).cast("double") /
          (col("df1") * col("df2")).cast("double"))))
        .select("t1", "t2", "n_co", "pmi")
        .orderBy(col("n_co").desc, col("t1"), col("t2")).limit(15)
    }),

    // ---- token-distribution drift detection (ORACLE) --------------------
    // Train/serve skew detection: compare per-token document frequency
    // between two corpus splits (even/odd doc_ids stand in for
    // train vs new-crawl) and rank tokens by rate divergence. The
    // RANKING key is the cross-multiplied integer |df_a·n_b − df_b·n_a|
    // — a float rate difference could flip order in the last ulp and
    // break the top-k; the displayed rate_diff is two exact-int
    // divisions and one subtraction (bit-identical), r3 for output.
    // Shape at 100 TB: distinct (doc, tok) explode → ONE hash aggregate
    // with conditional counts (no per-split join), split sizes broadcast.
    "q_token_drift" -> ((s, d) => {
      val sizes = Tables.documents(s, d).agg(
        sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)).as("n_b"))
      Tables.documents(s, d)
        .select(col("doc_id"), explode(array_distinct(toks(col("text")))).as("tok"))
        .groupBy("tok")
        .agg(sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("df_a"),
          sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)).as("df_b"))
        .crossJoin(broadcast(sizes))
        .withColumn("drift", abs(col("df_a") * col("n_b") - col("df_b") * col("n_a")))
        .withColumn("rate_diff", r3(col("df_a").cast("double") / col("n_a").cast("double")
          - col("df_b").cast("double") / col("n_b").cast("double")))
        .select("tok", "df_a", "df_b", "drift", "rate_diff")
        .orderBy(col("drift").desc, col("tok")).limit(20)
    }),

    // ---- ordered string aggregation / LISTAGG (ORACLE) ------------------
    // The LISTAGG / string_agg shape BI tools emit constantly. The only
    // way it can hash-match across engines is a TOTAL order on the
    // elements: Spark's collect_set order is partition-dependent, so the
    // set is sorted BEFORE joining (array_join(array_sort(...))) and the
    // oracle states string_agg(DISTINCT … ORDER BY …). k-group output.
    "q_listagg" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          countDistinct(col("o_orderstatus")).as("n_statuses"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")),

    // ---- deterministic mode / most-frequent value (ORACLE) --------------
    // mode() with an EXPLICIT tie-break (count desc, then value asc) —
    // both engines' built-in mode() leave ties undefined, which can
    // never hash-match, so the operator is count + row_number over the
    // group. Two aggregations sharing the lang hash partitioning + a
    // tiny window over k groups.
    "q_mode" -> ((s, d) => {
      val w = Window.partitionBy("lang").orderBy(col("n").desc, col("source"))
      Tables.documents(s, d)
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("lang"), col("source").as("mode_source"), col("n"))
        .orderBy("lang")
    }),

    // ---- correlation / linear regression from exact sums (ORACLE) -------
    // Pearson corr and OLS slope/intercept per group — the BI stats
    // aggregates. The built-in corr()/regr_slope() accumulate doubles in
    // partition order and can never hash-match an oracle; instead all
    // five moment sums (Σx Σy Σxy Σx² Σy²) are EXACT integers over cents
    // (summed as DECIMAL(38)/HUGEINT so no scale ceiling), and the
    // closed-form formulas are evaluated in doubles with an identical
    // operation order in both engines — exact ints → one rounding per
    // cast → IEEE-identical arithmetic. Map-side partials + one k-group
    // aggregate; the moment-sum form is also the distributed-merge shape
    // (partial moments re-combine associatively at any scale).
    "q_corr_regr" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val li = Tables.lineitem(s, d)
        .withColumn("x", round(col("l_quantity") * 100).cast("long"))
        .withColumn("y", round(col("l_extendedprice") * 100).cast("long"))
      val g = li.groupBy("l_returnflag").agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        sum(col("y").cast(dec)).cast("double").as("sy"),
        sum((col("x") * col("y")).cast(dec)).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx"),
        sum((col("y") * col("y")).cast(dec)).cast("double").as("syy"))
      g.withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
        .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
        .withColumn("dy", col("n") * col("syy") - col("sy") * col("sy"))
        .withColumn("corr_xy", r3(col("num") / (sqrt(col("dx")) * sqrt(col("dy")))))
        .withColumn("slope", r3(col("num") / col("dx")))
        .withColumn("icept_usd", r2((col("sy") - (col("num") / col("dx")) * col("sx")) / col("n") / lit(100.0)))
        .select("l_returnflag", "corr_xy", "slope", "icept_usd")
        .orderBy("l_returnflag")
    }),

    // ---- Spearman rank correlation (ORACLE) -----------------------------
    // The robust companion to q_corr_regr's Pearson: correlation of RANKS
    // ignores the heavy price tail that inflates moment-based corr.
    // Built-in rank() leaves ties undefined across engines, so ranks are
    // row_number over (value, o_orderkey) — o_orderkey is the table's
    // unique key, so the tie order is a stated total order both engines
    // compute identically (a documented variant of tie-averaged Spearman;
    // lineitem's (orderkey, linenumber) is NOT unique in this corpus,
    // which would leave real engine freedom — orders is the table with a
    // true PK). x = order value in cents, y = order date as yyyymmdd:
    // "does order value drift with time" per status. Σd² is exact
    // (DECIMAL(38)/HUGEINT); the n(n²−1) denominator is evaluated in
    // doubles as nd·nd·nd − nd (identical single ops — n³ clears int64
    // only past ~2e6 rows/group, doubles don't care); one final division
    // + r3. Scale: two per-group sort windows (partitioned by group,
    // never global) + one hash agg.
    "q_corr_spearman" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val b = Tables.orders(s, d).select(col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("x"),
        date_format(col("o_orderdate"), "yyyyMMdd").cast("long").as("y"),
        col("o_orderkey"))
      val wx = Window.partitionBy("o_orderstatus").orderBy(col("x"), col("o_orderkey"))
      val wy = Window.partitionBy("o_orderstatus").orderBy(col("y"), col("o_orderkey"))
      b.withColumn("rx", row_number().over(wx).cast("long"))
        .withColumn("ry", row_number().over(wy).cast("long"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(((col("rx") - col("ry")) * (col("rx") - col("ry"))).cast(dec))
            .cast("double").as("sd2"))
        .withColumn("nd", col("n").cast("double"))
        .withColumn("rho", r3(lit(1.0) - lit(6.0) * col("sd2")
          / (col("nd") * col("nd") * col("nd") - col("nd"))))
        .select("o_orderstatus", "n", "rho")
        .orderBy("o_orderstatus")
    }),

    // ---- grouped argmax via max_by/min_by (ORACLE) ----------------------
    // Per-group "row with the extreme value" WITHOUT a window sort: the
    // max_by/min_by aggregate is one hash agg with map-side partials —
    // the shape that wins at corpus scale when only the argmax row is
    // wanted (q_mode's row_number window sorts every group; this sorts
    // nothing). Ties are impossible by construction: the ordinal packs
    // (cents, custkey) into one BIGINT (custkey < 1e9 keeps the packing
    // monotone for negative balances too), so both engines pick the same
    // row deterministically.
    "q_argmax_group" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey"), col("c_custkey"),
          round(col("c_acctbal") * 100).cast("long").as("cents"))
        .withColumn("ord", col("cents") * lit(1000000000L) + col("c_custkey"))
      c.groupBy("c_nationkey").agg(
          expr("max_by(c_custkey, ord)").as("top_cust"),
          max(col("cents")).as("top_bal_cents"),
          expr("min_by(c_custkey, ord)").as("bottom_cust"),
          min(col("cents")).as("bottom_bal_cents"),
          count(lit(1)).as("n_cust"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("c_nationkey"), col("n_name"))), "c_nationkey")
        .select("n_name", "top_cust", "top_bal_cents",
          "bottom_cust", "bottom_bal_cents", "n_cust")
        .orderBy("n_name")
    }),

    // ---- weighted median via running weight (ORACLE) --------------------
    // Lower weighted median: smallest value v with 2·Σweight(≤v) ≥ total
    // weight. The threshold test is invariant to tie order inside equal
    // values (the LAST row of value v carries cum = Σweight(≤v), which is
    // order-free), so an ORDER BY on the value alone is deterministic —
    // no fragile tiebreak column needed. All integers (cents weights);
    // one window sort per group, the total rides the same partition.
    "q_weighted_median" -> ((s, d) => {
      val wc = Window.partitionBy("l_returnflag").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy("l_returnflag")
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("v"),
          round(col("l_quantity") * 100).cast("long").as("wgt"))
        .withColumn("cum", sum(col("wgt")).over(wc))
        .withColumn("tot", sum(col("wgt")).over(wt))
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy("l_returnflag")
        .agg(min(col("v")).as("wmedian_cents"), max(col("tot")).as("total_weight"))
        .orderBy("l_returnflag")
    }),

    // ---- HAVING against a global aggregate (ORACLE) ---------------------
    // The TPC-H Q11 shape: keep groups whose aggregate exceeds a fraction
    // of the GLOBAL aggregate. The global total is a one-row broadcast;
    // the retention test is cross-multiplied (20·sum > total ⟺ share >
    // 5%) so the cut is exact; the displayed share is one r2 division.
    "q_having_global" -> ((s, d) => {
      val c = Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      val tot = c.agg(sum(col("cents")).as("tot"))
      c.groupBy("o_orderpriority").agg(sum(col("cents")).as("sum_cents"))
        .crossJoin(broadcast(tot))
        .filter(col("sum_cents") * 20L > col("tot"))
        .withColumn("share_pct", r2(col("sum_cents").cast("double") * lit(100.0) / col("tot").cast("double")))
        .select("o_orderpriority", "sum_cents", "share_pct")
        .orderBy("o_orderpriority")
    }),

    // ---- exact DECIMAL money arithmetic (ORACLE) ------------------------
    // The money-typed path: doubles cast ONCE to DECIMAL(18,2) at the
    // boundary, then all aggregation in exact decimal — the type
    // discipline a financial pipeline uses instead of the cents-BIGINT
    // trick the rest of this suite demonstrates. Outputs cast to DOUBLE
    // (sums < 2^53 cents, so exact and engine-identical); DECIMAL-typed
    // output columns don't survive the parquet↔DuckDB hash boundary.
    // Map-side partials + one k-group aggregate.
    "q_decimal_exact" -> ((s, d) => {
      val m = col("o_totalprice").cast("decimal(18,2)")
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(sum(m).cast("double").as("sum_usd"),
          min(m).cast("double").as("min_usd"), max(m).cast("double").as("max_usd"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    }),

    // ---- time-bound conversion funnel (ORACLE) ---------------------------
    // Conversion-WINDOW attribution: of users whose first click lands on
    // weekday W, how many purchase within 7 days of that click, and how
    // fast. Unlike q_funnel (unbounded ordering), the step carries a
    // deadline — the marketing-attribution shape. Weekday is epoch-day
    // mod 7 (both engines' dayofweek() disagree on Sunday). Time-to-
    // convert sums exact micros BEFORE one division chain in identical
    // order. Shape: two user-keyed aggregates + one user join — a single
    // shuffle family on user_id; the weekday rollup is k-group.
    "q_funnel_window" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val fc = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min(col("ts")).as("c0"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"))
      fc.join(p, Seq("user_id"), "left")
        .withColumn("pin", when(col("pts") >= col("c0") &&
          col("pts") <= col("c0") + expr("INTERVAL 7 DAYS"), col("pts")))
        .groupBy("user_id", "c0").agg(min(col("pin")).as("p0"))
        .withColumn("wd", expr("CAST(datediff(to_date(c0), date'1970-01-01') % 7 AS BIGINT)"))
        .withColumn("dt_us", unix_micros(col("p0")) - unix_micros(col("c0")))
        .groupBy("wd")
        .agg(count(lit(1)).as("n_clicked"), count(col("p0")).as("n_conv"),
          r2(count(col("p0")).cast("double") * lit(100.0) / count(lit(1)).cast("double")).as("conv_pct"),
          r2(sum(col("dt_us")).cast("double") / count(col("p0")).cast("double") / lit(3600000000.0)).as("avg_hours"))
        .orderBy("wd")
    }),

    // ---- data-profiling audit (ORACLE) -----------------------------------
    // The ANALYZE/profiling operator every ingestion pipeline runs first:
    // per column — nulls and exact distinct cardinality — in ONE pass
    // (one multi-distinct aggregate, which Catalyst plans via expand;
    // at 100 TB the exact profile is affordable per-partition-sample or
    // swapped for approx_count_distinct; the report stays one row per
    // column either way).
    "q_null_audit" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val m = o.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
        countDistinct(col("o_custkey")).as("dist_custkey"),
        sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("null_status"),
        countDistinct(col("o_orderstatus")).as("dist_status"),
        sum(when(col("o_orderpriority").isNull, 1L).otherwise(0L)).as("null_priority"),
        countDistinct(col("o_orderpriority")).as("dist_priority"))
      m.select(expr(
        "stack(3, 'o_custkey', null_custkey, dist_custkey, " +
          "'o_orderpriority', null_priority, dist_priority, " +
          "'o_orderstatus', null_status, dist_status) AS (col_name, n_nulls, n_distinct)"),
        col("n_rows"))
        .select("col_name", "n_rows", "n_nulls", "n_distinct")
        .orderBy("col_name")
    }),

    // ---- 3-event path mining (ORACLE) ------------------------------------
    // The product-analytics path query: most common 3-event sequences
    // (order-2 extension of q_event_transitions' order-1 matrix). Two
    // leads over ONE (user, time) window sort; path support counted by
    // occurrences and by distinct users. Total orders everywhere:
    // (ts, event_id) within user, (count desc, path) on output.
    "q_event_path" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .withColumn("path", concat_ws(">", col("event_type"), col("e2"), col("e3")))
        .groupBy("path")
        .agg(count(lit(1)).as("n_occurrences"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("n_occurrences").desc, col("path")).limit(15)
    }),

    // ---- transition dwell-time analysis (ORACLE) -------------------------
    // How long users sit between consecutive events, per (prev → cur)
    // transition — the latency companion to the Markov transition matrix.
    // Gaps are exact BIGINT micros (engines agree on timestamp
    // subtraction at micro precision); the displayed mean is one r2
    // division chain of exact sums. Same single (user, time) window sort
    // as q_event_path, then a k²-group aggregate.
    "q_dwell_time" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("cur_type"))
        .agg(count(lit(1)).as("n_gaps"), sum(col("gap_us")).as("sum_gap_us"),
          max(col("gap_us")).as("max_gap_us"),
          r2(sum(col("gap_us")).cast("double") / count(lit(1)).cast("double") / lit(1000000.0)).as("avg_gap_sec"))
        .orderBy("prev_type", "cur_type")
    }),

    // ---- equi-depth histogram / decile statistics (ORACLE) ---------------
    // The optimizer-statistics operator: 10 equal-population buckets with
    // per-bucket bounds, PER GROUP — what ANALYZE TABLE collects (by
    // sampling at 100 TB; this is the exact form). The ntile window is
    // keyed on the group so it shards across executors — a global ntile
    // would funnel the corpus through one reducer, the single-partition
    // trap. Total (cents, orderkey) order makes the tiling deterministic.
    "q_histogram_eqd" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority").orderBy(col("cents"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy("o_orderpriority", "decile")
        .agg(count(lit(1)).as("n"), min(col("cents")).as("lo_cents"),
          max(col("cents")).as("hi_cents"))
        .orderBy("o_orderpriority", "decile")
    }),

    // ---- consistent cross-table hash sampling (ORACLE) -------------------
    // Debug-at-scale sampling done RIGHT: sample ~10% of customers by a
    // content hash of the KEY, then keep ALL their orders — the two
    // tables stay joinable because membership is a pure function of the
    // key, not a per-table coin flip (rand() samples of two tables share
    // ~1% of customers; hash samples share 100%). Per-status counts over
    // the sampled join; the customer side of the join is the sample —
    // broadcastable at any corpus scale.
    "q_sample_join" -> ((s, d) => {
      val sampled = Tables.customer(s, d)
        .filter(md5(col("c_custkey").cast("string")) < "1a") // 26/256 ≈ 10%
        .select(col("c_custkey"))
      Tables.orders(s, d)
        .join(broadcast(sampled), col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), countDistinct(col("o_custkey")).as("n_customers"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
        .orderBy("o_orderstatus")
    }),

    // ---- Z-order clustering key (ORACLE) ----------------------------------
    // The multi-dimensional half of the lakehouse OPTIMIZE story next to
    // q_compact_plan's bin packing: interleave the bits of two dimensions
    // (quantity, price-bucket) into a Z-value so range queries on EITHER
    // dimension touch few clusters. The interleave is 6 explicit
    // shift/mask terms per dimension — integer-exact in both engines —
    // and the report shows per-cluster dimension bounds (the locality a
    // Z-sort buys). Row-local compute + one k-group aggregate.
    "q_zorder" -> ((s, d) => {
      def interleave(x: Column, y: Column): Column =
        (0 until 6).map { i =>
          val xb = shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
          val yb = shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
          xb.bitwiseOR(yb)
        }.reduce(_ bitwiseOR _)
      Tables.lineitem(s, d)
        .withColumn("x", least(floor(col("l_quantity")).cast("long"), lit(63L)))
        .withColumn("y", least(floor(col("l_extendedprice") / lit(2000.0)).cast("long"), lit(63L)))
        .withColumn("z", interleave(col("x"), col("y")))
        .withColumn("z_cluster", expr("z div 64"))
        .groupBy("z_cluster")
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).as("min_qty"), max(col("x")).as("max_qty"),
          min(col("y")).as("min_pb"), max(col("y")).as("max_pb"))
        .orderBy("z_cluster")
    }),

    // ---- week-over-week change report (ORACLE) ----------------------------
    // The period-over-period BI shape: weekly revenue per status with the
    // previous week's value and percent change. Week key = epoch-day div 7
    // (date_trunc('week') differs on week-start conventions across
    // engines). The pct change is a single division of exact cents sums,
    // r2'd; first weeks emit NULL (lag null), never a 0-division. One
    // k-group aggregate + a tiny lag window over (status, week) rows.
    "q_week_over_week" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus").orderBy("wk")
      Tables.orders(s, d)
        .withColumn("wk", expr("datediff(to_date(o_orderdate), date'1970-01-01') div 7"))
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .groupBy("o_orderstatus", "wk")
        .agg(sum(col("cents")).as("rev_cents"), count(lit(1)).as("n_orders"))
        .withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
        .withColumn("wow_pct", r2((col("rev_cents") - col("prev_cents")).cast("double")
          * lit(100.0) / col("prev_cents").cast("double")))
        .select("o_orderstatus", "wk", "rev_cents", "n_orders", "wow_pct")
        .orderBy("o_orderstatus", "wk")
    }),

    // ---- schema-evolution union (ORACLE) ----------------------------------
    // Ingestion batches drift: an early batch lacks columns a later batch
    // has. unionByName(allowMissingColumns = true) aligns by NAME and
    // null-fills the gaps — positional unionAll would silently misalign.
    // Stand-in: an "old" projection without o_orderpriority unioned with
    // a "new" one that has it; per-priority counts with NULL for the old
    // batch. Pure map-side + one k-group agg.
    "q_union_evolve" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val old = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val neu = o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderpriority"))
      old.unionByName(neu, allowMissingColumns = true)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority").asc_nulls_first)
    }),

    // ---- longest same-event streaks (ORACLE) ------------------------------
    // Run-length encoding of per-user event sequences: the classic
    // gaps-and-islands double-window (change flag → running sum = run id)
    // then run lengths — "longest streak" analytics. Both windows and the
    // run-id aggregate share ONE user_id hash partition; the final
    // per-type rollup is k-group. All integers.
    "q_streaks" -> ((s, d) => {
      val wo = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(wo).isNull ||
            lag(col("event_type"), 1).over(wo) =!= col("event_type"), 1L).otherwise(0L))
        .withColumn("run_id", sum(col("chg")).over(
          wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "run_id", "event_type")
        .agg(count(lit(1)).as("run_len"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_runs"), max(col("run_len")).as("max_streak"),
          sum(col("run_len")).as("n_events"))
        .orderBy("event_type")
    }),

    // ---- exact 7-day rolling distinct users / WAU (ORACLE) --------------
    // The engagement metric every event pipeline reports: distinct users
    // over a 7-day window sliding daily. COUNT(DISTINCT) over a range
    // frame isn't a window aggregate either engine supports, so this is
    // the standard explode rewrite: each (user, active-day) pair — NOT
    // each raw event — fans out to the ≤7 window-ends it contributes to,
    // then one distinct + count per window. The first distinct collapses
    // the 100 TB event stream to (users × days) BEFORE the ×7 fan-out;
    // the approximate path at extreme scale is the mergeable-sketch
    // q_hll_merge next door — this is its exact counterpart.
    "q_sliding_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .select(col("user_id"),
          explode(expr("sequence(day, date_add(day, 6))")).as("w")).distinct()
        .groupBy("w").agg(count(lit(1)).as("wau"))
        .select(date_format(col("w"), "yyyy-MM-dd").as("window_end"), col("wau"))
        .orderBy("window_end")),

    // ---- weekly churn (ORACLE) -------------------------------------------
    // Users active in week w with NO activity in week w+1 — the retention
    // complement to q_cohort_retention's "who came back" view. Presence
    // is (user, week) DISTINCT (the 100 TB event stream collapses before
    // any join), next-week presence is a self left-join on the shifted
    // key, and the final week is excluded (its churn is unknowable). The
    // one-row max-week scalar broadcasts.
    "q_churn" -> ((s, d) => {
      val wk = Tables.events(s, d)
        .select(col("user_id"),
          floor(datediff(to_date(col("ts")), lit("2024-01-01")) / 7).cast("long").as("week"))
        .distinct()
      val maxw = wk.agg(max("week").as("mw"))
      val nxt = wk.select(col("user_id"), (col("week") - 1).as("week"), lit(1L).as("has_next"))
      wk.join(nxt, Seq("user_id", "week"), "left")
        .crossJoin(broadcast(maxw))
        .filter(col("week") < col("mw"))
        .groupBy("week")
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("has_next").isNull, 1L).otherwise(0L)).as("n_churned"),
          r2(sum(when(col("has_next").isNull, 1L).otherwise(0L)).cast("double") * lit(100.0)
            / count(lit(1)).cast("double")).as("churn_pct"))
        .orderBy("week")
    }),

    // ---- lag-1 autocorrelation of daily revenue (ORACLE) -----------------
    // Time-series health: does today's revenue predict tomorrow's? The
    // daily series is the corpus-scale aggregate (exact integer cents);
    // the lag pairing and Pearson moments then run over ~hundreds of
    // rows, so the unpartitioned day-order window is k-scale by
    // construction, not a corpus sort. Moments multiply and accumulate in
    // DECIMAL(38) ↔ HUGEINT (cents² ~ 1e24); one double chain + r3.
    "q_autocorr" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val w = Window.orderBy("day")
      val pairs = daily.withColumn("prev", lag(col("cents"), 1).over(w))
        .filter(col("prev").isNotNull)
      pairs.agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("prev").cast(dec)).cast("double").as("sx"),
        sum(col("cents").cast(dec)).cast("double").as("sy"),
        sum(col("prev").cast(dec) * col("cents").cast(dec)).cast("double").as("sxy"),
        sum(col("prev").cast(dec) * col("prev").cast(dec)).cast("double").as("sxx"),
        sum(col("cents").cast(dec) * col("cents").cast(dec)).cast("double").as("syy"))
        .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
        .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
        .withColumn("dy", col("n") * col("syy") - col("sy") * col("sy"))
        .select(col("n").cast("long").as("n_pairs"),
          r3(col("num") / (sqrt(col("dx")) * sqrt(col("dy")))).as("autocorr_lag1"))
    }),

    // ---- bitmap-rollup exact distinct (ORACLE) ---------------------------
    // Exact daily distinct users per event type via 64-bit bitmap words —
    // the roaring-style rollup: (key, word-index) partials carry one bit
    // per user, OR-merge associatively (mergeable like a sketch but
    // EXACT), and popcounts sum to the distinct count. This is how exact
    // distinct survives incremental/rollup pipelines at 100 TB, where a
    // COUNT(DISTINCT) result can't be re-aggregated but bitmap partials
    // can. All integer (bit_or words, bit_count popcounts) — bit-exact
    // in both engines. 32-bit words inside the BIGINT: bit 63 would be
    // a signed-overflow error in DuckDB's `<<`. Two hash aggregates, the
    // first keyed on (type, day, word) so hot keys shard across reducers.
    "q_bitmap_distinct" -> ((s, d) => {
      val words = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
        .withColumn("w", expr("user_id div 32"))
        .withColumn("b", expr("shiftleft(1L, cast(pmod(user_id, 32) as int))"))
        .groupBy("event_type", "day", "w")
        .agg(expr("bit_or(b)").as("bm"))
      words.groupBy("event_type", "day")
        .agg(sum(expr("bit_count(bm)")).cast("long").as("du"))
        .groupBy("event_type")
        .agg(sum(col("du")).as("user_days"), max(col("du")).as("max_daily"),
          count(lit(1)).as("n_days"))
        .orderBy("event_type")
    }),

    // ---- robust outliers via median/MAD (ORACLE) -------------------------
    // The robust companion to q_anomaly_mean's cross-multiplied mean
    // test: median absolute deviation ignores the heavy tail that drags
    // a mean. Everything stays integer: interpolated medians of integer
    // cents are half-integral, so DOUBLED medians (med2, mad4=4·MAD) are
    // exact BIGINTs, and |x−med| > 3·MAD cross-multiplies to
    // 2·d2 > 3·mad4 with d2 = |2·cents − med2|. Two per-group
    // sort-aggregates (the q_agg_percentile machinery, parity proven) +
    // two broadcast joins of k-row medians back onto the rows.
    "q_outliers_mad" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderstatus"), round(col("o_totalprice") * 100).cast("long").as("cents"))
      val med = o.groupBy("o_orderstatus")
        .agg((expr("percentile(cents, 0.5)") * 2).cast("long").as("med2"))
      val dev = o.join(broadcast(med), "o_orderstatus")
        .withColumn("d2", abs(col("cents") * 2 - col("med2")))
      val mad = dev.groupBy("o_orderstatus")
        .agg((expr("percentile(d2, 0.5)") * 2).cast("long").as("mad4"))
      dev.join(broadcast(mad), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          (first(col("med2")).cast("double") / lit(200.0)).as("med_usd"),
          (first(col("mad4")).cast("double") / lit(400.0)).as("mad_usd"),
          sum(when(col("d2") * 2 > col("mad4") * 3, 1L).otherwise(0L)).as("n_outliers"))
        .orderBy("o_orderstatus")
    }),

    // ---- Gini revenue concentration (ORACLE) -----------------------------
    // Inequality of order values per status via the exact rank formula
    // G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ), x ascending. The rank comes
    // from row_number over (cents, orderkey); permutations within a
    // cents tie can't change Σi·xᵢ (equal xᵢ), so the sums are
    // deterministic. Σi·xᵢ grows as n²·x̄ — past int64 around sf1 — so
    // it accumulates in DECIMAL(38) ↔ HUGEINT (no magnitude ceiling at
    // any deployment size, like the correlation moment sums), and
    // numerator/denominator are each computed exactly in decimal and
    // cast to double ONCE (identical nearest rounding) before the single
    // division + r3. One per-group window sort + one k-group aggregate —
    // the same shuffle family as the percentile queries.
    "q_gini" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus").orderBy(col("cents"), col("o_orderkey"))
      val dec = "decimal(38,0)"
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("i", row_number().over(w).cast("long"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s0"),
          sum((col("i") * col("cents")).cast(dec)).as("s1"))
        .withColumn("gini", r3(
          (col("s1") * 2 - (col("n") + 1).cast(dec) * col("s0").cast(dec)).cast("double")
            / (col("n").cast(dec) * col("s0").cast(dec)).cast("double")))
        .select(col("o_orderstatus"), col("n"), col("s0").as("sum_cents"), col("gini"))
        .orderBy("o_orderstatus")
    }),

    // ---- Pareto revenue concentration (ORACLE) ---------------------------
    // "How many customers cover 80% of revenue?" — the curation sibling of
    // q_gini. The global prefix sum over customers ordered by (cents desc,
    // custkey) is computed WITHOUT a single-partition window: customers are
    // bucketed by the decimal digit count of their cents (an exact integer
    // proxy for log10, no float log whose last ulp could flip a bucket at
    // an exact power), the running sum is windowed WITHIN each bucket in
    // parallel, and only the ≤19-row bucket-total table goes through a
    // global (k-row, driver-safe) window for the cross-bucket prefix.
    // digits(cents) orders identically to cents across buckets, so
    // prefix(bucket) + local cumsum IS the global cumsum. The 80% cut is
    // the cross-multiplied integer test (cum-before)*5 < total*4 — no
    // float share ever decides membership.
    "q_pareto" -> ((s, d) => {
      val cust = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .withColumn("dig", length(col("cents").cast("string")).cast("long"))
      val wIn = Window.partitionBy("dig").orderBy(col("cents").desc, col("o_custkey"))
      val local = cust
        .withColumn("lcum", sum(col("cents")).over(
          wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val wB = Window.orderBy(col("dig").desc) // ≤19 rows — driver-safe global window
      // grand totals ride the SAME k-row bucket table as the cross-bucket
      // prefix (full-frame window sums), so the scalar side needs no extra
      // corpus aggregation and no one-row cross join — one broadcast
      // equi-join on dig carries prefix AND totals to every row
      val prefix = cust.groupBy("dig")
        .agg(sum(col("cents")).as("bsum"), count(lit(1)).as("bn"))
        .withColumn("pcum", coalesce(sum(col("bsum")).over(
          wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("total", sum(col("bsum")).over(
          wB.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("n_cust", sum(col("bn")).over(
          wB.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select("dig", "pcum", "total", "n_cust")
      local.join(broadcast(prefix), "dig")
        .agg(
          max(col("n_cust")).as("n_customers"),
          max(col("total")).as("total_cents"),
          sum(when((col("pcum") + col("lcum") - col("cents")) * 5 < col("total") * 4, 1L)
            .otherwise(0L)).as("n_top80"))
        .withColumn("pct_top80",
          r2(col("n_top80").cast("double") * lit(100.0) / col("n_customers").cast("double")))
    }),

    // ---- trimmed mean (ORACLE) -------------------------------------------
    // Robust per-status order value: drop the bottom and top 5% of orders
    // by (cents, orderkey) rank and average the middle 90% — the
    // outlier-insensitive sibling of q_outliers_mad. Trim membership is
    // pure integer rank arithmetic (rn vs n div 20) on a deterministic
    // total order, so both engines cut at exactly the same rows. One
    // per-status window sort + two k-group aggregates; the raw mean rides
    // the same small join. Means are exact integer-cent sums divided once.
    "q_trimmed_mean" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderstatus"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val w = Window.partitionBy("o_orderstatus").orderBy(col("cents"), col("o_orderkey"))
      val raw = o.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_total"), sum(col("cents")).as("raw_cents"))
      val kept = o.withColumn("rn", row_number().over(w).cast("long"))
        .join(broadcast(raw.select(col("o_orderstatus"), col("n_total"))), "o_orderstatus")
        .filter(col("rn") > expr("n_total div 20") && col("rn") <= col("n_total") - expr("n_total div 20"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_kept"), sum(col("cents")).as("kept_cents"))
      raw.join(kept, "o_orderstatus")
        .select(col("o_orderstatus"), col("n_total"), col("n_kept"),
          r2(col("raw_cents").cast("double") / col("n_total").cast("double") / lit(100.0)).as("mean_raw"),
          r2(col("kept_cents").cast("double") / col("n_kept").cast("double") / lit(100.0)).as("mean_trimmed"))
        .orderBy("o_orderstatus")
    }),

    // ---- RFM customer segmentation (ORACLE) ------------------------------
    // The classic marketing cut: recency (days since last order), frequency
    // (order count), monetary (lifetime cents), each scored into quartiles
    // with ntile(4) — SQL-standard distribution (first n%4 tiles take the
    // extra row), identical in both engines given the same total order, so
    // every ORDER BY carries the custkey tiebreak. Quartiles are taken
    // WITHIN market segment: the window partitions by c_mktsegment (the
    // shuffle parallelizes across segments; at 10⁹ customers the same
    // scores come from 3 broadcast quantile thresholds instead — SURVEY
    // §7.5). Output is the segment×RFM-code census a campaign would pull.
    "q_rfm" -> ((s, d) => {
      val cust = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(max(col("o_orderdate")).as("lastd"), count(lit(1)).as("freq"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val maxd = Tables.orders(s, d).agg(max(col("o_orderdate")).as("maxd"))
      val seg = cust
        .join(Tables.customer(s, d).select(col("c_custkey").as("o_custkey"), col("c_mktsegment")), "o_custkey")
        .crossJoin(broadcast(maxd))
        .withColumn("rec_days", datediff(col("maxd").cast("date"), col("lastd").cast("date")).cast("long"))
      def q(w: org.apache.spark.sql.expressions.WindowSpec) = ntile(4).over(w).cast("long")
      val byRec = Window.partitionBy("c_mktsegment").orderBy(col("rec_days"), col("o_custkey"))
      val byFreq = Window.partitionBy("c_mktsegment").orderBy(col("freq").desc, col("o_custkey"))
      val byMon = Window.partitionBy("c_mktsegment").orderBy(col("cents").desc, col("o_custkey"))
      seg
        .withColumn("rfm_code", q(byRec) * 100 + q(byFreq) * 10 + q(byMon))
        .groupBy("c_mktsegment", "rfm_code")
        .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("sum_cents"))
        .orderBy("c_mktsegment", "rfm_code")
    }),

    // ---- Kolmogorov–Smirnov distribution drift (ORACLE) ------------------
    // The numeric-feature sibling of q_token_drift: KS distance between
    // two sources' doc-length distributions — max over the merged support
    // of |ECDF₀ − ECDF₁|. Distribution-shift detection for a numeric
    // column, the check a curation pipeline runs when a new crawl batch
    // looks "off". The census (one map-side-combinable groupBy on the
    // length value) is the corpus-scale stage; the ECDF cumsum window
    // runs over the DISTINCT VALUE table (bounded by the feature's
    // cardinality, ~300 lengths here, never corpus rows). The max and
    // its location are integer-decided: d_num = |cum0·n1 − cum1·n0| is
    // an exact BIGINT, tie on the smallest length; only the final
    // KS = d_num/(n0·n1) is floated, r3'd.
    "q_ecdf_ks" -> ((s, d) => {
      val base = Tables.documents(s, d).filter(col("source").isin("src0", "src1"))
        .select(col("n_chars"), when(col("source") === "src0", 1L).otherwise(0L).as("is0"))
      val cen = base.groupBy("n_chars")
        .agg(sum(col("is0")).as("c0"), (count(lit(1)) - sum(col("is0"))).as("c1"))
      val w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = cen.agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"))
      cen.withColumn("cum0", sum(col("c0")).over(w))
        .withColumn("cum1", sum(col("c1")).over(w))
        .crossJoin(broadcast(tot))
        .withColumn("d_num", abs(col("cum0") * col("n1") - col("cum1") * col("n0")))
        .orderBy(col("d_num").desc, col("n_chars"))
        .limit(1)
        .select(col("n_chars").as("at_len"), col("n0"), col("n1"), col("d_num"),
          r3(col("d_num").cast("double")
            / (col("n0") * col("n1")).cast("double")).as("ks"))
    }),

    // ---- decile gains/lift table (ORACLE) --------------------------------
    // The model-eval shape: rank customers by total spend WITHIN their
    // market segment, cut into deciles, report each decile's revenue
    // share and lift over the segment average. The ntile windows are
    // segment-partitioned (the global-gains variant would be a corpus
    // sort — q_histogram_eqd's censused deciles are the scale path for
    // that); ties broken by custkey, so both engines cut identically.
    // Lift cross-multiplies exact integers (dec_cents·seg_n vs
    // seg_cents·n_cust) in DECIMAL(38)↔HUGEINT before ONE division.
    "q_decile_lift" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val spend = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .join(Tables.customer(s, d)
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")), "o_custkey")
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("cents").desc, col("o_custkey"))
      val g = spend.withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy("c_mktsegment", "decile")
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("dec_cents"))
      val t = g.groupBy("c_mktsegment")
        .agg(sum(col("n_cust")).as("seg_n"), sum(col("dec_cents")).as("seg_cents"))
      g.join(broadcast(t), "c_mktsegment")
        .withColumn("rev_share",
          r3(col("dec_cents").cast("double") / col("seg_cents").cast("double")))
        .withColumn("lift",
          r3((col("dec_cents").cast(dec) * col("seg_n")).cast("double")
            / (col("seg_cents").cast(dec) * col("n_cust")).cast("double")))
        .select("c_mktsegment", "decile", "n_cust", "dec_cents", "rev_share", "lift")
        .orderBy("c_mktsegment", "decile")
    }),

    // ---- Theil-Sen robust regression (ORACLE) ----------------------------
    // The median-of-pairwise-slopes line through monthly revenue — the
    // robust alternative to q_corr_regr's least squares (one wild month
    // can't move it). Slopes live in integer MILLI-cents/month — both
    // Spark's `div` and DuckDB's integer `//` truncate toward zero
    // (measured: -879335883 from both, where a floor would give ...84),
    // so plain integral division is cross-engine exact even on the
    // negative slopes. Lower median with (slope, i, j) tiebreak;
    // intercept = median(y·1000 − slope·m).
    // Scale: the month census is k-bounded (≤ #months), so the pair
    // self-join (≤ months²) and both median windows run on bounded
    // intermediates — allowlisted with that argument; the corpus
    // touches one hash aggregate only.
    "q_theil_sen" -> ((s, d) => {
      val monthly = Tables.orders(s, d)
        .groupBy((((year(col("o_orderdate")) - 1992) * 12)
          + month(col("o_orderdate")) - 1).cast("long").as("m"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      val a = monthly.select(col("m").as("i"), col("y").as("yi"))
      val b = monthly.select(col("m").as("j"), col("y").as("yj"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val med = a.join(broadcast(b), col("i") < col("j"))
        .select(col("i"), col("j"),
          expr("((yj - yi) * 1000) div (j - i)").as("sl"))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("rn", row_number().over(Window.orderBy("sl", "i", "j")))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("sl").as("slope_milli"), col("n").as("n_pairs"))
      monthly.crossJoin(broadcast(med))
        .withColumn("c", col("y") * 1000L - col("slope_milli") * col("m"))
        .withColumn("k", count(lit(1)).over(wAll))
        .withColumn("rn", row_number().over(Window.orderBy("c", "m")))
        .filter(col("rn") === expr("(k + 1) div 2"))
        .select(col("k").as("n_months"), col("n_pairs"),
          col("slope_milli"), col("c").as("intercept_milli"))
    }),

    // ---- Kendall concordance (ORACLE) ------------------------------------
    // Do months with more orders also gross more revenue? Kendall's
    // tau counts CONCORDANT vs DISCORDANT month pairs — rank-based, so
    // one wild month can't move it (q_corr_spearman's sibling; tau is
    // the one with the direct probabilistic reading P(agree)−P(disagree)).
    // The tau-b denominator needs a sqrt, so the graded outputs stay on
    // the integer numerator side: C, D, ties on either axis, and the
    // net C−D. Same k-bounded month-census self-pairing as q_theil_sen
    // (≤ months², PlanSweep-allowlisted); the corpus touches one hash
    // aggregate.
    "q_kendall" -> ((s, d) => {
      val monthly = Tables.orders(s, d)
        .groupBy((((year(col("o_orderdate")) - 1992) * 12)
          + month(col("o_orderdate")) - 1).cast("long").as("m"))
        .agg(count(lit(1)).as("x"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      val a = monthly.select(col("m").as("i"), col("x").as("xi"), col("y").as("yi"))
      val b = monthly.select(col("m").as("j"), col("x").as("xj"), col("y").as("yj"))
      val sx = signum(col("xj") - col("xi")).cast("long")
      val sy = signum(col("yj") - col("yi")).cast("long")
      a.join(broadcast(b), col("i") < col("j"))
        .select(sx.as("sx"), sy.as("sy"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(when(col("sx") * col("sy") > 0, 1L).otherwise(0L)).as("concordant"),
          sum(when(col("sx") * col("sy") < 0, 1L).otherwise(0L)).as("discordant"),
          sum(when(col("sx") === 0 || col("sy") === 0, 1L).otherwise(0L)).as("tied"))
        .select(col("n_pairs"), col("concordant"), col("discordant"), col("tied"),
          (col("concordant") - col("discordant")).as("net"))
    }),

    // ---- Mann-Whitney U (rank-sum) statistic (ORACLE) --------------------
    // The NON-parametric two-sample test — what you reach for when
    // spend distributions are too skewed for q_ab_ttest's Welch t.
    // Finished (F) vs open (O) orders per market segment. Average tie
    // ranks are float-hostile ((rmin+rmax)/2), so everything is scaled
    // by 2: 2·avgrank = 2·rank() + |ties| − 1, exact BIGINT; the
    // reported statistic is 2·U_F = Σ(2·avgrank over F) − n_F(n_F+1).
    // Shape at 100 TB: one shuffle keyed by segment for the rank
    // window (the tie-count window shares the partitioning), then a
    // k-segment aggregate — the same skew posture as q_rfm's ntiles;
    // a production run over heavier segments range-shards the rank
    // via ShardedRank.
    "q_mann_whitney" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("F", "O"))
        .select(col("o_custkey"), col("o_orderstatus").as("st"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))
      val j = o.join(c, col("o_custkey") === col("c_custkey"))
        .select("seg", "st", "cents")
      val wr = Window.partitionBy("seg").orderBy("cents")
      val wt = Window.partitionBy("seg", "cents")
      val a = j
        .withColumn("r2", rank().over(wr).cast("long") * 2
          + count(lit(1)).over(wt) - 1)
        .groupBy("seg")
        .agg(sum(when(col("st") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("st") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("st") === "F", col("r2")).otherwise(0L)).as("s2"))
      a.select(col("seg"), col("n_f"), col("n_o"),
          (col("s2") - col("n_f") * (col("n_f") + 1)).as("u2_f"))
        .orderBy("seg")
    }),

    // ---- Welch two-sample t statistic (ORACLE) ---------------------------
    // The A/B-test readout: does cohort A (user_id even) spend per
    // purchase differently from cohort B? Welch's t from exact integer
    // moments — ONE conditional aggregate produces (n, Σc, Σc²) for both
    // cohorts (Σc² in DECIMAL(38) ↔ HUGEINT), then the t statistic is a
    // fixed single-op double chain (each mean/variance/`t` step is one
    // IEEE op on engine-identical inputs, the q_corr_regr discipline).
    // No shuffle beyond the one 2-partial aggregate; map-side combine
    // does the heavy lifting.
    "q_ab_ttest" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val p = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(pmod(col("user_id"), lit(2)).cast("long").as("grp"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      p.agg(
          sum(when(col("grp") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("grp") === 0, col("c")).otherwise(0L)).as("s0"),
          sum(when(col("grp") === 0, col("c").cast(dec) * col("c"))
            .otherwise(lit(0).cast(dec))).as("q0"),
          sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("grp") === 1, col("c")).otherwise(0L)).as("s1"),
          sum(when(col("grp") === 1, col("c").cast(dec) * col("c"))
            .otherwise(lit(0).cast(dec))).as("q1"))
        .withColumn("m0", col("s0").cast("double") / col("n0").cast("double"))
        .withColumn("m1", col("s1").cast("double") / col("n1").cast("double"))
        .withColumn("v0", (col("n0").cast(dec) * col("q0") - col("s0").cast(dec) * col("s0"))
          .cast("double") / (col("n0") * (col("n0") - lit(1L))).cast("double"))
        .withColumn("v1", (col("n1").cast(dec) * col("q1") - col("s1").cast(dec) * col("s1"))
          .cast("double") / (col("n1") * (col("n1") - lit(1L))).cast("double"))
        .withColumn("t_stat", r3((col("m0") - col("m1"))
          / sqrt(col("v0") / col("n0").cast("double") + col("v1") / col("n1").cast("double"))))
        .select(col("n0"), col("n1"),
          r2(col("m0") / lit(100.0)).as("mean0_usd"),
          r2(col("m1") / lit(100.0)).as("mean1_usd"),
          col("t_stat"))
    }),

    // ---- market-basket brand lift (ORACLE) -------------------------------
    // Association-rule mining: brand pairs bought together more often
    // than independence predicts. Pair generation is the order-keyed
    // self-join of the DISTINCT (order, brand) table — blowup bounded by
    // brands-per-order (≤ lines-per-order, ~7), never all-brands². The
    // c_ab ≥ 5 support floor kills noise pairs BEFORE the k-row count
    // joins. lift = N·c_ab/(c_a·c_b) as an integral micro-division of
    // exact BIGINTs, so the top-20 ranking and the displayed value are
    // engine-identical; take-ordered with a (b1, b2) tiebreak.
    "q_basket_lift" -> ((s, d) => {
      val ob = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand")).distinct()
      val tot = ob.agg(countDistinct(col("l_orderkey")).as("n_orders"))
      val ca = ob.groupBy("p_brand").agg(count(lit(1)).as("c"))
      val pairs = ob.select(col("l_orderkey"), col("p_brand").as("b1"))
        .join(ob.select(col("l_orderkey"), col("p_brand").as("b2")), Seq("l_orderkey"))
        .filter(col("b1") < col("b2"))
        .groupBy("b1", "b2").agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
      pairs
        .join(broadcast(ca.select(col("p_brand").as("b1"), col("c").as("c_a"))), "b1")
        .join(broadcast(ca.select(col("p_brand").as("b2"), col("c").as("c_b"))), "b2")
        .crossJoin(broadcast(tot))
        .withColumn("lift_micro", expr("c_ab * n_orders * 1000000 div (c_a * c_b)"))
        .orderBy(col("lift_micro").desc, col("b1"), col("b2"))
        .limit(20)
        .select(col("b1"), col("b2"), col("c_ab"), col("c_a"), col("c_b"),
          (col("lift_micro").cast("double") / lit(1000000.0)).as("lift"))
    }),

    // ---- Benford first-digit audit (ORACLE) ------------------------------
    // The fraud/data-quality screen: natural money amounts follow
    // P(d) = log10(1 + 1/d); a synthetic or truncated feed doesn't. The
    // observed share is an integral micro-division of exact counts; the
    // Benford expectation is ln(1+1/d)/ln(10) — ln is the one
    // transcendental both engines agree on bit-for-bit (§7.3) — snapped
    // to the same micro grid, so the deviation column is an exact
    // integer. One map-side digit extraction (leading digit via the
    // decimal string — no log10 on data) + a 9-row aggregate.
    "q_benford" -> ((s, d) => {
      val digits = Tables.orders(s, d)
        .select(round(col("o_totalprice") * 100).cast("long").as("c"))
        .filter(col("c") > 0)
        .withColumn("digit", substring(col("c").cast("string"), 1, 1).cast("long"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum(col("n")).as("nn"))
      digits.crossJoin(broadcast(tot))
        .withColumn("share_micro", expr("n * 1000000 div nn"))
        .withColumn("benford_micro",
          floor(log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0))
            * lit(1000000.0) + lit(0.5)).cast("long"))
        .withColumn("dev_micro", abs(col("share_micro") - col("benford_micro")))
        .select(col("digit"), col("n"),
          (col("share_micro").cast("double") / lit(1000000.0)).as("share"),
          (col("benford_micro").cast("double") / lit(1000000.0)).as("benford_p"),
          col("dev_micro"))
        .orderBy("digit")
    }),
    // ---- sample-ratio-mismatch chi-square (ORACLE) ----------------------
    // The experimentation-health check next to q_ab_ttest: signups split
    // by user parity should be ~50/50; the chi-square statistic against
    // that expectation flags broken assignment (the classic SRM guard).
    // Counts are exact integers; chi2 is three deterministic double ops.
    "q_ab_srm" -> ((s, d) => {
      Tables.events(s, d).filter(col("event_type") === "signup")
        .groupBy().agg(
          sum(when(pmod(col("user_id"), lit(2)) === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(pmod(col("user_id"), lit(2)) === 1, 1L).otherwise(0L)).as("n_b"))
        .withColumn("chi2", r3(
          (col("n_a") - col("n_b")).cast("double") * (col("n_a") - col("n_b")).cast("double")
            / (col("n_a") + col("n_b")).cast("double")))
        .withColumn("srm", (col("chi2") > lit(3.841)).cast("boolean"))
        .select("n_a", "n_b", "chi2", "srm")
    }),

    // ---- calendar spine with zero-fill (ORACLE) -------------------------
    // The generator-driven date dimension: sequence() emits every day in
    // the order-date span (a Generate node — no table needed), left join
    // brings in per-day order stats, and missing days surface as
    // explicit zero rows — the gap-visible daily series a forecasting
    // job consumes. The spine is ~#days rows (k-bounded); the daily
    // aggregate is the only corpus-scale pass.
    "q_date_spine" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("day", to_date(col("o_orderdate")))
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      val daily = o.groupBy("day").agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
      val spine = o.groupBy().agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY"))).as("day"))
      spine.join(daily, Seq("day"), "left")
        .select(fmtDate(col("day")).as("day"),
          coalesce(col("n"), lit(0L)).as("n_orders"),
          coalesce(col("c"), lit(0L)).as("cents"))
        .orderBy("day")
    }),

    // ---- winsorized mean (ORACLE) ---------------------------------------
    // The robust-mean complement to q_trimmed_mean: instead of DROPPING
    // the tails, CLAMP them to the p05/p95 discrete quantiles — keeps n
    // constant, which matters when the mean feeds a downstream rate.
    // Quantiles by the explicit cume_dist definition (smallest value
    // with cume >= p, stated identically in both engines rather than
    // trusting quantile-function flavors to agree); all arithmetic in
    // exact integer cents until the single r2 division.
    "q_winsorized_mean" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority").orderBy(col("cents"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val base = Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .withColumn("cume", count(lit(1)).over(w).cast("double")
          / count(lit(1)).over(Window.partitionBy("o_orderpriority")).cast("double"))
      val bounds = base.groupBy("o_orderpriority").agg(
        min(when(col("cume") >= 0.05, col("cents"))).as("lo"),
        min(when(col("cume") >= 0.95, col("cents"))).as("hi"))
      base.join(bounds, "o_orderpriority")
        .withColumn("wc", least(greatest(col("cents"), col("lo")), col("hi")))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          r2(sum(col("wc")).cast("double") / count(lit(1)) / lit(100.0)).as("winsor_mean"))
        .orderBy("o_orderpriority")
    }),
    // ---- classical seasonal decomposition (ORACLE) ----------------------
    // Daily revenue = trend + day-of-week seasonal + residual: a 7-day
    // centered moving average (trend), the mean of the detrended series
    // per weekday (seasonal), and what's left (residual). One
    // corpus-scale daily aggregate; every window after it runs on the
    // ~#days census (k-bounded — PlanSweep-allowlisted). All terms are
    // floor-divisions of exact integer sums < 2^53, identical in both
    // engines.
    "q_seasonal_decompose" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .withColumn("day", to_date(col("o_orderdate")))
        .groupBy("day")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      val w7 = Window.orderBy("day").rowsBetween(-3, 3)
      val det = daily
        .withColumn("trend_c",
          floor(sum(col("c")).over(w7).cast("double") / count(lit(1)).over(w7)).cast("long"))
        .withColumn("det_c", col("c") - col("trend_c"))
        .withColumn("dow", pmod(unix_date(col("day")) + lit(3), lit(7)).cast("long"))
      val seas = det.groupBy("dow")
        .agg(floor(sum(col("det_c")).cast("double") / count(lit(1))).cast("long").as("seas_c"))
      det.join(broadcast(seas), "dow")
        .select(fmtDate(col("day")).as("day"), col("c"), col("trend_c"),
          col("seas_c"), (col("det_c") - col("seas_c")).as("resid_c"))
        .orderBy("day")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_snapshot_diff" ->
      ("WITH v1 AS (SELECT doc_id, md5(text) AS h1, CAST(length(text) AS BIGINT) AS len1 " +
        "FROM documents WHERE doc_id % 10 <> 0), " +
        "v2 AS (SELECT doc_id, md5(t2) AS h2, CAST(length(t2) AS BIGINT) AS len2 FROM " +
        "(SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS t2 " +
        "FROM documents WHERE doc_id % 7 <> 0) s), " +
        "f AS (SELECT CASE WHEN h1 IS NULL THEN 'added' WHEN h2 IS NULL THEN 'removed' " +
        "WHEN h1 = h2 THEN 'unchanged' ELSE 'changed' END AS status, coalesce(len2, len1) AS len " +
        "FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id) " +
        "SELECT status, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(len) AS BIGINT) AS n_chars " +
        "FROM f GROUP BY 1 ORDER BY status"),
    "q_churn" ->
      ("WITH wk AS (SELECT DISTINCT user_id, " +
        "CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week FROM events), " +
        "mw AS (SELECT max(week) AS mw FROM wk), " +
        "j AS (SELECT w.user_id, w.week, CASE WHEN n.user_id IS NULL THEN 1 ELSE 0 END AS churned " +
        "FROM wk w LEFT JOIN wk n ON n.user_id = w.user_id AND n.week = w.week + 1, mw WHERE w.week < mw.mw) " +
        "SELECT week, count(*) AS n_active, CAST(sum(churned) AS BIGINT) AS n_churned, " +
        "floor((CAST(sum(churned) AS DOUBLE) * 100.0 / CAST(count(*) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS churn_pct " +
        "FROM j GROUP BY week ORDER BY week"),
    "q_autocorr" ->
      ("WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents FROM events GROUP BY 1), " +
        "p AS (SELECT cents, lag(cents) OVER (ORDER BY day) AS prev FROM daily), " +
        "q AS (SELECT prev, cents FROM p WHERE prev IS NOT NULL), " +
        "m AS (SELECT CAST(count(*) AS DOUBLE) AS n, " +
        "CAST(sum(CAST(prev AS HUGEINT)) AS DOUBLE) AS sx, CAST(sum(CAST(cents AS HUGEINT)) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(prev AS HUGEINT) * CAST(cents AS HUGEINT)) AS DOUBLE) AS sxy, " +
        "CAST(sum(CAST(prev AS HUGEINT) * CAST(prev AS HUGEINT)) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS DOUBLE) AS syy FROM q) " +
        "SELECT CAST(n AS BIGINT) AS n_pairs, " +
        "floor((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) * 1000.0 + 0.5) / 1000.0 AS autocorr_lag1 " +
        "FROM m"),
    "q_bitmap_distinct" ->
      ("WITH w AS (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id // 32 AS w, " +
        "bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INTEGER)) AS bm " +
        "FROM events GROUP BY 1, 2, 3), " +
        "d AS (SELECT event_type, day, CAST(sum(bit_count(bm)) AS BIGINT) AS du FROM w GROUP BY 1, 2) " +
        "SELECT event_type, CAST(sum(du) AS BIGINT) AS user_days, max(du) AS max_daily, " +
        "count(*) AS n_days FROM d GROUP BY event_type ORDER BY event_type"),
    "q_outliers_mad" ->
      ("WITH o AS (SELECT o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "m AS (SELECT o_orderstatus, CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) AS med2 FROM o GROUP BY 1), " +
        "d AS (SELECT o.o_orderstatus, cents, abs(2 * cents - med2) AS d2, med2 FROM o JOIN m USING (o_orderstatus)), " +
        "a AS (SELECT o_orderstatus, CAST(quantile_cont(d2, 0.5) * 2 AS BIGINT) AS mad4 FROM d GROUP BY 1) " +
        "SELECT d.o_orderstatus, count(*) AS n, " +
        "CAST(any_value(d.med2) AS DOUBLE) / 200.0 AS med_usd, " +
        "CAST(any_value(a.mad4) AS DOUBLE) / 400.0 AS mad_usd, " +
        "CAST(sum(CASE WHEN 2 * d.d2 > 3 * a.mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers " +
        "FROM d JOIN a USING (o_orderstatus) GROUP BY 1 ORDER BY 1"),
    "q_gini" ->
      ("WITH o AS (SELECT o_orderstatus, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "r AS (SELECT o_orderstatus, cents, CAST(row_number() OVER (PARTITION BY o_orderstatus " +
        "ORDER BY cents, o_orderkey) AS BIGINT) AS i FROM o), " +
        "g AS (SELECT o_orderstatus, count(*) AS n, CAST(sum(cents) AS BIGINT) AS s0, " +
        "sum(CAST(i AS HUGEINT) * cents) AS s1 FROM r GROUP BY 1) " +
        "SELECT o_orderstatus, n, s0 AS sum_cents, " +
        "floor((CAST(2 * s1 - CAST(n + 1 AS HUGEINT) * s0 AS DOUBLE) / " +
        "CAST(CAST(n AS HUGEINT) * s0 AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS gini " +
        "FROM g ORDER BY o_orderstatus"),
    "q_pareto" ->
      ("WITH c AS (SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM orders GROUP BY 1), " +
        "t AS (SELECT CAST(sum(cents) AS BIGINT) AS total, count(*) AS n_customers FROM c), " +
        "w AS (SELECT cents, CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM c) " +
        "SELECT t.n_customers, t.total AS total_cents, " +
        "CAST(sum(CASE WHEN (cum - cents) * 5 < total * 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_top80, " +
        "floor((CAST(sum(CASE WHEN (cum - cents) * 5 < total * 4 THEN 1 ELSE 0 END) AS DOUBLE) * 100.0 " +
        "/ CAST(t.n_customers AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS pct_top80 " +
        "FROM w, t GROUP BY t.n_customers, t.total"),
    "q_trimmed_mean" ->
      ("WITH o AS (SELECT o_orderstatus, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "raw AS (SELECT o_orderstatus, count(*) AS n_total, CAST(sum(cents) AS BIGINT) AS raw_cents FROM o GROUP BY 1), " +
        "r AS (SELECT o_orderstatus, cents, CAST(row_number() OVER (PARTITION BY o_orderstatus " +
        "ORDER BY cents, o_orderkey) AS BIGINT) AS rn FROM o), " +
        "kept AS (SELECT r.o_orderstatus, count(*) AS n_kept, CAST(sum(cents) AS BIGINT) AS kept_cents " +
        "FROM r JOIN raw USING (o_orderstatus) " +
        "WHERE rn > n_total // 20 AND rn <= n_total - n_total // 20 GROUP BY 1) " +
        "SELECT o_orderstatus, n_total, n_kept, " +
        "floor((CAST(raw_cents AS DOUBLE) / CAST(n_total AS DOUBLE) / 100.0) * 100.0 + 0.5) / 100.0 AS mean_raw, " +
        "floor((CAST(kept_cents AS DOUBLE) / CAST(n_kept AS DOUBLE) / 100.0) * 100.0 + 0.5) / 100.0 AS mean_trimmed " +
        "FROM raw JOIN kept USING (o_orderstatus) ORDER BY o_orderstatus"),
    "q_rfm" ->
      ("WITH c AS (SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS lastd, count(*) AS freq, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents FROM orders GROUP BY 1), " +
        "mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders), " +
        "s AS (SELECT c.*, c_mktsegment, CAST(date_diff('day', lastd, maxd) AS BIGINT) AS rec_days " +
        "FROM c JOIN customer ON c_custkey = o_custkey, mx), " +
        "t AS (SELECT c_mktsegment, cents, " +
        "CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY rec_days, o_custkey) AS BIGINT) * 100 + " +
        "CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY freq DESC, o_custkey) AS BIGINT) * 10 + " +
        "CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY cents DESC, o_custkey) AS BIGINT) AS rfm_code " +
        "FROM s) " +
        "SELECT c_mktsegment, rfm_code, count(*) AS n_customers, CAST(sum(cents) AS BIGINT) AS sum_cents " +
        "FROM t GROUP BY 1, 2 ORDER BY c_mktsegment, rfm_code"),
    "q_kendall" ->
      ("WITH mth AS (SELECT ((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1) AS m, " +
        "count(*) AS x, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y FROM orders GROUP BY 1), " +
        "p AS (SELECT CAST(sign(b.x - a.x) AS BIGINT) AS sx, CAST(sign(b.y - a.y) AS BIGINT) AS sy " +
        "FROM mth a JOIN mth b ON a.m < b.m) " +
        "SELECT count(*) AS n_pairs, " +
        "CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant, " +
        "CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant, " +
        "CAST(sum(CASE WHEN sx = 0 OR sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tied, " +
        "CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) - sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS net " +
        "FROM p"),
    "q_theil_sen" ->
      ("WITH mth AS (SELECT ((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1) AS m, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y FROM orders GROUP BY 1), " +
        "p AS (SELECT a.m AS i, b.m AS j, ((b.y - a.y) * 1000) // (b.m - a.m) AS sl FROM mth a JOIN mth b ON a.m < b.m), " +
        "ps AS (SELECT i, j, sl, count(*) OVER () AS n, row_number() OVER (ORDER BY sl, i, j) AS rn FROM p), " +
        "med AS (SELECT CAST(sl AS BIGINT) AS slope_milli, CAST(n AS BIGINT) AS n_pairs FROM ps WHERE rn = (n + 1) // 2), " +
        "ic AS (SELECT m, y * 1000 - (SELECT slope_milli FROM med) * m AS c FROM mth), " +
        "ics AS (SELECT c, m, count(*) OVER () AS k, row_number() OVER (ORDER BY c, m) AS rn FROM ic) " +
        "SELECT CAST(k AS BIGINT) AS n_months, (SELECT n_pairs FROM med) AS n_pairs, " +
        "(SELECT slope_milli FROM med) AS slope_milli, CAST(c AS BIGINT) AS intercept_milli " +
        "FROM ics WHERE rn = (k + 1) // 2"),
    "q_mann_whitney" ->
      ("WITH j AS (SELECT c_mktsegment AS seg, o_orderstatus AS st, CAST(round(o_totalprice * 100) AS BIGINT) AS cents " +
        "FROM orders JOIN customer ON o_custkey = c_custkey WHERE o_orderstatus IN ('F', 'O')), " +
        "r AS (SELECT seg, st, 2 * rank() OVER (PARTITION BY seg ORDER BY cents) + count(*) OVER (PARTITION BY seg, cents) - 1 AS r2 FROM j), " +
        "a AS (SELECT seg, CAST(sum(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f, " +
        "CAST(sum(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o, " +
        "CAST(sum(CASE WHEN st = 'F' THEN r2 ELSE 0 END) AS BIGINT) AS s2 FROM r GROUP BY seg) " +
        "SELECT seg, n_f, n_o, CAST(s2 - n_f * (n_f + 1) AS BIGINT) AS u2_f FROM a ORDER BY seg"),
    "q_changepoint" ->
      ("WITH daily AS (SELECT o_orderdate AS d, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x FROM orders GROUP BY 1), " +
        "w AS (SELECT d, CAST(sum(x) OVER (ORDER BY d) AS BIGINT) AS cum, " +
        "CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS idx, " +
        "CAST(sum(x) OVER () AS BIGINT) AS tot, count(*) OVER () AS n FROM daily) " +
        "SELECT d AS cp_date, CAST(abs(n * cum - idx * tot) AS BIGINT) AS s_abs, n AS n_days " +
        "FROM w ORDER BY abs(n * cum - idx * tot) DESC, d LIMIT 1"),
    "q_anomaly_mean" ->
      ("WITH c AS (SELECT user_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events), " +
        "w AS (SELECT event_type, cents, count(cents) OVER (PARTITION BY user_id) AS n_u, " +
        "sum(cents) OVER (PARTITION BY user_id) AS s_u FROM c) " +
        "SELECT event_type, count(*) AS n_events, " +
        "CAST(sum(CASE WHEN cents * n_u > s_u * 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_anom, " +
        "CAST(sum(CASE WHEN cents * n_u > s_u * 2 THEN cents ELSE 0 END) AS BIGINT) AS anom_cents " +
        "FROM w GROUP BY event_type ORDER BY event_type"),
    "q_skyline" ->
      ("WITH c AS (SELECT o_orderstatus, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents, " +
        "CAST(o_orderdate AS TIMESTAMP) AS dt FROM orders), " +
        "m AS (SELECT *, max(dt) OVER (PARTITION BY o_orderstatus ORDER BY cents DESC " +
        "RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_gt, " +
        "max(dt) OVER (PARTITION BY o_orderstatus ORDER BY cents DESC " +
        "RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS m_eq FROM c) " +
        "SELECT o_orderstatus, o_orderkey, cents, strftime(dt, '%Y-%m-%d %H:%M:%S') AS odate " +
        "FROM m WHERE (m_gt IS NULL OR dt > m_gt) AND dt = m_eq " +
        "ORDER BY o_orderstatus, o_orderkey"),
    "q_entropy" ->
      ("WITH e AS (SELECT doc_id, lang, unnest(" + oToks + ") AS tok FROM documents), " +
        "c AS (SELECT doc_id, lang, tok, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2, 3), " +
        "w AS (SELECT doc_id, lang, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM c), " +
        "t AS (SELECT doc_id, lang, CAST(floor((-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))) * " +
        "ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT) AS term_nano FROM w), " +
        "dd AS (SELECT doc_id, lang, CAST(sum(term_nano) AS BIGINT) AS ent_nano FROM t GROUP BY 1, 2) " +
        "SELECT lang, ent_nano // 500000000 AS bucket, count(*) AS n_docs, " +
        "CAST(sum(ent_nano) AS BIGINT) AS sum_ent_nano " +
        "FROM dd GROUP BY 1, 2 ORDER BY lang, bucket"),
    "q_quality_gate" ->
      ("WITH t AS (SELECT lang, " + oToks + " AS t FROM documents), " +
        "m AS (SELECT lang, CAST(len(t) AS BIGINT) AS n_tok, " +
        "CAST(len(array_to_string(t, '')) AS BIGINT) AS sum_len, " +
        "CAST(len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS BIGINT) AS n_stop, " +
        "CASE WHEN len(t) >= 3 THEN list_transform(generate_series(1, len(t) - 2), " +
        "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) ELSE [array_to_string(t, ' ')] END AS g FROM t), " +
        "r AS (SELECT lang, (n_tok BETWEEN 20 AND 200) AS r_len, " +
        "(sum_len >= n_tok * 3 AND sum_len <= n_tok * 10) AS r_word, (n_stop >= 2) AS r_stop, " +
        "((CAST(len(g) AS BIGINT) - CAST(len(list_distinct(g)) AS BIGINT)) * 10 < CAST(len(g) AS BIGINT) * 3) AS r_rep FROM m) " +
        "SELECT lang, count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN r_len THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok, " +
        "CAST(sum(CASE WHEN r_word THEN 1 ELSE 0 END) AS BIGINT) AS n_word_ok, " +
        "CAST(sum(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_stop_ok, " +
        "CAST(sum(CASE WHEN r_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_ok, " +
        "CAST(sum(CASE WHEN r_len AND r_word AND r_stop AND r_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_pass " +
        "FROM r GROUP BY lang ORDER BY lang"),
    "q_compact_plan" ->
      ("WITH c AS (SELECT o_orderstatus, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "w AS (SELECT o_orderstatus, cents, sum(cents) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM c), " +
        "b AS (SELECT o_orderstatus, (cum - 1) // 1000000000 AS bin, count(*) AS n_files, " +
        "CAST(sum(cents) AS BIGINT) AS bin_cents FROM w GROUP BY 1, 2) " +
        "SELECT o_orderstatus, count(*) AS n_bins, CAST(sum(n_files) AS BIGINT) AS n_files, " +
        "max(bin_cents) AS max_bin_cents, " +
        "floor(CAST(sum(bin_cents) AS DOUBLE) / count(*) * 100.0 + 0.5) / 100.0 AS avg_bin_cents " +
        "FROM b GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "q_pmi_cooccur" ->
      ("WITH t AS (SELECT doc_id, list_sort(list_distinct(" + oToks + ")) AS td FROM documents), " +
        "tt AS (SELECT doc_id, td FROM t WHERE len(td) > 0), " +
        "e AS (SELECT doc_id, unnest(td) AS tok FROM tt), " +
        "dfr AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM e GROUP BY tok), " +
        "p AS (SELECT a.tok AS t1, b.tok AS t2, CAST(count(*) AS BIGINT) AS n_co " +
        "FROM e a JOIN e b ON a.doc_id = b.doc_id AND a.tok < b.tok GROUP BY 1, 2), " +
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM tt) " +
        "SELECT t1, t2, n_co, floor(ln(CAST(n_co * nd AS DOUBLE) / CAST(d1.df * d2.df AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS pmi " +
        "FROM p JOIN dfr d1 ON p.t1 = d1.tok JOIN dfr d2 ON p.t2 = d2.tok CROSS JOIN nn " +
        "ORDER BY n_co DESC, t1, t2 LIMIT 15"),
    "q_token_drift" ->
      ("WITH s AS (SELECT CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a, " +
        "CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b FROM documents), " +
        "e AS (SELECT doc_id, unnest(list_distinct(" + oToks + ")) AS tok FROM documents), " +
        "f AS (SELECT tok, CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_a, " +
        "CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS df_b FROM e GROUP BY tok) " +
        "SELECT tok, df_a, df_b, abs(df_a * n_b - df_b * n_a) AS drift, " +
        "floor((CAST(df_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(df_b AS DOUBLE) / CAST(n_b AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS rate_diff " +
        "FROM f CROSS JOIN s ORDER BY drift DESC, tok LIMIT 20"),
    "q_listagg" ->
      ("SELECT o_orderpriority, string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses, " +
        "CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses, count(*) AS n_orders " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_mode" ->
      ("WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1, 2), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, source) AS rn FROM c) " +
        "SELECT lang, source AS mode_source, n FROM r WHERE rn = 1 ORDER BY lang"),
    "q_corr_regr" ->
      ("WITH b AS (SELECT l_returnflag, CAST(round(l_quantity * 100) AS BIGINT) AS x, " +
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS y FROM lineitem), " +
        "m AS (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n, " +
        "CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx, CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(x * y AS HUGEINT)) AS DOUBLE) AS sxy, " +
        "CAST(sum(CAST(x * x AS HUGEINT)) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(y * y AS HUGEINT)) AS DOUBLE) AS syy FROM b GROUP BY l_returnflag), " +
        "f AS (SELECT l_returnflag, n * sxy - sx * sy AS num, n * sxx - sx * sx AS dx, " +
        "n * syy - sy * sy AS dy, sx, sy, n FROM m) " +
        "SELECT l_returnflag, floor(num / (sqrt(dx) * sqrt(dy)) * 1000.0 + 0.5) / 1000.0 AS corr_xy, " +
        "floor(num / dx * 1000.0 + 0.5) / 1000.0 AS slope, " +
        "floor((sy - (num / dx) * sx) / n / 100.0 * 100.0 + 0.5) / 100.0 AS icept_usd " +
        "FROM f ORDER BY l_returnflag"),
    "q_corr_spearman" ->
      ("WITH b AS (SELECT o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT) AS x, " +
        "CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS y, o_orderkey FROM orders), " +
        "r AS (SELECT o_orderstatus, " +
        "CAST(row_number() OVER (PARTITION BY o_orderstatus ORDER BY x, o_orderkey) AS BIGINT) AS rx, " +
        "CAST(row_number() OVER (PARTITION BY o_orderstatus ORDER BY y, o_orderkey) AS BIGINT) AS ry FROM b), " +
        "m AS (SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST((rx - ry) * (rx - ry) AS HUGEINT)) AS DOUBLE) AS sd2 FROM r GROUP BY 1), " +
        "f AS (SELECT o_orderstatus, n, CAST(n AS DOUBLE) AS nd, sd2 FROM m) " +
        "SELECT o_orderstatus, n, " +
        "floor((1.0 - 6.0 * sd2 / (nd * nd * nd - nd)) * 1000.0 + 0.5) / 1000.0 AS rho " +
        "FROM f ORDER BY o_orderstatus"),
    "q_argmax_group" ->
      ("WITH c AS (SELECT c_nationkey, c_custkey, " +
        "CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer), " +
        "o AS (SELECT c_nationkey, c_custkey, cents, " +
        "cents * 1000000000 + c_custkey AS ord FROM c), " +
        "g AS (SELECT c_nationkey, arg_max(c_custkey, ord) AS top_cust, " +
        "max(cents) AS top_bal_cents, arg_min(c_custkey, ord) AS bottom_cust, " +
        "min(cents) AS bottom_bal_cents, CAST(count(*) AS BIGINT) AS n_cust FROM o GROUP BY 1) " +
        "SELECT n_name, top_cust, top_bal_cents, bottom_cust, bottom_bal_cents, n_cust " +
        "FROM g JOIN nation ON n_nationkey = c_nationkey ORDER BY n_name"),
    "q_weighted_median" ->
      ("WITH b AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS v, " +
        "CAST(round(l_quantity * 100) AS BIGINT) AS wgt FROM lineitem), " +
        "w AS (SELECT l_returnflag, v, sum(wgt) OVER (PARTITION BY l_returnflag ORDER BY v " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
        "sum(wgt) OVER (PARTITION BY l_returnflag) AS tot FROM b) " +
        "SELECT l_returnflag, min(v) AS wmedian_cents, CAST(max(tot) AS BIGINT) AS total_weight " +
        "FROM w WHERE cum * 2 >= tot GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_having_global" ->
      ("WITH c AS (SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM c), " +
        "g AS (SELECT o_orderpriority, CAST(sum(cents) AS BIGINT) AS sum_cents FROM c GROUP BY 1) " +
        "SELECT o_orderpriority, sum_cents, " +
        "floor(CAST(sum_cents AS DOUBLE) * 100.0 / CAST(tot AS DOUBLE) * 100.0 + 0.5) / 100.0 AS share_pct " +
        "FROM g CROSS JOIN t WHERE sum_cents * 20 > tot ORDER BY o_orderpriority"),
    "q_decimal_exact" ->
      ("SELECT o_orderstatus, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_usd, " +
        "CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_usd, CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_usd, " +
        "count(*) AS n_orders FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "q_funnel_window" ->
      ("WITH fc AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS c0 FROM events WHERE event_type = 'click' GROUP BY user_id), " +
        "p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts FROM events WHERE event_type = 'purchase'), " +
        "u AS (SELECT fc.user_id, fc.c0, min(CASE WHEN p.pts >= fc.c0 AND p.pts <= fc.c0 + INTERVAL 7 DAY THEN p.pts END) AS p0 " +
        "FROM fc LEFT JOIN p ON fc.user_id = p.user_id GROUP BY fc.user_id, fc.c0), " +
        "w AS (SELECT date_diff('day', DATE '1970-01-01', CAST(c0 AS DATE)) % 7 AS wd, p0, " +
        "epoch_us(p0) - epoch_us(c0) AS dt_us FROM u) " +
        "SELECT CAST(wd AS BIGINT) AS wd, count(*) AS n_clicked, CAST(count(p0) AS BIGINT) AS n_conv, " +
        "floor(CAST(count(p0) AS DOUBLE) * 100.0 / CAST(count(*) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS conv_pct, " +
        "floor(CAST(sum(dt_us) AS DOUBLE) / CAST(count(p0) AS DOUBLE) / 3600000000.0 * 100.0 + 0.5) / 100.0 AS avg_hours " +
        "FROM w GROUP BY 1 ORDER BY wd"),
    "q_null_audit" ->
      ("WITH m AS (SELECT count(*) AS n_rows, " +
        "CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey, " +
        "CAST(count(DISTINCT o_custkey) AS BIGINT) AS dist_custkey, " +
        "CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_status, " +
        "CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS dist_status, " +
        "CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_priority, " +
        "CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS dist_priority FROM orders) " +
        "SELECT col_name, n_rows, n_nulls, n_distinct FROM (" +
        "SELECT 'o_custkey' AS col_name, n_rows, null_custkey AS n_nulls, dist_custkey AS n_distinct FROM m " +
        "UNION ALL SELECT 'o_orderpriority', n_rows, null_priority, dist_priority FROM m " +
        "UNION ALL SELECT 'o_orderstatus', n_rows, null_status, dist_status FROM m) " +
        "ORDER BY col_name"),
    "q_event_path" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events), " +
        "s AS (SELECT user_id, event_type, lead(event_type, 1) OVER w AS e2, lead(event_type, 2) OVER w AS e3 " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)) " +
        "SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n_occurrences, " +
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users " +
        "FROM s WHERE e3 IS NOT NULL GROUP BY 1 ORDER BY n_occurrences DESC, path LIMIT 15"),
    "q_dwell_time" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events), " +
        "s AS (SELECT event_type AS cur_type, lag(event_type, 1) OVER w AS prev_type, " +
        "epoch_us(t) - lag(epoch_us(t), 1) OVER w AS gap_us " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)) " +
        "SELECT prev_type, cur_type, count(*) AS n_gaps, CAST(sum(gap_us) AS BIGINT) AS sum_gap_us, " +
        "CAST(max(gap_us) AS BIGINT) AS max_gap_us, " +
        "floor(CAST(sum(gap_us) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0 * 100.0 + 0.5) / 100.0 AS avg_gap_sec " +
        "FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2 ORDER BY prev_type, cur_type"),
    "q_histogram_eqd" ->
      ("WITH c AS (SELECT o_orderpriority, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "n AS (SELECT o_orderpriority, cents, CAST(ntile(10) OVER (PARTITION BY o_orderpriority ORDER BY cents, o_orderkey) AS BIGINT) AS decile FROM c) " +
        "SELECT o_orderpriority, decile, count(*) AS n, min(cents) AS lo_cents, max(cents) AS hi_cents " +
        "FROM n GROUP BY 1, 2 ORDER BY o_orderpriority, decile"),
    "q_sample_join" ->
      ("WITH s AS (SELECT c_custkey FROM customer WHERE md5(CAST(c_custkey AS VARCHAR)) < '1a') " +
        "SELECT o_orderstatus, count(*) AS n_orders, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents " +
        "FROM orders JOIN s ON o_custkey = c_custkey GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "q_zorder" ->
      ("WITH b AS (SELECT least(CAST(floor(l_quantity) AS BIGINT), 63) AS x, " +
        "least(CAST(floor(l_extendedprice / 2000.0) AS BIGINT), 63) AS y FROM lineitem), " +
        "z AS (SELECT x, y, " +
        "(((x >> 0) & 1) << 0) | (((y >> 0) & 1) << 1) | (((x >> 1) & 1) << 2) | (((y >> 1) & 1) << 3) | " +
        "(((x >> 2) & 1) << 4) | (((y >> 2) & 1) << 5) | (((x >> 3) & 1) << 6) | (((y >> 3) & 1) << 7) | " +
        "(((x >> 4) & 1) << 8) | (((y >> 4) & 1) << 9) | (((x >> 5) & 1) << 10) | (((y >> 5) & 1) << 11) AS zv FROM b) " +
        "SELECT zv // 64 AS z_cluster, count(*) AS n_rows, min(x) AS min_qty, max(x) AS max_qty, " +
        "min(y) AS min_pb, max(y) AS max_pb FROM z GROUP BY 1 ORDER BY z_cluster"),
    "q_week_over_week" ->
      ("WITH c AS (SELECT o_orderstatus, date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) // 7 AS wk, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "g AS (SELECT o_orderstatus, CAST(wk AS BIGINT) AS wk, CAST(sum(cents) AS BIGINT) AS rev_cents, " +
        "count(*) AS n_orders FROM c GROUP BY 1, 2), " +
        "l AS (SELECT *, lag(rev_cents, 1) OVER (PARTITION BY o_orderstatus ORDER BY wk) AS prev_cents FROM g) " +
        "SELECT o_orderstatus, wk, rev_cents, n_orders, " +
        "floor(CAST(rev_cents - prev_cents AS DOUBLE) * 100.0 / CAST(prev_cents AS DOUBLE) * 100.0 + 0.5) / 100.0 AS wow_pct " +
        "FROM l ORDER BY o_orderstatus, wk"),
    "q_union_evolve" ->
      ("WITH u AS (SELECT o_orderkey, o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT) AS cents, " +
        "CAST(NULL AS VARCHAR) AS o_orderpriority FROM orders WHERE o_orderkey % 2 = 0 " +
        "UNION ALL SELECT o_orderkey, o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT), o_orderpriority " +
        "FROM orders WHERE o_orderkey % 2 = 1) " +
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents " +
        "FROM u GROUP BY 1, 2 ORDER BY o_orderstatus, o_orderpriority NULLS FIRST"),
    "q_streaks" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events), " +
        "c AS (SELECT user_id, event_type, CASE WHEN lag(event_type, 1) OVER w IS NULL " +
        "OR lag(event_type, 1) OVER w <> event_type THEN 1 ELSE 0 END AS chg, t, event_id " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), " +
        "r AS (SELECT user_id, event_type, sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id FROM c), " +
        "g AS (SELECT user_id, run_id, event_type, CAST(count(*) AS BIGINT) AS run_len FROM r GROUP BY 1, 2, 3) " +
        "SELECT event_type, count(*) AS n_runs, max(run_len) AS max_streak, " +
        "CAST(sum(run_len) AS BIGINT) AS n_events FROM g GROUP BY event_type ORDER BY event_type"),
    "q_sliding_distinct" ->
      ("WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "uw AS (SELECT DISTINCT user_id, unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS w FROM ud) " +
        "SELECT strftime(CAST(w AS DATE), '%Y-%m-%d') AS window_end, count(*) AS wau " +
        "FROM uw GROUP BY 1 ORDER BY window_end"),
    // cross-multiplied ECDF distance: d_num exact BIGINT, one r3'd ratio
    "q_ecdf_ks" ->
      ("WITH b AS (SELECT n_chars, CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is0 " +
        "FROM documents WHERE source IN ('src0', 'src1')), " +
        "c AS (SELECT n_chars, CAST(sum(is0) AS BIGINT) AS c0, " +
        "CAST(count(*) - sum(is0) AS BIGINT) AS c1 FROM b GROUP BY 1), " +
        "t AS (SELECT CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1 FROM c), " +
        "w AS (SELECT n_chars, " +
        "CAST(sum(c0) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum0, " +
        "CAST(sum(c1) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1 FROM c), " +
        "j AS (SELECT n_chars, abs(cum0 * n1 - cum1 * n0) AS d_num, n0, n1 FROM w, t) " +
        "SELECT n_chars AS at_len, n0, n1, d_num, " +
        "floor(CAST(d_num AS DOUBLE) / CAST(n0 * n1 AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS ks " +
        "FROM j ORDER BY d_num DESC, n_chars LIMIT 1"),
    // segment-partitioned ntile cuts; lift cross-multiplied in HUGEINT
    "q_decile_lift" ->
      ("WITH sp AS (SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM orders GROUP BY 1), " +
        "j AS (SELECT sp.o_custkey, sp.cents, c.c_mktsegment FROM sp " +
        "JOIN customer c ON c.c_custkey = sp.o_custkey), " +
        "n AS (SELECT c_mktsegment, CAST(ntile(10) OVER " +
        "(PARTITION BY c_mktsegment ORDER BY cents DESC, o_custkey) AS BIGINT) AS decile, cents FROM j), " +
        "g AS (SELECT c_mktsegment, decile, count(*) AS n_cust, CAST(sum(cents) AS BIGINT) AS dec_cents " +
        "FROM n GROUP BY 1, 2), " +
        "t AS (SELECT c_mktsegment, CAST(sum(n_cust) AS BIGINT) AS seg_n, " +
        "CAST(sum(dec_cents) AS BIGINT) AS seg_cents FROM g GROUP BY 1) " +
        "SELECT g.c_mktsegment, g.decile, g.n_cust, g.dec_cents, " +
        "floor(CAST(dec_cents AS DOUBLE) / CAST(seg_cents AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS rev_share, " +
        "floor(CAST(CAST(dec_cents AS HUGEINT) * seg_n AS DOUBLE) " +
        "/ CAST(CAST(seg_cents AS HUGEINT) * n_cust AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS lift " +
        "FROM g JOIN t ON g.c_mktsegment = t.c_mktsegment " +
        "ORDER BY g.c_mktsegment, decile"),
    // identical single-op IEEE chain from exact integer moments
    "q_ab_ttest" ->
      ("WITH p AS (SELECT user_id % 2 AS grp, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c " +
        "FROM events WHERE event_type = 'purchase'), " +
        "a AS (SELECT " +
        "CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0, " +
        "CAST(sum(CASE WHEN grp = 0 THEN c ELSE 0 END) AS BIGINT) AS s0, " +
        "sum(CASE WHEN grp = 0 THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS q0, " +
        "CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1, " +
        "CAST(sum(CASE WHEN grp = 1 THEN c ELSE 0 END) AS BIGINT) AS s1, " +
        "sum(CASE WHEN grp = 1 THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS q1 FROM p), " +
        "m AS (SELECT n0, n1, " +
        "CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0, " +
        "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1, " +
        "CAST(CAST(n0 AS HUGEINT) * q0 - CAST(s0 AS HUGEINT) * s0 AS DOUBLE) / CAST(n0 * (n0 - 1) AS DOUBLE) AS v0, " +
        "CAST(CAST(n1 AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE) / CAST(n1 * (n1 - 1) AS DOUBLE) AS v1 FROM a) " +
        "SELECT n0, n1, " +
        "floor(m0 / 100.0 * 100.0 + 0.5) / 100.0 AS mean0_usd, " +
        "floor(m1 / 100.0 * 100.0 + 0.5) / 100.0 AS mean1_usd, " +
        "floor((m0 - m1) / sqrt(v0 / CAST(n0 AS DOUBLE) + v1 / CAST(n1 AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS t_stat " +
        "FROM m"),
    // order-keyed pair join; lift as HUGEINT integral micro-division
    "q_basket_lift" ->
      ("WITH ob AS (SELECT DISTINCT l_orderkey, p_brand FROM lineitem " +
        "JOIN part ON l_partkey = p_partkey), " +
        "t AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM ob), " +
        "ca AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS c FROM ob GROUP BY 1), " +
        "p AS (SELECT a.p_brand AS b1, b.p_brand AS b2, CAST(count(*) AS BIGINT) AS c_ab " +
        "FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand " +
        "GROUP BY 1, 2 HAVING count(*) >= 5), " +
        "j AS (SELECT b1, b2, c_ab, x.c AS c_a, y.c AS c_b, n_orders, " +
        "CAST(CAST(c_ab AS HUGEINT) * n_orders * 1000000 // (CAST(x.c AS HUGEINT) * y.c) AS BIGINT) AS lift_micro " +
        "FROM p JOIN ca x ON p.b1 = x.p_brand JOIN ca y ON p.b2 = y.p_brand, t) " +
        "SELECT b1, b2, c_ab, c_a, c_b, CAST(lift_micro AS DOUBLE) / 1000000.0 AS lift " +
        "FROM j ORDER BY lift_micro DESC, b1, b2 LIMIT 20"),
    // decimal-string leading digit (no log10 on data); ln-chain Benford
    // expectation on the shared micro grid
    "q_benford" ->
      ("WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders " +
        "WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0), " +
        "g AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit, " +
        "CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1), " +
        "t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM g), " +
        "x AS (SELECT digit, n, n * 1000000 // nn AS share_micro, " +
        "CAST(floor(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) * 1000000.0 + 0.5) AS BIGINT) AS benford_micro " +
        "FROM g, t) " +
        "SELECT digit, n, CAST(share_micro AS DOUBLE) / 1000000.0 AS share, " +
        "CAST(benford_micro AS DOUBLE) / 1000000.0 AS benford_p, " +
        "abs(share_micro - benford_micro) AS dev_micro " +
        "FROM x ORDER BY digit"),
    "q_ab_srm" ->
      ("SELECT n_a, n_b, chi2, chi2 > 3.841 AS srm FROM (" +
        "SELECT n_a, n_b, floor(CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS chi2 FROM (" +
        "SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a, " +
        "CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b " +
        "FROM events WHERE event_type = 'signup') t) u"),
    "q_date_spine" ->
      ("WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "daily AS (SELECT day, count(*) AS n, CAST(sum(cents) AS BIGINT) AS c FROM o GROUP BY day), " +
        "spine AS (SELECT unnest(generate_series(min_d, max_d, INTERVAL 1 DAY)) AS day " +
        "FROM (SELECT min(day) AS min_d, max(day) AS max_d FROM o) b) " +
        "SELECT strftime(CAST(s.day AS DATE), '%Y-%m-%d') AS day, coalesce(d.n, 0) AS n_orders, coalesce(d.c, 0) AS cents " +
        "FROM spine s LEFT JOIN daily d ON CAST(s.day AS DATE) = d.day ORDER BY day"),
    "q_winsorized_mean" ->
      ("WITH base AS (SELECT o_orderpriority, cents, " +
        "CAST(count(*) OVER (PARTITION BY o_orderpriority ORDER BY cents RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) " +
        "/ CAST(count(*) OVER (PARTITION BY o_orderpriority) AS DOUBLE) AS cume " +
        "FROM (SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders) t), " +
        "bounds AS (SELECT o_orderpriority, min(CASE WHEN cume >= 0.05 THEN cents END) AS lo, " +
        "min(CASE WHEN cume >= 0.95 THEN cents END) AS hi FROM base GROUP BY o_orderpriority) " +
        "SELECT b.o_orderpriority, count(*) AS n, " +
        "floor(CAST(sum(least(greatest(b.cents, x.lo), x.hi)) AS DOUBLE) / count(*) / 100.0 * 100.0 + 0.5) / 100.0 AS winsor_mean " +
        "FROM base b JOIN bounds x ON b.o_orderpriority = x.o_orderpriority " +
        "GROUP BY b.o_orderpriority ORDER BY b.o_orderpriority"),
    "q_seasonal_decompose" ->
      ("WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c " +
        "FROM orders GROUP BY 1), " +
        "det AS (SELECT day, c, " +
        "CAST(floor(CAST(sum(c) OVER w7 AS DOUBLE) / count(*) OVER w7) AS BIGINT) AS trend_c, " +
        "((date_diff('day', DATE '1970-01-01', day) + 3) % 7 + 7) % 7 AS dow " +
        "FROM daily WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), " +
        "det2 AS (SELECT day, c, trend_c, c - trend_c AS det_c, dow FROM det), " +
        "seas AS (SELECT dow, CAST(floor(CAST(sum(det_c) AS DOUBLE) / count(*)) AS BIGINT) AS seas_c FROM det2 GROUP BY dow) " +
        "SELECT strftime(day, '%Y-%m-%d') AS day, c, trend_c, seas_c, det_c - seas_c AS resid_c " +
        "FROM det2 JOIN seas USING (dow) ORDER BY day"),
  )
}
