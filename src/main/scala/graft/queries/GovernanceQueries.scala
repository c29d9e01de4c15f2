package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-governance operators (SURVEY §2.17): the privacy / compliance
  * face of a training-data pipeline — re-identification risk audits,
  * referential-integrity-preserving pseudonymization, and leakage-safe
  * categorical encoding. All embarrassingly parallel or single-shuffle;
  * every rate is a final single division of exact integers.
  */
object GovernanceQueries extends QueryGroup {

  def queries: Map[String, QFn] = Map(

    // ---- k-anonymity audit (ORACLE) -------------------------------------
    // Re-identification risk census over the quasi-identifier triple
    // (segment, nation, account-balance kilo-band): per segment, how many
    // QI groups exist, how many are singletons (k = 1, directly
    // re-identifying), and what share of ROWS sits in small (k < 5)
    // groups — the share that would need suppression/generalization for
    // 5-anonymity. Two aggregates (QI census → segment rollup); the
    // first shuffles on the QI key, the second is k-bounded.
    "q_k_anon" -> ((s, d) => {
      val qi = Tables.customer(s, d)
        .withColumn("bal_band", floor(col("c_acctbal") / 1000.0).cast("long"))
        .groupBy("c_mktsegment", "c_nationkey", "bal_band")
        .agg(count(lit(1)).as("k"))
      qi.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("k") === 1, 1L).otherwise(0L)).as("n_singletons"),
          sum(col("k")).as("n_rows"),
          sum(when(col("k") < 5, col("k")).otherwise(0L)).as("rows_small_k"))
        .withColumn("suppress_rate",
          r3(col("rows_small_k").cast("double") / col("n_rows").cast("double")))
        .orderBy("c_mktsegment")
    }),

    // ---- pseudonymized join (ORACLE) ------------------------------------
    // Deterministic peppered-hash pseudonymization that PRESERVES
    // referential integrity: the same md5('pepper:' || custkey) token is
    // derived independently on the customer and orders sides, and the
    // masked join must reproduce exactly the clear-key join's per-segment
    // order counts and revenue — plus a collision audit (distinct tokens
    // must equal distinct keys, or two customers merged). This is the
    // share-data-without-keys contract: at 100 TB the token derivation is
    // a row-local projection (no extra shuffle vs the clear join).
    "q_mask_join" -> ((s, d) => {
      val mc = Tables.customer(s, d)
        .select(md5(concat(lit("pepper:"), col("c_custkey"))).as("c_token"),
          col("c_mktsegment"))
      val mo = Tables.orders(s, d)
        .select(md5(concat(lit("pepper:"), col("o_custkey"))).as("o_token"),
          round(col("o_totalprice") * 100).cast("long").as("price_c"))
      val joined = mo.join(mc, col("o_token") === col("c_token"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("cents"))
      val audit = Tables.customer(s, d)
        .agg(countDistinct(col("c_custkey")).as("n_keys"),
          countDistinct(md5(concat(lit("pepper:"), col("c_custkey")))).as("n_tokens"))
      joined.crossJoin(broadcast(audit))
        .select(col("c_mktsegment"), col("n_orders"), col("cents"),
          (col("n_tokens") === col("n_keys")).as("collision_free"))
        .orderBy("c_mktsegment")
    }),

    // ---- smoothed target encoding (ORACLE) ------------------------------
    // Leakage-aware categorical encoding for ML feature prep: per
    // (segment, nation) category, the urgent-order rate shrunk toward
    // the global prior with strength m = 10:
    //   enc = (hits + m·prior) / (n + m),  prior = global_hits / global_n.
    // hits/n are exact integers from one shuffle; the prior is a one-row
    // broadcast; the encode is a fixed 4-op IEEE chain on exact integer
    // inputs (identical bit-for-bit in any engine), then r3'd. Categories
    // with few rows collapse to the prior — the cold-start contract.
    "q_target_encode" -> ((s, d) => {
      val urgent = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(max(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("t"))
      val ct = Tables.customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left")
        .withColumn("t", coalesce(col("t"), lit(0L)))
      val cat = ct.groupBy("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("n"), sum(col("t")).as("hits"))
      val glob = ct.agg(count(lit(1)).as("gn"), sum(col("t")).as("ghits"))
      cat.crossJoin(broadcast(glob))
        .withColumn("enc", r3(
          (col("hits").cast("double")
            + lit(10.0) * (col("ghits").cast("double") / col("gn").cast("double")))
            / (col("n") + lit(10L)).cast("double")))
        .select(col("c_mktsegment"), col("c_nationkey"), col("n"), col("hits"), col("enc"))
        .orderBy("c_mktsegment", "c_nationkey")
    }),

    // ---- group-mean missing-value imputation (ORACLE) -------------------
    // The fill-before-training classic: values go missing (synthesized
    // deterministically — first md5 byte of "orderkey-linenumber" ≡ 0
    // mod 10 nulls ~10% of quantities; md5-on-string is the PORTABLE
    // content hash both engines share, the q_split_hash discipline —
    // xxhash64 seeds differ cross-engine), and each hole is imputed
    // with its GROUP's mean of the present values. All integer: the
    // imputed value is one floor division of exact centi-sums, so the
    // post-imputation mass census is bit-exact at any parallelism. One
    // pass for group stats (map-side combinable); at scale the k-row
    // stat table broadcasts back over the facts with no second shuffle.
    "q_impute_group" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .withColumn("qty_raw", floor(col("l_quantity")).cast("long"))
        .withColumn("missing",
          conv(substring(md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"))), 1, 2),
            16, 10).cast("long") % 10 === 0L)
      val stats = li.groupBy("l_returnflag")
        .agg(sum(when(!col("missing"), col("qty_raw") * 100)).as("present_centi"),
          sum(when(!col("missing"), 1L).otherwise(0L)).as("n_present"),
          sum(when(col("missing"), 1L).otherwise(0L)).as("n_missing"))
        .withColumn("imputed_centi",
          expr("present_centi div n_present"))
      stats.select(col("l_returnflag"), col("n_present"), col("n_missing"),
          col("imputed_centi"),
          (col("present_centi") + col("n_missing") * col("imputed_centi"))
            .as("total_centi"))
        .orderBy("l_returnflag")
    }),

    // ---- per-group min-max feature scaling (ORACLE) ---------------------
    // The [0, 1] normalization step before distance-based models, per
    // market segment, entirely in integers: scaled ppm =
    // (x − min)·10⁶ div (max − min) on exact account-balance cents.
    // Two passes at most: a k-row min/max aggregate broadcast back over
    // the table (never a window over the corpus); the census proves the
    // scaling maps min → 0 and max → 10⁶ exactly.
    "q_feature_scale" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .withColumn("cents", round(col("c_acctbal") * 100).cast("long"))
      val mm = c.groupBy("c_mktsegment")
        .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      c.join(broadcast(mm), "c_mktsegment")
        // nullif guards the degenerate single-valued segment: both
        // engines then agree on NULL ppm instead of Spark-null vs
        // DuckDB division-by-zero error
        .withColumn("ppm", expr("(cents - lo) * 1000000 div nullif(hi - lo, 0)"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), min(col("lo")).as("min_cents"),
          max(col("hi")).as("max_cents"),
          min(col("ppm")).as("min_ppm"), max(col("ppm")).as("max_ppm"),
          expr("sum(ppm) div count(1)").as("avg_ppm"))
        .orderBy("c_mktsegment")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_impute_group" ->
      ("WITH li AS (SELECT l_returnflag, CAST(floor(l_quantity) AS BIGINT) AS q, " +
        "(CAST(('0x' || substr(md5(l_orderkey || '-' || l_linenumber), 1, 2)) AS BIGINT) % 10 = 0) AS missing FROM lineitem), " +
        "st AS (SELECT l_returnflag, CAST(sum(CASE WHEN NOT missing THEN q * 100 END) AS BIGINT) AS present_centi, " +
        "CAST(sum(CASE WHEN NOT missing THEN 1 ELSE 0 END) AS BIGINT) AS n_present, " +
        "CAST(sum(CASE WHEN missing THEN 1 ELSE 0 END) AS BIGINT) AS n_missing FROM li GROUP BY 1) " +
        "SELECT l_returnflag, n_present, n_missing, present_centi // n_present AS imputed_centi, " +
        "present_centi + n_missing * (present_centi // n_present) AS total_centi " +
        "FROM st ORDER BY l_returnflag"),
    "q_feature_scale" ->
      ("WITH c AS (SELECT c_mktsegment, CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer), " +
        "mm AS (SELECT c_mktsegment, min(cents) AS lo, max(cents) AS hi FROM c GROUP BY 1), " +
        "sc AS (SELECT c.c_mktsegment AS seg, cents, lo, hi, (cents - lo) * 1000000 // nullif(hi - lo, 0) AS ppm " +
        "FROM c JOIN mm ON c.c_mktsegment = mm.c_mktsegment) " +
        "SELECT seg AS c_mktsegment, count(*) AS n, min(lo) AS min_cents, max(hi) AS max_cents, " +
        "min(ppm) AS min_ppm, max(ppm) AS max_ppm, CAST(sum(ppm) // count(*) AS BIGINT) AS avg_ppm " +
        "FROM sc GROUP BY seg ORDER BY c_mktsegment"),
    "q_k_anon" ->
      ("WITH qi AS (SELECT c_mktsegment, c_nationkey, CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band, count(*) AS k " +
        "FROM customer GROUP BY c_mktsegment, c_nationkey, bal_band) " +
        "SELECT c_mktsegment, count(*) AS n_groups, " +
        "CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons, " +
        "CAST(sum(k) AS BIGINT) AS n_rows, CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS rows_small_k, " +
        "floor(CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS DOUBLE) / CAST(sum(k) AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS suppress_rate " +
        "FROM qi GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "q_mask_join" ->
      ("WITH mc AS (SELECT md5('pepper:' || CAST(c_custkey AS VARCHAR)) AS c_token, c_mktsegment FROM customer), " +
        "mo AS (SELECT md5('pepper:' || CAST(o_custkey AS VARCHAR)) AS o_token, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c FROM orders), " +
        "audit AS (SELECT count(DISTINCT c_custkey) AS n_keys, count(DISTINCT md5('pepper:' || CAST(c_custkey AS VARCHAR))) AS n_tokens FROM customer) " +
        "SELECT c_mktsegment, count(*) AS n_orders, CAST(sum(price_c) AS BIGINT) AS cents, " +
        "(SELECT n_tokens = n_keys FROM audit) AS collision_free " +
        "FROM mo JOIN mc ON o_token = c_token GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "q_target_encode" ->
      ("WITH ct AS (SELECT c_mktsegment, c_nationkey, coalesce(t, 0) AS t FROM customer " +
        "LEFT JOIN (SELECT o_custkey, max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS t " +
        "FROM orders GROUP BY o_custkey) u ON c_custkey = o_custkey), " +
        "cat AS (SELECT c_mktsegment, c_nationkey, count(*) AS n, CAST(sum(t) AS BIGINT) AS hits FROM ct GROUP BY c_mktsegment, c_nationkey), " +
        "gl AS (SELECT count(*) AS gn, sum(t) AS ghits FROM ct) " +
        "SELECT c_mktsegment, c_nationkey, n, hits, " +
        "floor((CAST(hits AS DOUBLE) + 10.0 * (CAST(ghits AS DOUBLE) / CAST(gn AS DOUBLE))) / CAST(n + 10 AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS enc " +
        "FROM cat CROSS JOIN gl ORDER BY c_mktsegment, c_nationkey"),
  )
}
