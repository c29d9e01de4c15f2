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
  )

  def oracleSql: Map[String, String] = Map(
    "q_k_anon" ->
      ("WITH qi AS (SELECT c_mktsegment, c_nationkey, CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band, count(*) AS k " +
        "FROM customer GROUP BY c_mktsegment, c_nationkey, bal_band) " +
        "SELECT c_mktsegment, count(*) AS n_groups, " +
        "sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS n_singletons, " +
        "sum(k) AS n_rows, sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS rows_small_k, " +
        "floor(CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS DOUBLE) / CAST(sum(k) AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS suppress_rate " +
        "FROM qi GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "q_mask_join" ->
      ("WITH mc AS (SELECT md5('pepper:' || CAST(c_custkey AS VARCHAR)) AS c_token, c_mktsegment FROM customer), " +
        "mo AS (SELECT md5('pepper:' || CAST(o_custkey AS VARCHAR)) AS o_token, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c FROM orders), " +
        "audit AS (SELECT count(DISTINCT c_custkey) AS n_keys, count(DISTINCT md5('pepper:' || CAST(c_custkey AS VARCHAR))) AS n_tokens FROM customer) " +
        "SELECT c_mktsegment, count(*) AS n_orders, sum(price_c) AS cents, " +
        "(SELECT n_tokens = n_keys FROM audit) AS collision_free " +
        "FROM mo JOIN mc ON o_token = c_token GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "q_target_encode" ->
      ("WITH ct AS (SELECT c_mktsegment, c_nationkey, coalesce(t, 0) AS t FROM customer " +
        "LEFT JOIN (SELECT o_custkey, max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS t " +
        "FROM orders GROUP BY o_custkey) u ON c_custkey = o_custkey), " +
        "cat AS (SELECT c_mktsegment, c_nationkey, count(*) AS n, sum(t) AS hits FROM ct GROUP BY c_mktsegment, c_nationkey), " +
        "gl AS (SELECT count(*) AS gn, sum(t) AS ghits FROM ct) " +
        "SELECT c_mktsegment, c_nationkey, n, hits, " +
        "floor((CAST(hits AS DOUBLE) + 10.0 * (CAST(ghits AS DOUBLE) / CAST(gn AS DOUBLE))) / CAST(n + 10 AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS enc " +
        "FROM cat CROSS JOIN gl ORDER BY c_mktsegment, c_nationkey"),
  )
}
