package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The remaining classic TPC-H query shapes (SURVEY §2.16), completing
  * 22/22 coverage of the TPC-H topology family across the suite (Q1, Q3,
  * Q6–Q8, Q10, Q11, Q15, Q18, Q21, Q22 live in their semantic groups —
  * see SURVEY §2's per-query index).
  *
  * The corpus has no `partsupp` table and no comment/shipmode/date-pair
  * columns, so the shapes that need them are re-grounded on what the
  * corpus does carry (stated per query): the SUPPLY relation is derived
  * as the distinct (l_partkey, l_suppkey) pairs actually traded, with
  * min line price in cents as the supply cost; "late" is a ship lag
  * against o_orderdate rather than commit/receipt dates. The join
  * topology, subquery structure and aggregate shape of each original
  * query are preserved — that is what these grade.
  *
  * Money discipline (SURVEY §7.3): all revenue/cost arithmetic is exact
  * integer cents / ten-thousandths (price_c × (100 − disc_c)); floats
  * appear only in final r2/r3-rounded projections, and every knife-edge
  * comparison (Q17's 0.2·avg, Q20's half-share) is cross-multiplied so
  * no float ratio ever decides a row.
  */
object TpchQueries extends QueryGroup {

  /** exact line revenue in integer ten-thousandths: cents × (100−disc%) */
  private def revTk = round(col("l_extendedprice") * 100).cast("long") *
    (lit(100L) - round(col("l_discount") * 100).cast("long"))

  /** derived supply relation: the (part, supplier) pairs actually traded,
    * costed at the minimum observed line price in cents (the corpus has
    * no partsupp table; this is the deterministic stand-in). */
  private def supply(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(round(col("l_extendedprice") * 100).cast("long")).as("cost_c"))

  def queries: Map[String, QFn] = Map(

    // ---- TPC-H Q2 shape: minimum-cost supplier (ORACLE) -----------------
    // For each size-15 part, the EUROPE supplier(s) at the per-part
    // minimum supply cost. Plan: the derived supply aggregate is the only
    // corpus-scale pass (one shuffle on (part, supp)); the filtered part
    // dim, the region-pruned supplier dim and the per-part min (k rows,
    // one per surviving part) are all broadcast — at 100 TB the min-join
    // stays a broadcast because its cardinality is bounded by the part
    // filter, not the fact table.
    "q_min_cost_supp" -> ((s, d) => {
      val eurNat = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")
          .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val eurSupp = Tables.supplier(s, d)
        .join(broadcast(eurNat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          round(col("s_acctbal") * 100).cast("long").as("acct_c"))
      val p = Tables.part(s, d).filter(col("p_size") === 15)
        .select("p_partkey", "p_name")
      val costed = supply(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"))
      val minc = costed.groupBy(col("p_partkey").as("mp"))
        .agg(min(col("cost_c")).as("min_c"))
      costed.join(broadcast(minc),
          col("p_partkey") === col("mp") && col("cost_c") === col("min_c"))
        .select(r2(col("acct_c").cast("double") / lit(100.0)).as("s_acctbal"),
          col("s_name"), col("n_name"), col("p_partkey"), col("p_name"),
          r2(col("cost_c").cast("double") / lit(100.0)).as("supply_cost"),
          col("acct_c"), col("s_suppkey"))
        .orderBy(col("acct_c").desc, col("p_partkey"), col("s_suppkey"))
        .limit(20)
        .drop("acct_c", "s_suppkey")
    }),

    // ---- TPC-H Q4 shape: order-priority checking (ORACLE) ---------------
    // Orders placed in 1997Q3 where at least one line shipped more than
    // 60 days after the order date (the corpus's "late" — it has no
    // commit/receipt dates), counted per priority. The EXISTS is a left
    // semi join with the lag predicate INSIDE the join condition — one
    // pass over each side, no correlated per-row subquery, and the date
    // filter reaches the orders scan.
    "q_late_exists" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      o.join(l, col("o_orderkey") === col("l_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // ---- TPC-H Q5 shape: local-supplier volume (ORACLE) -----------------
    // 1997 revenue per ASIA nation counting only LOCAL trade — lines
    // whose customer and supplier sit in the same nation. The two fact
    // edges shuffle on their keys (lineitem⋈orders on orderkey,
    // orders⋈customer on custkey); the supplier dim is broadcast with the
    // locality predicate (s_nationkey = c_nationkey) riding the join
    // condition; region→nation is a broadcast prune on the customer side.
    "q_local_volume" -> ((s, d) => {
      val asiaNat = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")
          .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val c = Tables.customer(s, d)
        .join(broadcast(asiaNat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), revTk.as("rev_tk"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey")
          && col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(sum(col("rev_tk")).as("rev_tk"), count(lit(1)).as("n_lines"))
        .select(col("n_name"),
          r2(col("rev_tk").cast("double") / lit(10000.0)).as("revenue"),
          col("n_lines"), col("rev_tk"))
        .orderBy(col("rev_tk").desc, col("n_name"))
        .drop("rev_tk")
    }),

    // ---- TPC-H Q9 shape: product-type profit (ORACLE) -------------------
    // Profit on 'red' parts per supplier nation per order year. Profit is
    // exact integer ten-thousandths end-to-end: line revenue
    // price_c·(100−disc_c) minus cost retail_c·qty_c (cents × quantity
    // hundredths — the derived per-unit cost, the corpus having no
    // ps_supplycost). Part filter and supplier⋈nation are broadcast; the
    // only corpus-scale shuffle is lineitem⋈orders for the year.
    "q_product_profit" -> ((s, d) => {
      val p = Tables.part(s, d).filter(col("p_name").contains("red"))
        .select(col("p_partkey"), round(col("p_retailprice") * 100).cast("long").as("retail_c"))
      val sn = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          revTk.as("rev_tk"), round(col("l_quantity") * 100).cast("long").as("qty_c"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("n_name", "o_year")
        .agg(sum(col("rev_tk") - col("retail_c") * col("qty_c")).as("profit_tk"),
          count(lit(1)).as("n_lines"))
        .select(col("n_name"), col("o_year"),
          r2(col("profit_tk").cast("double") / lit(10000.0)).as("profit"),
          col("n_lines"))
        .orderBy(col("n_name"), col("o_year").desc)
    }),

    // ---- TPC-H Q12 shape: ship-lag priority audit (ORACLE) --------------
    // Lines shipped in 1997 bucketed by ship lag against the order date
    // (the corpus's shipmode stand-in): ≥120 days LATE, 60–119 SLOW,
    // else FAST (lags can be negative in the corpus — FAST absorbs them).
    // Per bucket: critical-priority (1-URGENT/2-HIGH) vs other order
    // counts — the Q12 pivot. One shuffle (lineitem⋈orders on orderkey),
    // then a 3-row aggregate.
    "q_ship_lag" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_shipdate")
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("lag_d", datediff(col("l_shipdate"), col("o_orderdate")))
        .withColumn("bucket", when(col("lag_d") >= 120, "LATE")
          .when(col("lag_d") >= 60, "SLOW").otherwise("FAST"))
        .groupBy("bucket")
        .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("critical_lines"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("other_lines"))
        .orderBy("bucket")
    }),

    // ---- TPC-H Q13 shape: customer order-count distribution (ORACLE) ----
    // How many customers placed exactly k non-urgent orders — INCLUDING
    // k = 0, which is why the join must be a LEFT join from customer (an
    // inner join silently drops the zero bucket; the classic Q13 trap).
    // Two aggregates: per-customer count (shuffle on custkey), then the
    // k-row distribution over counts.
    "q_cust_order_dist" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")
      Tables.customer(s, d).select("c_custkey")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // ---- TPC-H Q14 shape: promotion revenue share (ORACLE) --------------
    // Share of September-1997 revenue carried by PROMO-type parts. Both
    // the promo and total sums are exact ten-thousandths from ONE pass
    // (conditional aggregation — never two scans), the part dim is
    // broadcast, and the share is a single r3'd division of exact BIGINTs.
    "q_promo_share" -> ((s, d) => {
      val p = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .select(col("l_partkey"), revTk.as("rev_tk"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", col("rev_tk")).otherwise(0L)).as("promo_tk"),
          sum(col("rev_tk")).as("total_tk"))
        .select(r2(col("promo_tk").cast("double") / lit(10000.0)).as("promo_revenue"),
          r2(col("total_tk").cast("double") / lit(10000.0)).as("total_revenue"),
          r3(col("promo_tk").cast("double") * lit(100.0) / col("total_tk").cast("double"))
            .as("promo_pct"))
    }),

    // ---- TPC-H Q16 shape: supplier census per part profile (ORACLE) -----
    // Distinct suppliers per (brand, type, size) profile over the derived
    // supply relation, excluding Brand#1, PROMO types, off-list sizes and
    // deficit suppliers (s_acctbal < 0 — the corpus's complaint marker).
    // The supplier exclusion is a broadcast LEFT ANTI (never NOT IN, which
    // a null would poison); part dim broadcast; the distinct count
    // shuffles once on the profile key.
    "q_supp_part_census" -> ((s, d) => {
      val p = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO"
          && col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val badSupp = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
        .select("s_suppkey")
      supply(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }),

    // ---- TPC-H Q17 shape: small-quantity revenue (ORACLE) ---------------
    // Average yearly revenue lost if Brand#2 orders below 20% of the
    // part's mean quantity stopped shipping. The correlated
    // avg-per-part subquery is ONE aggregate over the already-filtered
    // lines, broadcast back (bounded by the brand's part count); the 20%
    // comparison is cross-multiplied exact integers
    // (qty_c · 5 · n < sum_qty_c) so no float mean decides a line.
    "q_small_qty_rev" -> ((s, d) => {
      val p = Tables.part(s, d).filter(col("p_brand") === "Brand#2")
        .select("p_partkey")
      val t = Tables.lineitem(s, d)
        .select(col("l_partkey"),
          round(col("l_quantity") * 100).cast("long").as("qty_c"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val stats = t.groupBy(col("l_partkey").as("sp"))
        .agg(count(lit(1)).as("n_l"), sum(col("qty_c")).as("sum_qty_c"))
      t.join(broadcast(stats), col("l_partkey") === col("sp"))
        .filter(col("qty_c") * lit(5L) * col("n_l") < col("sum_qty_c"))
        .agg(count(lit(1)).as("n_small"),
          coalesce(sum(col("price_c")), lit(0L)).as("sum_c"))
        .select(col("n_small"),
          r2(col("sum_c").cast("double") / lit(700.0)).as("avg_yearly"))
    }),

    // ---- TPC-H Q19 shape: disjunctive predicate revenue (ORACLE) --------
    // Revenue under three OR'd brand/size/quantity conjunct triples — the
    // classic disjunctive-pushdown topology: the join key (partkey) is
    // still a plain equi-join, with the cross-side disjunction evaluated
    // as a post-join filter; each side's common bounds (size ≥ 1, qty
    // bounds' hull) could prune the scans, and the part side is broadcast.
    "q_disjunct_rev" -> ((s, d) => {
      val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"), revTk.as("rev_tk"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)
            && col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25)
            && col("l_quantity").between(10, 35)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)
            && col("l_quantity").between(20, 50)))
        .agg(count(lit(1)).as("n_lines"),
          r2(sum(col("rev_tk")).cast("double") / lit(10000.0)).as("revenue"))
    }),

    // ---- TPC-H Q20 shape: dominant suppliers (ORACLE) -------------------
    // Suppliers carrying more than half of any 'blue' part's 1997 volume
    // (the excess-stock nested-IN topology, flattened): per-(part, supp)
    // quantity aggregate, per-part total broadcast back, half-share
    // cross-multiplied exact (2·qty_c > total_c), then the qualifying
    // count per supplier with name/nation attached. Every dim path is
    // broadcast; the fact pass shuffles once on (part, supp).
    "q_dominant_supp" -> ((s, d) => {
      val p = Tables.part(s, d).filter(col("p_name").contains("blue"))
        .select("p_partkey")
      val shipped = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_suppkey"),
          round(col("l_quantity") * 100).cast("long").as("qty_c"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("qty_c")).as("supp_qty_c"))
      val totals = shipped.groupBy(col("l_partkey").as("tp"))
        .agg(sum(col("supp_qty_c")).as("total_c"))
      val sn = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
      shipped.join(broadcast(totals), col("l_partkey") === col("tp"))
        .filter(col("supp_qty_c") * lit(2L) > col("total_c"))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_parts_dominated"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"), col("n_parts_dominated"))
        .orderBy("s_suppkey")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_min_cost_supp" ->
      ("WITH supply AS (SELECT l_partkey, l_suppkey, min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c " +
        "FROM lineitem GROUP BY l_partkey, l_suppkey), " +
        "eur AS (SELECT s_suppkey, s_name, n_name, CAST(round(s_acctbal * 100) AS BIGINT) AS acct_c " +
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'EUROPE'), " +
        "costed AS (SELECT p_partkey, p_name, s_suppkey, s_name, n_name, acct_c, cost_c " +
        "FROM supply JOIN (SELECT p_partkey, p_name FROM part WHERE p_size = 15) p ON l_partkey = p_partkey " +
        "JOIN eur ON l_suppkey = s_suppkey) " +
        "SELECT floor(CAST(acct_c AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS s_acctbal, " +
        "s_name, n_name, p_partkey, p_name, " +
        "floor(CAST(cost_c AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS supply_cost " +
        "FROM costed WHERE cost_c = (SELECT min(cost_c) FROM costed c2 WHERE c2.p_partkey = costed.p_partkey) " +
        "ORDER BY acct_c DESC, p_partkey, s_suppkey LIMIT 20"),
    "q_late_exists" ->
      ("SELECT o_orderpriority, count(*) AS order_count FROM orders o " +
        "WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01' " +
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey " +
        "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_local_volume" ->
      ("SELECT n_name, floor(CAST(rev_tk AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS revenue, n_lines FROM (" +
        "SELECT n_name, sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_tk, " +
        "count(*) AS n_lines " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY n_name) t ORDER BY rev_tk DESC, n_name"),
    "q_product_profit" ->
      ("SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        "floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) " +
        "- CAST(round(p_retailprice * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) " +
        "/ 10000.0 * 100.0 + 0.5) / 100.0 AS profit, count(*) AS n_lines " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE p_name LIKE '%red%' " +
        "GROUP BY n_name, o_year ORDER BY n_name, o_year DESC"),
    "q_ship_lag" ->
      ("SELECT CASE WHEN lag_d >= 120 THEN 'LATE' WHEN lag_d >= 60 THEN 'SLOW' ELSE 'FAST' END AS bucket, " +
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS critical_lines, " +
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS other_lines " +
        "FROM (SELECT datediff('day', o_orderdate, l_shipdate) AS lag_d, o_orderpriority " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01') t " +
        "GROUP BY bucket ORDER BY bucket"),
    "q_cust_order_dist" ->
      ("SELECT c_count, count(*) AS custdist FROM (" +
        "SELECT c_custkey, count(o_orderkey) AS c_count FROM customer " +
        "LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderpriority <> '1-URGENT') o " +
        "ON c_custkey = o_custkey GROUP BY c_custkey) t " +
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"),
    "q_promo_share" ->
      ("SELECT floor(CAST(promo_tk AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS promo_revenue, " +
        "floor(CAST(total_tk AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0 AS total_revenue, " +
        "floor(CAST(promo_tk AS DOUBLE) * 100.0 / CAST(total_tk AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS promo_pct FROM (" +
        "SELECT sum(CASE WHEN p_type = 'PROMO' THEN rev_tk ELSE 0 END) AS promo_tk, sum(rev_tk) AS total_tk FROM (" +
        "SELECT p_type, CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_tk " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01') t) a"),
    "q_supp_part_census" ->
      ("SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt " +
        "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) supply " +
        "JOIN part ON l_partkey = p_partkey " +
        "WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35) " +
        "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
        "GROUP BY p_brand, p_type, p_size " +
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"),
    "q_small_qty_rev" ->
      ("WITH t AS (SELECT l_partkey, CAST(round(l_quantity * 100) AS BIGINT) AS qty_c, " +
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_brand = 'Brand#2'), " +
        "stats AS (SELECT l_partkey AS sp, count(*) AS n_l, sum(qty_c) AS sum_qty_c FROM t GROUP BY l_partkey) " +
        "SELECT count(*) AS n_small, " +
        "floor(CAST(coalesce(sum(price_c), 0) AS DOUBLE) / 700.0 * 100.0 + 0.5) / 100.0 AS avg_yearly " +
        "FROM t JOIN stats ON l_partkey = sp WHERE qty_c * 5 * n_l < sum_qty_c"),
    "q_disjunct_rev" ->
      ("SELECT count(*) AS n_lines, " +
        "floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) " +
        "/ 10000.0 * 100.0 + 0.5) / 100.0 AS revenue " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20) " +
        "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 35) " +
        "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 50)"),
    "q_dominant_supp" ->
      ("WITH shipped AS (SELECT l_partkey, l_suppkey, sum(CAST(round(l_quantity * 100) AS BIGINT)) AS supp_qty_c " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE p_name LIKE '%blue%' AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY l_partkey, l_suppkey), " +
        "totals AS (SELECT l_partkey AS tp, sum(supp_qty_c) AS total_c FROM shipped GROUP BY l_partkey) " +
        "SELECT s_suppkey, s_name, n_name, n_parts_dominated FROM (" +
        "SELECT l_suppkey, count(*) AS n_parts_dominated FROM shipped JOIN totals ON l_partkey = tp " +
        "WHERE supp_qty_c * 2 > total_c GROUP BY l_suppkey) w " +
        "JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey " +
        "ORDER BY s_suppkey"),
  )
}
