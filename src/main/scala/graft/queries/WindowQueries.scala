package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.5 window functions + §2.6-adjacent analytics.
  *
  * Determinism notes:
  *  - every window ORDER BY ends in a unique key (o_orderkey / event_id)
  *    so ranking ties can't reorder between engines;
  *  - rangeBetween is long-typed in Spark's DSL, so the 30-day range
  *    frame orders by an epoch-day number, mirrored exactly in DuckDB;
  *  - time gaps are computed on exact integer microseconds (both engines
  *    truncate the nanos source identically), divided to seconds only at
  *    output — double division of exact ints is bit-identical.
  */
object WindowQueries extends QueryGroup {

  val queries: Map[String, QFn] = Map(
    "q_win_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("rk", rank().over(w).cast("long"))
        .withColumn("drk", dense_rank().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rk", "drk")
        .orderBy("o_custkey", "rn")
    }),

    "q_win_running" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("run_sum", round(sum(col("value")).over(w), 2))
        .select("event_id", "user_id", "run_sum")
        .orderBy("event_id")
    }),

    "q_win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_us", unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .withColumn("next_us", unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"),
          r2(col("prev_us").cast("double") / 1000000.0).as("prev_gap_sec"),
          r2(col("next_us").cast("double") / 1000000.0).as("next_gap_sec"))
        .orderBy("event_id")
    }),

    // 7-row moving average, reported as exact fixed-point (1/10000 currency
    // units, truncated). o_totalprice is cents-exact (verified), so the
    // whole computation is integer arithmetic — immune to the Spark-vs-
    // DuckDB sliding-frame accumulation-order divergence that flipped
    // round(avg,2) at 2dp boundaries in round 1.
    "q_win_frame_rows" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-6, 0)
      Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .withColumn("sum_c", sum(col("cents")).over(w))
        .withColumn("cnt", count(lit(1)).over(w))
        .select(col("o_custkey"), col("o_orderkey"),
          expr("(sum_c * 100) div cnt").as("mavg_c"))
        .orderBy("o_orderkey")
    }),

    // 30-day range frame summed in exact integer cents: a RANGE sliding
    // frame is segment-tree-accumulated in DuckDB but in-order in Spark,
    // so a double sum can differ in the last ulp and flip round(x,2) at a
    // cent boundary (the exact failure mode q_win_frame_rows had in
    // round 1). o_totalprice is cents-exact, so the sum is order-free.
    "q_win_frame_range" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("daynum"))
        .rangeBetween(-30, 0)
      Tables.orders(s, d)
        .withColumn("daynum", unix_date(to_date(col("o_orderdate"))).cast("long"))
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .withColumn("sum30_c", sum(col("cents")).over(w))
        .select("o_orderkey", "o_custkey", "daynum", "sum30_c")
        .orderBy("o_orderkey")
    }),

    // Global ntile/percent_rank/cume_dist WITHOUT the unpartitioned
    // window (`Window.orderBy` with no PARTITION BY = whole corpus
    // through one reducer — the last corpus-scale single-reducer sort
    // this suite had, removed in r6). ShardedRank range-partitions on
    // the total order and stitches per-shard row numbers with broadcast
    // offsets; the rank functions are then closed-form arithmetic over
    // (rn, n) — exactly the definitions the window functions compute:
    //   ntile(4):      first n%4 buckets get n/4+1 rows, rest n/4;
    //   percent_rank:  (rank-1)/(n-1), and rank = rn (ORDER BY is total);
    //   cume_dist:     rn/n (peer groups are singletons).
    // The divisions are the same exact-integer-to-double operations
    // DuckDB's window implementation performs, so the oracle hash is
    // unchanged.
    "q_win_ntile_pct" -> ((s, d) => {
      graft.plans.ShardedRank.withRowNumber(
          Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
          "rn", "n", col("o_totalprice").desc, col("o_orderkey"))
        .withColumn("base", expr("n div 4"))
        .withColumn("rem", col("n") % 4)
        .withColumn("quartile",
          when(col("rn") <= col("rem") * (col("base") + 1),
            expr("(rn - 1) div (base + 1) + 1"))
            .otherwise(expr("rem + (rn - rem * (base + 1) - 1) div base + 1")))
        .withColumn("pct_rank",
          round(when(col("n") === 1, lit(0.0))
            .otherwise((col("rn") - 1).cast("double") / (col("n") - 1).cast("double")), 6))
        .withColumn("cume", round(col("rn").cast("double") / col("n").cast("double"), 6))
        .select("o_orderkey", "quartile", "pct_rank", "cume")
        .orderBy("o_orderkey")
    }),

    "q_win_first_last" -> ((s, d) => {
      val wOrd = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFull = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .withColumn("first_price", first(col("o_totalprice")).over(wFull))
        .withColumn("last_price", last(col("o_totalprice")).over(wFull))
        .withColumn("rn", row_number().over(wOrd))
        .filter(col("rn") === 1)
        .select("o_custkey", "first_price", "last_price")
        .orderBy("o_custkey")
    }),

    // nth_value over an unbounded-both frame: the "second purchase"
    // report (conversion analysts' second-touch shape). The frame makes
    // nth_value a per-partition constant, so one row_number pick per
    // customer carries it out; customers with a single order surface
    // NULL (second order genuinely absent, not a frame artifact). The
    // (date, key) ORDER BY is total — deterministic under any partial
    // merge order, same clause in DuckDB.
    "q_win_nth" -> ((s, d) => {
      val wOrd = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFull = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .withColumn("second_key", nth_value(col("o_orderkey"), 2).over(wFull))
        .withColumn("third_key", nth_value(col("o_orderkey"), 3).over(wFull))
        .withColumn("n_orders", count(lit(1)).over(wFull))
        .withColumn("rn", row_number().over(wOrd))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("first_key"),
          col("second_key"), col("third_key"), col("n_orders"))
        .orderBy("o_custkey")
    }),

    // §2.10 sessionization — gaps-and-islands (deterministic batch form).
    // Session-start flag via lag > 30min, running sum -> session id, then
    // two-level aggregate: per (user, session) -> per user.
    "q_session_30m" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val flagged = Tables.events(s, d)
        .withColumn("prev_us", unix_micros(lag(col("ts"), 1).over(w)))
        .withColumn("new_s",
          when(col("prev_us").isNull
            || (unix_micros(col("ts")) - col("prev_us")) > 30L * 60L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val perSession = flagged.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("span_us"))
      perSession.groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          r2(sum(col("n_events")).cast("double") / count(lit(1))).as("events_per_session"),
          r2((sum(col("span_us")).cast("double") / count(lit(1))) / 1000000.0).as("avg_span_sec"))
        .orderBy("user_id")
    }),

    // Pareto / concentration curve: within each order status, the running
    // revenue share of the top-N orders (running sum over one window ÷
    // partition total over a second frame of the SAME window partition —
    // one shuffle, two frames). All arithmetic is exact integer cents
    // until the single final division of identical bigints, so the
    // engine-independent floor-rounding (r3) is bit-safe.
    "q_win_cumshare" -> ((s, d) => {
      val ord = Window.partitionBy("o_orderstatus").orderBy(col("cents").desc, col("o_orderkey"))
      val wRun = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .withColumn("run_c", sum(col("cents")).over(wRun))
        .withColumn("tot_c", sum(col("cents")).over(wAll))
        .withColumn("rn", row_number().over(ord).cast("long"))
        .filter(col("rn") <= 100)
        .select(col("o_orderstatus"), col("rn"), col("o_orderkey"),
          r3(col("run_c").cast("double") / col("tot_c").cast("double")).as("cum_share"))
        .orderBy("o_orderstatus", "rn")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_win_rank" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)) t " +
        "WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "q_win_running" ->
      ("SELECT event_id, user_id, round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum " +
        "FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events) e " +
        "ORDER BY event_id"),
    "q_win_lag_lead" ->
      ("SELECT event_id, user_id, " +
        "floor(CAST(epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS DOUBLE) / 1000000.0 * 100.0 + 0.5) / 100.0 AS prev_gap_sec, " +
        "floor(CAST(epoch_us(lead(ts, 1) OVER w) - epoch_us(ts) AS DOUBLE) / 1000000.0 * 100.0 + 0.5) / 100.0 AS next_gap_sec " +
        "FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) ORDER BY event_id"),
    "q_win_frame_rows" ->
      ("SELECT o_custkey, o_orderkey, CAST((sum_c * 100) // cnt AS BIGINT) AS mavg_c FROM (" +
        "SELECT o_custkey, o_orderkey, sum(cents) OVER w AS sum_c, count(*) OVER w AS cnt " +
        "FROM (SELECT o_custkey, o_orderkey, o_orderdate, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders) t " +
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) x " +
        "ORDER BY o_orderkey"),
    "q_win_frame_range" ->
      ("SELECT o_orderkey, o_custkey, daynum, CAST(sum(cents) OVER (PARTITION BY o_custkey " +
        "ORDER BY daynum RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum30_c " +
        "FROM (SELECT o_orderkey, o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents, " +
        "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS daynum FROM orders) t " +
        "ORDER BY o_orderkey"),
    "q_win_ntile_pct" ->
      ("SELECT o_orderkey, CAST(ntile(4) OVER w AS BIGINT) AS quartile, " +
        "round(percent_rank() OVER w, 6) AS pct_rank, round(cume_dist() OVER w, 6) AS cume " +
        "FROM orders WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey) ORDER BY o_orderkey"),
    "q_win_first_last" ->
      ("SELECT o_custkey, first_price, last_price FROM (" +
        "SELECT o_custkey, first_value(o_totalprice) OVER wf AS first_price, " +
        "last_value(o_totalprice) OVER wf AS last_price, row_number() OVER wo AS rn FROM orders " +
        "WINDOW wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), " +
        "wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) t " +
        "WHERE rn = 1 ORDER BY o_custkey"),
    "q_win_nth" ->
      ("SELECT o_custkey, first_key, second_key, third_key, n_orders FROM (" +
        "SELECT o_custkey, o_orderkey AS first_key, " +
        "nth_value(o_orderkey, 2) OVER wf AS second_key, " +
        "nth_value(o_orderkey, 3) OVER wf AS third_key, " +
        "count(*) OVER wf AS n_orders, row_number() OVER wo AS rn FROM orders " +
        "WINDOW wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), " +
        "wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) t " +
        "WHERE rn = 1 ORDER BY o_custkey"),
    "q_session_30m" ->
      ("WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events), " +
        "flagged AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN lag(ts, 1) OVER w IS NULL " +
        "OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "sess AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM flagged), " +
        "per_session AS (SELECT user_id, session_id, count(*) AS n_events, " +
        "max(epoch_us(ts)) - min(epoch_us(ts)) AS span_us FROM sess GROUP BY user_id, session_id) " +
        "SELECT user_id, count(*) AS n_sessions, " +
        "floor(CAST(sum(n_events) AS DOUBLE) / count(*) * 100.0 + 0.5) / 100.0 AS events_per_session, " +
        "floor((CAST(sum(span_us) AS DOUBLE) / count(*)) / 1000000.0 * 100.0 + 0.5) / 100.0 AS avg_span_sec " +
        "FROM per_session GROUP BY user_id ORDER BY user_id"),
    "q_win_cumshare" ->
      ("SELECT o_orderstatus, rn, o_orderkey, " +
        "floor(CAST(run_c AS DOUBLE) / CAST(tot_c AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS cum_share FROM (" +
        "SELECT o_orderstatus, o_orderkey, " +
        "CAST(row_number() OVER w AS BIGINT) AS rn, " +
        "sum(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_c, " +
        "sum(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS tot_c " +
        "FROM (SELECT o_orderstatus, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders) t " +
        "WINDOW w AS (PARTITION BY o_orderstatus ORDER BY cents DESC, o_orderkey)) x " +
        "WHERE rn <= 100 ORDER BY o_orderstatus, rn"),
  )
}
