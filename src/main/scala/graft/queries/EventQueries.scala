package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.10 event-time queries (batch-checkable forms) + the as-of
  * join (§2.3) + JSON extraction (§2.8) — everything over the `events`
  * table (nanos timestamp handled in Tables.events).
  *
  * As-of join: Spark has no builtin, so it's the window-trick
  * composition — union-tag click/purchase streams, order (ts, tag,
  * event_id) with purchases before clicks at equal ts so "strictly
  * earlier" holds, then last(click_ts) over rows [-inf, -1). Mirrors
  * DuckDB's native ASOF JOIN with a strict `>` condition.
  *
  * Sliding windows: Spark's window(ts, '1 hour', '15 minutes') assigns
  * each event to 4 epoch-aligned windows; the DuckDB oracle reproduces
  * that mechanically (bucket15(ts) - k*15min for k in 0..3).
  */
object EventQueries extends QueryGroup {

  val queries: Map[String, QFn] = Map(
    "q_json_funcs" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(r2(avg(col("k"))).as("avg_k"), max(col("k")).as("max_k"), count(lit(1)).as("n"))
        .orderBy("event_type")),

    "q_join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
          when(col("event_type") === "click", col("ts")).as("click_ts"),
          when(col("event_type") === "purchase", 0).otherwise(1).as("tag"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.withColumn("prev_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" && col("prev_click_ts").isNotNull)
        .select(pmod(col("user_id"), lit(10)).cast("long").as("bucket"),
          (unix_micros(col("ts")) - unix_micros(col("prev_click_ts"))).as("gap_us"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_matched"),
          r2(sum(col("gap_us")).cast("double") / count(lit(1)) / 1000000.0).as("avg_gap_sec"))
        .orderBy("bucket")
    }),

    // as-of join with a TOLERANCE bound (pandas merge_asof(tolerance=...)
    // semantics): a purchase only matches its latest prior click if that
    // click is within 1 hour — older matches are reported as expired, and
    // purchases with no prior click at all as unmatched. Same single
    // (user, time) window sort as q_join_asof; the tolerance test is an
    // exact integer micros comparison. The avg is guarded by a count
    // predicate (identical CASE in the oracle), never a 0/0 NaN.
    "q_asof_tolerance" -> ((s, d) => {
      val tolUs = 3600000000L // 1 hour
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
          when(col("event_type") === "click", col("ts")).as("click_ts"),
          when(col("event_type") === "purchase", 0).otherwise(1).as("tag"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val m = ev.withColumn("prev_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(pmod(col("user_id"), lit(10)).cast("long").as("bucket"),
          (unix_micros(col("ts")) - unix_micros(col("prev_click_ts"))).as("gap_us"))
      val inTol = col("gap_us").isNotNull && col("gap_us") <= lit(tolUs)
      m.groupBy("bucket")
        .agg(count(lit(1)).as("n_purchases"),
          sum(when(inTol, 1L).otherwise(0L)).as("n_matched_1h"),
          sum(when(col("gap_us").isNotNull && col("gap_us") > tolUs, 1L).otherwise(0L)).as("n_expired"),
          sum(when(col("gap_us").isNull, 1L).otherwise(0L)).as("n_unmatched"),
          when(sum(when(inTol, 1L).otherwise(0L)) > 0L,
            r2(sum(when(inTol, col("gap_us")).otherwise(0L)).cast("double")
              / sum(when(inTol, 1L).otherwise(0L)).cast("double") / lit(1000000.0)))
            .as("avg_gap_sec"))
        .orderBy("bucket")
    }),

    // same semantics as q_join_asof, but through the custom whole-operator
    // path: AsOfJoin LogicalPlan -> AsOfJoinStrategy -> AsOfJoinExec
    // (co-partitioned streaming merge; see graft.plans.AsOfJoin). Verified
    // against the same DuckDB native ASOF JOIN oracle.
    "q_asof_custom" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      org.apache.spark.sql.GraftPlanBridge.asofJoin(purchases, clicks, "user_id", "ts")
        .filter(col("asof_ts").isNotNull)
        .select(pmod(col("user_id"), lit(10)).cast("long").as("bucket"),
          (unix_micros(col("ts")) - col("asof_ts")).as("gap_us"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_matched"),
          r2(sum(col("gap_us")).cast("double") / count(lit(1)) / 1000000.0).as("avg_gap_sec"))
        .orderBy("bucket")
    }),

    "q_tumbling_1h" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_val"))
        .select(fmtTs(col("w.start")).as("window_start"), col("event_type"), col("n"), col("sum_val"))
        .orderBy("window_start", "event_type")),

    "q_sliding_1h_15m" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_val"))
        .select(fmtTs(col("w.start")).as("window_start"), col("n"), col("sum_val"))
        .orderBy("window_start")),

    // ordered event funnel: users who viewed, then clicked strictly after
    // their first view, then purchased strictly after that first
    // qualifying click. Each stage is one aggregation + one join, all
    // hash-partitioned on user_id — Spark reuses the partitioning across
    // stages (no extra shuffle), the standard distributed funnel shape.
    // Pure integer counts on truncated-µs timestamps -> exact oracle.
    "q_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("mv"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("mv"))
        .groupBy("user_id").agg(min("ts").as("mc"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("mc"))
        .groupBy("user_id").agg(min("ts").as("mp"))
      v.select(lit("1_view").as("stage"), col("user_id"))
        .unionAll(c.select(lit("2_click").as("stage"), col("user_id")))
        .unionAll(p.select(lit("3_purchase").as("stage"), col("user_id")))
        .groupBy("stage").agg(count(lit(1)).as("n_users"))
        .orderBy("stage")
    }),

    // schema-enforced JSON parse: serialize a nested record per event
    // (to_json), parse it back through an EXPLICIT DDL schema (from_json
    // with nested STRUCT — the production shape for semi-structured
    // ingestion, where a declared schema turns JSON into columnar data
    // Catalyst can prune/push down, vs. get_json_object's per-path
    // string probing). Jackson's double serialization round-trips
    // bit-exactly, so aggregates over parsed fields must equal aggregates
    // over the source columns — which is exactly what the oracle checks.
    // Aggregates chosen order-free (count / integer sum / max) so
    // accumulation order can't shift a rounding boundary.
    "q_json_schema" -> ((s, d) =>
      Tables.events(s, d)
        .select(to_json(struct(
          struct(col("event_type").as("t"), col("value").as("v")).as("m"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))).as("j"))
        .select(from_json(col("j"), "m STRUCT<t: STRING, v: DOUBLE>, k BIGINT",
          Map.empty[String, String]).as("p"))
        .groupBy(col("p.m.t").as("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("p.k")).as("sum_k"),
          r2(max(col("p.m.v"))).as("max_v"))
        .orderBy("event_type")),

    // time-series resample + gap-fill: per-user daily closing value with
    // missing days filled by last-observation-carried-forward — the
    // densify/interpolate step time-series ETL runs before modeling.
    // Calendar = explode(sequence(min_day, max_day)) per user (no
    // cross-join against a global calendar — each key generates only its
    // own span); LOCF = last(ignoreNulls) over an unbounded-preceding
    // window; the carried value is a raw parquet double (identical bits
    // both engines, r2 floor safe). First day always has a value by
    // construction, so no leading-null edge.
    "q_resample_locf" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "day").orderBy(col("ts").desc, col("event_id").desc)
      val daily = Tables.events(s, d).filter(col("user_id") < 20)
        .withColumn("day", unix_date(to_date(col("ts"))).cast("long"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("day"), col("value").as("close"))
      val cal = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      cal.join(daily, Seq("user_id", "day"), "left")
        .withColumn("close_locf",
          last(col("close"), ignoreNulls = true).over(Window.partitionBy("user_id")
            .orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("user_id"), col("day"), r2(col("close_locf")).as("close"))
        .orderBy("user_id", "day")
    }),

    // SCD2 history build: each change event becomes a version row valid
    // [ts, next_ts) per key, the last version per key staying open — the
    // other half of CDC next to q_scd_latest's compaction. One window
    // shuffle on the key (the standard history-table build at 100 TB);
    // version durations are exact integer micros summed BEFORE one
    // guarded division, so the float column is portable (§7.3.13).
    "q_scd2" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val closed = col("n_versions") - col("n_open")
      Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("next_us", lead(col("us"), 1).over(w))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_versions"),
          sum(when(col("next_us").isNull, 1L).otherwise(0L)).as("n_open"),
          sum(col("next_us") - col("us")).as("sum_dur_us"))
        .withColumn("avg_closed_sec",
          when(closed > 0L,
            floor(col("sum_dur_us").cast("double") / closed.cast("double")
              / lit(1000000.0) * lit(100.0) + lit(0.5)) / lit(100.0)))
        .orderBy("event_type")
    }),

    // First-order Markov transitions over each user's event sequence:
    // lag(event_type) over (ts, event_id) order gives the (prev -> curr)
    // bigram, counted into the 5×5 transition matrix with per-prev row
    // probabilities — the session-model / anomaly-baseline shape. ONE
    // shuffle on user_id (the lag window); the 25-cell aggregate and its
    // row-total window are size-independent of the corpus. The
    // probability is a single r3-grid division of exact counts (§7.3.13).
    "q_event_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("p", r3(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy("prev_type")).cast("double")))
        .orderBy("prev_type", "event_type")
    }),

    // Cohort retention over a sparse deterministic sample: users cohorted
    // by the week of their first sampled event (md5 hex < '1' keeps ~1/16
    // of events — content-derived, never rand(), so engines and re-runs
    // agree and the cohorts spread past week 0), then distinct users per
    // (cohort_week, week_offset) with retention as a share of the
    // cohort's week-0 size. The min-window, distinct, and count all ride
    // the user_id/cohort hash shuffles a real retention job needs; counts
    // stay exact integers to one r2 division (§7.3.13).
    "q_cohort_retention" -> ((s, d) => {
      val wu = Window.partitionBy("user_id")
      val wc = Window.partitionBy("cohort_week")
      Tables.events(s, d)
        .filter(md5(col("event_id").cast("string")) < "1")
        .select(col("user_id"),
          floor(datediff(to_date(col("ts")), lit("2024-01-01")) / 7).cast("long").as("week"))
        .withColumn("cohort_week", min(col("week")).over(wu))
        .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"),
          col("user_id"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("active_users"))
        .withColumn("cohort_size",
          max(when(col("week_offset") === 0, col("active_users"))).over(wc))
        .withColumn("retention_pct",
          r2(col("active_users").cast("double") * 100.0 / col("cohort_size").cast("double")))
        .orderBy("cohort_week", "week_offset")
    }),

    // CDC compaction / upsert resolution: latest record per key by
    // (ts, event_id) — the merge step every incremental table maintenance
    // job runs. One hash shuffle on the key, row_number top-1 per group
    // (no global sort); at 100 TB this is the exact shape of a
    // partition-parallel MERGE INTO materialization.
    "q_scd_latest" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), fmtTs(col("ts")).as("ts_str"),
          r2(col("value")).as("value_r"))
        .orderBy("user_id")
    }),

    // ---- write-side MERGE INTO materialization (ORACLE) -----------------
    // q_scd_latest resolves upserts at READ time; this is the WRITE side:
    // a target snapshot (latest state per user before the cutoff) merged
    // with a delta batch (latest state per user from the cutoff on) —
    // update-else-insert — MATERIALIZED to parquet and read back. The
    // merge is the relational shape every table format runs under MERGE
    // INTO: target rows whose key has no delta row (anti-join on the
    // delta's keys — the delta is the small side at 100 TB, so it
    // broadcasts) unioned with the whole delta. The written parquet is
    // the next snapshot generation. Oracle rebuilds the same
    // anti-join + union over the original table — the materialization
    // must be lossless.
    "q_merge_upsert" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      def latest(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), fmtTs(col("ts")).as("ts_str"),
          r2(col("value")).as("value_r"))
      val ev = Tables.events(s, d)
      val cut = lit("2024-04-01").cast("timestamp")
      val target = latest(ev.filter(col("ts") < cut))
      val delta = latest(ev.filter(col("ts") >= cut))
      val out = s"/tmp/graft_merge_${Integer.toHexString(d.hashCode)}/user_state"
      target.join(delta.select("user_id"), Seq("user_id"), "left_anti")
        .unionByName(delta)
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).orderBy("user_id")
    }),

    // ---- sweep-line session concurrency (ORACLE) -------------------------
    // Peak concurrent sessions per day — the capacity-planning question
    // sessionization feeds. Classic sweep line: each session interval
    // becomes (+1 at start, −1 at end+1µs) endpoint rows; concurrency is
    // the RANGE running sum over endpoint time (RANGE, not ROWS: all
    // deltas at one instant apply atomically, so tie order can't skew the
    // peak — identical semantics in both engines). The sweep SHARDS by
    // day: sessions are split into per-day segments so every partition's
    // sweep is self-contained — a global-ordered running sum would be the
    // single-reducer plan that dies at 100 TB. One user-key shuffle
    // (sessionize) + one day-key shuffle (sweep).
    "q_sessions_concurrent" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val sess = Tables.events(s, d)
        .withColumn("prev_us", unix_micros(lag(col("ts"), 1).over(w)))
        .withColumn("new_s", when(col("prev_us").isNull
          || (unix_micros(col("ts")) - col("prev_us")) > 30L * 60L * 1000000L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min(unix_micros(col("ts"))).as("s_us"), max(unix_micros(col("ts"))).as("e_us"))
      val segs = sess
        .withColumn("day", explode(expr(
          "sequence(to_date(timestamp_micros(s_us)), to_date(timestamp_micros(e_us)))")))
        .withColumn("day_us", unix_micros(col("day").cast("timestamp")))
        .withColumn("seg_s", greatest(col("s_us"), col("day_us")))
        .withColumn("seg_e", least(col("e_us"), col("day_us") + 86399999999L))
      val deltas = segs.select(col("day"), col("seg_s").as("us"), lit(1L).as("delta"))
        .unionAll(segs.select(col("day"), (col("seg_e") + 1L).as("us"), lit(-1L).as("delta")))
      val sweep = Window.partitionBy("day").orderBy("us")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      deltas.withColumn("conc", sum(col("delta")).over(sweep))
        .groupBy("day")
        .agg(max(col("conc")).as("peak_concurrent"),
          sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_segments"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("peak_concurrent"), col("n_segments"))
        .orderBy("day")
    }),

    // ---- session-level conversion by size bucket (ORACLE) ----------------
    // Do longer sessions convert better? Sessionization and the funnel
    // composed: per session — event count and whether it contains a
    // purchase — then conversion rate per session-size bucket. The same
    // single user-keyed window shuffle as q_session_30m (flag + running
    // sum + per-session aggregate all ride it); the bucket rollup is
    // k-group. Counts exact to one r2 division.
    "q_session_conversion" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val sess = Tables.events(s, d)
        .withColumn("prev_us", unix_micros(lag(col("ts"), 1).over(w)))
        .withColumn("new_s", when(col("prev_us").isNull
          || (unix_micros(col("ts")) - col("prev_us")) > 30L * 60L * 1000000L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_ev"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      sess
        .withColumn("size_bucket",
          when(col("n_ev") <= 1, "1").when(col("n_ev") <= 4, "2-4")
            .when(col("n_ev") <= 9, "5-9").otherwise("10+"))
        .groupBy("size_bucket")
        .agg(count(lit(1)).as("n_sessions"), sum(col("conv")).as("n_converted"),
          r2(sum(col("conv")).cast("double") * lit(100.0) / count(lit(1)).cast("double")).as("conv_pct"))
        .orderBy("size_bucket")
    }),

    // ---- inter-event gap distribution (ORACLE) ---------------------------
    // How bursty is the event stream? Per user, the gap to the previous
    // event in whole seconds (integer µs subtraction + `div` truncation —
    // never float division), bucketed by the DECIMAL DIGIT COUNT of the
    // gap — an exact-integer log10 proxy (string length), immune to the
    // last-ulp flips a float log10 suffers at exact powers of ten. The
    // lag rides the same user-keyed window shuffle as sessionization;
    // the histogram is a ≤12-group rollup. Informs the session-gap (30m)
    // and watermark choices operationally.
    "q_gap_dist" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev", lag(col("us"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("gap_s", expr("(us - prev) div 1000000"))
        .withColumn("gap_digits", length(col("gap_s").cast("string")).cast("long"))
        .groupBy("gap_digits")
        .agg(count(lit(1)).as("n_gaps"), min(col("gap_s")).as("min_s"),
          max(col("gap_s")).as("max_s"),
          r2(sum(col("gap_s")).cast("double") / count(lit(1)).cast("double")).as("avg_s"))
        .orderBy("gap_digits")
    }),

    // ---- first/last-touch revenue attribution (ORACLE) -------------------
    // The marketing-attribution split: each purchase's cents credited to
    // the weekday of its FIRST prior click and of its LAST prior click —
    // the two endpoints of the attribution-model spectrum, side by side.
    // min/max click per purchase ride ONE user-keyed join + aggregate
    // (per-user click×purchase pairs are bounded by activity, not corpus);
    // the weekday rollup is k-group. Weekday = epoch-day mod 7 (engines'
    // dayofweek() disagree on week start, §7.3).
    "q_first_last_touch" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"), col("event_id").as("pid"),
          round(col("value") * 100).cast("long").as("cents"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"))
      val touched = p.join(c, Seq("user_id")).filter(col("cts") <= col("pts"))
        .groupBy("user_id", "pid", "pts", "cents")
        .agg(min(col("cts")).as("first_t"), max(col("cts")).as("last_t"))
      val f = touched
        .withColumn("wd", expr("CAST(datediff(to_date(first_t), date'1970-01-01') % 7 AS BIGINT)"))
        .groupBy("wd").agg(count(lit(1)).as("n_first"), sum(col("cents")).as("first_cents"))
      val l = touched
        .withColumn("wd", expr("CAST(datediff(to_date(last_t), date'1970-01-01') % 7 AS BIGINT)"))
        .groupBy("wd").agg(count(lit(1)).as("n_last"), sum(col("cents")).as("last_cents"))
      f.join(l, Seq("wd"), "full")
        .na.fill(0L, Seq("n_first", "first_cents", "n_last", "last_cents"))
        .orderBy("wd")
    }),

    // ---- 7-day trailing-window revenue (ORACLE) --------------------------
    // The time-interval RANGE frame the row-count frames (q_win_frame_*)
    // can't express: each day's trailing-7-day revenue, where the frame
    // is bounded by DAY DISTANCE, not row count — a calendar gap (day
    // with no purchases) shrinks the frame's row membership and
    // roll7_days reports it. Corpus-scale work is the per-day rollup
    // (map-side combinable, day-keyed); the window then runs over the
    // day table (365 rows/year regardless of corpus size — bounded by
    // calendar span, not data volume), so the single-partition sort is a
    // constant-size tail, not a scale risk. Cents snapped with the
    // engine-exact floor(x*100+0.5); the rolling average is one division
    // chain over exact integers, r2'd.
    "q_rolling_7d" -> ((s, d) => {
      val w = Window.orderBy("day_num").rangeBetween(-6, 0)
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(to_date(col("ts")).as("dday"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
        .groupBy("dday")
        .agg(sum(col("cents")).as("day_cents"), count(lit(1)).as("n_purch"))
        .withColumn("day_num", expr("datediff(dday, date'1970-01-01')").cast("long"))
        .withColumn("roll7_cents", sum(col("day_cents")).over(w))
        .withColumn("roll7_days", count(lit(1)).over(w))
        .withColumn("roll7_avg_usd", r2(col("roll7_cents").cast("double")
          / col("roll7_days").cast("double") / lit(100.0)))
        .select(fmtDate(col("dday")).as("day"), col("n_purch"), col("day_cents"),
          col("roll7_cents"), col("roll7_days"), col("roll7_avg_usd"))
        .orderBy("day")
    }),

    // ---- forward as-of join (ORACLE) -------------------------------------
    // pandas merge_asof(direction='forward'): each click matched to its
    // EARLIEST strictly-later purchase — time-to-convert attribution,
    // the mirror of q_join_asof's latest-earlier-click. Same single
    // (user, time)-sorted window pass, frame flipped to rows [+1, +inf)
    // with first(non-null). Purchases sort BEFORE clicks at equal ts
    // (tag 0 < 1), so a same-instant purchase is NOT in the click's
    // following frame and "strictly later" holds — the exact dual of the
    // backward query's tie discipline. The DuckDB oracle uses the same
    // window construction (its native ASOF JOIN is backward-only).
    "q_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
          when(col("event_type") === "purchase", col("ts")).as("purchase_ts"),
          when(col("event_type") === "purchase", 0).otherwise(1).as("tag"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      ev.withColumn("next_purchase_ts", first(col("purchase_ts"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "click" && col("next_purchase_ts").isNotNull)
        .select(pmod(col("user_id"), lit(10)).cast("long").as("bucket"),
          (unix_micros(col("next_purchase_ts")) - unix_micros(col("ts"))).as("gap_us"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_matched"),
          r2(sum(col("gap_us")).cast("double") / count(lit(1)) / 1000000.0).as("avg_gap_sec"))
        .orderBy("bucket")
    }),
    // ---- exponentially weighted moving average (ORACLE) -----------------
    // Per-user EWMA with half-life decay over the last 10 events — the
    // smoothing a metrics pipeline applies to noisy per-user signals.
    // Weights are powers of 1/2 (exactly representable), values are
    // exact integer cents, so every term cents_j * 2^-j is a dyadic
    // rational within double's 53-bit mantissa and the sum is EXACT —
    // no accumulation-order risk between engines (§7.3 discipline:
    // ordinary ewma alphas like 0.3 would NOT survive the hash gate).
    // Window shape: one partitioned window, 10 lag terms, zero extra
    // shuffles — at 100 TB this is a single per-user-partitioned pass.
    "q_ewma" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val withC = Tables.events(s, d)
        .withColumn("cents", round(col("value") * 100).cast("long"))
      val ewmaC = (0 to 9).map(j =>
        coalesce(lag(col("cents"), j).over(w), lit(0L)).cast("double")
          * lit(math.pow(0.5, j))).reduce(_ + _)
      withC
        .withColumn("ewma_c", ewmaC)
        .select(col("event_id"), col("user_id"), r2(col("ewma_c") / lit(100.0)).as("ewma"))
        .orderBy("event_id")
    }),

    // ---- day-of-week x hour activity profile (ORACLE) -------------------
    // The 7x24 heatmap behind load forecasting and anomaly baselines.
    // Day-of-week is computed ARITHMETICALLY from the epoch-day number
    // ((days + 3) % 7 -> 0=Monday; 1970-01-01 was a Thursday), because
    // dayofweek()'s numbering differs between engines (Spark 1=Sunday,
    // DuckDB 0=Sunday) — the formula is the engine-neutral form.
    "q_dow_hour" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .withColumn("dow", pmod(unix_date(to_date(col("ts"))) + lit(3), lit(7)).cast("long"))
        .withColumn("hr", hour(col("ts")).cast("long"))
        .groupBy("dow", "hr")
        .agg(count(lit(1)).as("n_events"),
          r2(sum(col("cents")).cast("double") / count(lit(1)) / lit(100.0)).as("avg_value"))
        .orderBy("dow", "hr")
    }),

    // ---- hourly grid resample with LINEAR interpolation (ORACLE) --------
    // The interpolating complement to q_resample_locf: per user, an
    // hourly timestamp grid strictly inside the event span, each grid
    // point valued by linear interpolation between its bracketing
    // events. Shape: grid rows UNIONed into the event stream, then ONE
    // partitioned window pass carries the previous/next event value and
    // time to every grid row (last/first with ignoreNulls) — no range
    // join, no per-grid-point probe; this is the 100 TB-safe resample.
    // Arithmetic: interp = (c0*(t1-t) + c1*(t-t0)) / (t1-t0) on exact
    // integer cents x micros, numerator in decimal(38) (HUGEINT in the
    // oracle) — nonnegative throughout, so truncating and floor division
    // agree. Grid capped at 24 points/user to bound the report.
    "q_resample_linear" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), round(col("value") * 100).cast("long").as("cents"))
      val grid = ev.groupBy("user_id").agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
        .select(col("user_id"), explode(sequence(
          date_trunc("hour", col("t0")) + expr("INTERVAL 1 HOUR"),
          date_trunc("hour", col("t1")), expr("INTERVAL 1 HOUR"))).as("ts"))
        .withColumn("rn", row_number().over(Window.partitionBy("user_id").orderBy("ts")))
        .filter(col("rn") <= 24)
        .select(col("user_id"), col("ts"), lit(null).cast("long").as("cents"),
          lit(1).as("is_grid"))
      val merged = ev.withColumn("is_grid", lit(0)).unionByName(grid)
        .withColumn("tus", unix_micros(col("ts")))
      // events sort before a same-timestamp grid point, so an exact-hit
      // grid row interpolates between the equal event and itself
      val w = Window.partitionBy("user_id").orderBy(col("tus"), col("is_grid"))
      val prevSpec = w.rowsBetween(Window.unboundedPreceding, -1)
      val nextSpec = w.rowsBetween(0, Window.unboundedFollowing)
      val evC = when(col("is_grid") === 0, col("cents"))
      val evT = when(col("is_grid") === 0, col("tus"))
      merged
        .withColumn("c0", last(evC, ignoreNulls = true).over(prevSpec))
        .withColumn("t0", last(evT, ignoreNulls = true).over(prevSpec))
        .withColumn("c1", first(evC, ignoreNulls = true).over(nextSpec))
        .withColumn("t1", first(evT, ignoreNulls = true).over(nextSpec))
        .filter(col("is_grid") === 1)
        .withColumn("ic", when(col("t1") === col("t0"), col("c0")).otherwise(
          expr("(cast(c0 as decimal(38,0)) * cast(t1 - tus as decimal(38,0)) " +
            "+ cast(c1 as decimal(38,0)) * cast(tus - t0 as decimal(38,0))) " +
            "div cast(t1 - t0 as decimal(38,0))")))
        .select(col("user_id"), fmtTs(col("ts")).as("grid_ts"),
          r2(col("ic").cast("double") / lit(100.0)).as("value_interp"))
        .orderBy("user_id", "grid_ts")
    }),

    // ---- json_tuple generator extraction (ORACLE) -----------------------
    // The UDTF-shaped JSON path: json_tuple plans a Generate node (one
    // pass, no per-field re-parse the repeated get_json_object form
    // pays), the right shape when extracting MANY fields from big JSON
    // payloads at scale.
    "q_json_tuple" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"), json_tuple(col("props"), "k").as("k"))
        .select(col("event_type"), col("k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          r2(sum(col("k")).cast("double") / count(lit(1))).as("avg_k"))
        .orderBy("event_type")
    }),
    // ---- cohort lifetime-value matrix (ORACLE) --------------------------
    // Revenue-weighted cohort retention: users cohorted by first-seen
    // epoch-week (ANY event), purchase cents rolled into (cohort-week,
    // weeks-since) cells — the LTV triangle. Week arithmetic on
    // epoch-day div 7 integers (no date-truncation flavors); single
    // shuffle on user for the cohort min, then a k-cells aggregate.
    "q_cohort_ltv" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("wk", expr("unix_date(to_date(ts)) div 7"))
      val cohort = ev.groupBy("user_id").agg(min(col("wk")).as("cwk"))
      ev.filter(col("event_type") === "purchase")
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .join(cohort, "user_id")
        .groupBy(col("cwk"), (col("wk") - col("cwk")).as("weeks_since"))
        .agg(countDistinct(col("user_id")).as("n_buyers"),
          count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents"))
        .select(col("cwk").as("cohort_week"), col("weeks_since"),
          col("n_buyers"), col("n_purchases"), col("cents"))
        .orderBy("cohort_week", "weeks_since")
    }),

    // ---- nearest-neighbor as-of join, either direction (ORACLE) ---------
    // The third as-of flavor next to backward (q_join_asof) and forward
    // (q_asof_forward): each purchase takes its NEAREST click in time,
    // past or future, ties to the earlier click. Same single-window
    // union topology as the resampler — no range join, no per-row
    // probe: clicks sort before a same-timestamp purchase, so a
    // zero-gap click is found on the backward side deterministically.
    "q_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("is_p"))
      val w = Window.partitionBy("user_id").orderBy(col("tus"), col("is_p"), col("event_id"))
      val clickT = when(col("is_p") === 0, col("tus"))
      ev
        .withColumn("prev_t", last(clickT, ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("next_t", first(clickT, ignoreNulls = true)
          .over(w.rowsBetween(1, Window.unboundedFollowing)))
        .filter(col("is_p") === 1)
        .withColumn("gp", col("tus") - col("prev_t"))
        .withColumn("gn", col("next_t") - col("tus"))
        .withColumn("dir",
          when(col("gp").isNull && col("gn").isNull, "none")
            .when(col("gn").isNull || (col("gp").isNotNull && col("gp") <= col("gn")), "back")
            .otherwise("fwd"))
        .withColumn("gap_us", when(col("dir") === "back", col("gp"))
          .when(col("dir") === "fwd", col("gn")))
        .select(col("event_id"), col("user_id"), col("dir"),
          r2(col("gap_us").cast("double") / lit(1000000.0)).as("gap_sec"))
        .orderBy("event_id")
    }),
    // ---- Spark 4 VARIANT extraction, graded (ORACLE) --------------------
    // parse_json ONCE into the binary variant encoding, then typed
    // variant_get extraction — the semi-structured hot path that at
    // scale replaces per-field JSON re-parsing (VariantSpec pins the
    // encoding details; this gives the path an oracle-graded row). The
    // oracle reads the same field through DuckDB's JSON extraction, so
    // equality proves the variant encode/decode is value-faithful.
    "q_variant_extract" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("v", expr("parse_json(props)"))
        .withColumn("k", expr("variant_get(v, '$.k', 'long')"))
        .groupBy(pmod(col("k"), lit(7)).cast("long").as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("k_mod")
    }),

    // ---- error-safe arithmetic: try_divide / try_add (ORACLE) -----------
    // Under ANSI mode (Spark 4 default) a divide-by-zero THROWS mid-job;
    // try_* functions give per-row null semantics instead — the contract
    // a 100 TB pipeline needs (one bad row must not kill a 6-hour job).
    // Gaps between consecutive purchase values per user can be zero, so
    // the ratio of value-delta to time-gap exercises the real case.
    "q_try_arith" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).filter(col("event_type") === "purchase")
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .withColumn("dc", col("cents") - lag(col("cents"), 1).over(w))
        .withColumn("dt", unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .withColumn("rate", expr("try_divide(dc, dt div 1000000)"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("rate").isNull && col("dc").isNotNull, 1L).otherwise(0L)).as("n_zero_gap"),
          r2(sum(coalesce(col("rate"), lit(0.0)))).as("sum_rate"))
        .orderBy("user_id")
    }),

    // ---- next-event training pairs (ORACLE) -----------------------------
    // Sequence-dataset construction for a next-action model: per user in
    // deterministic event order (ts, event_id), each event becomes a
    // (prev2 > prev1 -> next) example once two predecessors exist; the
    // query reports the top-25 context->label patterns. One user-keyed
    // window pass (two lags ride the same sort), then a 125-key-bounded
    // aggregate — at 100 TB the example-emission is a per-partition
    // projection, and only the pattern census shuffles.
    "q_next_event_pairs" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("p1", lag(col("event_type"), 1).over(w))
        .withColumn("p2", lag(col("event_type"), 2).over(w))
        .filter(col("p2").isNotNull)
        .groupBy(col("p2"), col("p1"), col("event_type").as("next_event"))
        .agg(count(lit(1)).as("n_examples"))
        .orderBy(col("n_examples").desc, col("p2"), col("p1"), col("next_event"))
        .limit(25)
    }),

    // ---- time-to-convert distribution (ORACLE) --------------------------
    // The latency-funnel classic: per user, micros from FIRST view to
    // the first purchase at-or-after it, censused into 10-minute
    // buckets. Two shuffles keyed by user (first-view aggregate, then
    // the purchase confirm join) and a k-bounded bucket rollup — the
    // histogram form deliberately avoids a global percentile sort
    // (exact global percentiles go through ShardedRank,
    // q_percentile_global); deltas are exact epoch-microsecond
    // integers, so every bound is bit-portable.
    "q_time_to_convert" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("vmin"))
      ev.filter(col("event_type") === "purchase")
        .join(v, "user_id")
        .filter(col("ts") >= col("vmin"))
        .groupBy(col("user_id"), col("vmin"))
        .agg(min(unix_micros(col("ts"))).as("pmin"))
        .withColumn("delta_us", col("pmin") - unix_micros(col("vmin")))
        .groupBy(expr("delta_us div 600000000").as("bucket_10m"))
        .agg(count(lit(1)).as("n_users"),
          min(col("delta_us")).as("min_us"), max(col("delta_us")).as("max_us"))
        .orderBy("bucket_10m")
    }),

    // ---- Holt double-exponential smoothing forecast (ORACLE) ------------
    // The trend-aware forecasting classic next to EWMA/seasonal-
    // decompose: per user, level+trend recursions (α=0.3, β=0.1) over
    // the time-ordered cent series, seeded the textbook way (l₂=v₂,
    // t₂=v₂−v₁), one-step forecast = l+t. Shape: ONE shuffle keyed by
    // user collects each series (array_sort on (ts, id) structs — no
    // window), then a single `aggregate` HOF fold runs row-locally —
    // per-key state is two doubles, the BSP-friendly form of a
    // recursive filter. Floats are safe here because BOTH engines fold
    // the identical per-user sequence with the identical op order
    // (DuckDB list_reduce mirrors the lambda literally) — bit-equal
    // chains, r3 only at the end; never an order-dependent SUM.
    "q_holt_forecast" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .groupBy("user_id")
        .agg(expr("transform(array_sort(collect_list(struct(ts, event_id, cents))), p -> p.cents)")
          .as("vals"))
        .filter(size(col("vals")) >= 2)
        .withColumn("st", expr(
          "aggregate(slice(vals, 3, size(vals) - 2), " +
            "named_struct('l', CAST(element_at(vals, 2) AS DOUBLE), " +
            "'t', CAST(element_at(vals, 2) - element_at(vals, 1) AS DOUBLE)), " +
            "(acc, x) -> named_struct(" +
            "'l', 0.3D * CAST(x AS DOUBLE) + 0.7D * (acc.l + acc.t), " +
            "'t', 0.1D * ((0.3D * CAST(x AS DOUBLE) + 0.7D * (acc.l + acc.t)) - acc.l) + 0.9D * acc.t))"))
        .select(col("user_id"), size(col("vals")).cast("long").as("n"),
          r3(col("st.l") + col("st.t")).as("forecast_cents"))
        .orderBy("user_id")
    }),

    // ---- Bradley-Terry preference ranking (ORACLE) ----------------------
    // The preference-data aggregation a reward-model pipeline runs over
    // pairwise comparisons: consecutive same-user events form a
    // comparison between their two event types (winner = higher value;
    // value ties break to the lexicographically smaller type), and two
    // Bradley-Terry MM iterations rank the types:
    // p_i ← W_i / Σ_j n_ij/(p_i+p_j), from a uniform start. The
    // corpus-scale work is ONE lag window (user-keyed) + ONE pair-census
    // aggregate; the solver then runs on the k²-bounded directed-pair
    // matrix (two tiny self-joins — at any corpus scale the item set is
    // the model-output vocabulary, not the corpus). EVERY arithmetic
    // step is integer: ratings live in micro-units and each MM term is
    // one `div` of exact BIGINTs (term-level floor, mirrored literally
    // in the oracle), so the fixpoint is bit-exact cross-engine — no
    // float ever enters. (BIGINT headroom: n·10¹² needs n < 9·10⁶
    // comparisons per pair; past that, scale the numerator down or use
    // DECIMAL(38).)
    "q_pref_bradley_terry" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val cmp = Tables.events(s, d)
        .withColumn("pt", lag(col("event_type"), 1).over(w))
        .withColumn("pv", lag(col("value"), 1).over(w))
        .filter(col("pt").isNotNull && col("pt") =!= col("event_type"))
        .withColumn("winner",
          when(col("value") > col("pv") ||
            (col("value") === col("pv") && col("event_type") < col("pt")),
            col("event_type")).otherwise(col("pt")))
        .withColumn("loser",
          when(col("winner") === col("event_type"), col("pt"))
            .otherwise(col("event_type")))
      // directed pair matrix: one row per ordered (i, j), games + wins
      val dir = cmp
        .select(col("winner").as("i"), col("loser").as("j"), lit(1L).as("win"))
        .unionAll(cmp.select(col("loser").as("i"), col("winner").as("j"),
          lit(0L).as("win")))
        .groupBy("i", "j")
        .agg(count(lit(1)).as("n"), sum(col("win")).as("w"))
        .localCheckpoint(true) // k²-bounded; cut the corpus lineage once
      def iterate(p: org.apache.spark.sql.DataFrame) = dir
        .join(p.select(col("i"), col("p").as("pi")), "i")
        .join(p.select(col("i").as("j"), col("p").as("pj")), "j")
        .groupBy("i")
        .agg(sum(col("w")).as("bigw"), sum(col("n")).as("games"),
          sum(expr("n * 1000000000000 div (pi + pj)")).as("dd"))
        .select(col("i"), col("games"), col("bigw"),
          expr("bigw * 1000000000000 div dd").as("p"))
      val p0 = dir.select(col("i")).distinct()
        .select(col("i"), lit(1000000L).as("p"))
      val p2 = iterate(iterate(p0))
      p2.select(col("i").as("event_type"), col("games"), col("bigw").as("wins"),
        col("p").as("rating_micro")).orderBy("event_type")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_json_funcs" ->
      ("SELECT event_type, floor(avg(k) * 100.0 + 0.5) / 100.0 AS avg_k, max(k) AS max_k, count(*) AS n " +
        "FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t " +
        "GROUP BY event_type ORDER BY event_type"),
    "q_join_asof" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events " +
        "WHERE event_type IN ('click', 'purchase')), " +
        "p AS (SELECT * FROM e WHERE event_type = 'purchase'), " +
        "c AS (SELECT * FROM e WHERE event_type = 'click'), " +
        "m AS (SELECT p.user_id, epoch_us(p.ts) - epoch_us(c.ts) AS gap_us " +
        "FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts > c.ts) " +
        "SELECT CAST(user_id % 10 AS BIGINT) AS bucket, count(*) AS n_matched, " +
        "floor(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1000000.0 * 100.0 + 0.5) / 100.0 AS avg_gap_sec " +
        "FROM m GROUP BY bucket ORDER BY bucket"),
    "q_asof_tolerance" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events " +
        "WHERE event_type IN ('click', 'purchase')), " +
        "p AS (SELECT * FROM e WHERE event_type = 'purchase'), " +
        "c AS (SELECT * FROM e WHERE event_type = 'click'), " +
        "m AS (SELECT p.user_id, epoch_us(p.ts) - epoch_us(c.ts) AS gap_us " +
        "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts > c.ts) " +
        "SELECT CAST(user_id % 10 AS BIGINT) AS bucket, count(*) AS n_purchases, " +
        "CAST(sum(CASE WHEN gap_us IS NOT NULL AND gap_us <= 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched_1h, " +
        "CAST(sum(CASE WHEN gap_us IS NOT NULL AND gap_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_expired, " +
        "CAST(sum(CASE WHEN gap_us IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched, " +
        "CASE WHEN sum(CASE WHEN gap_us IS NOT NULL AND gap_us <= 3600000000 THEN 1 ELSE 0 END) > 0 THEN " +
        "floor(CAST(sum(CASE WHEN gap_us IS NOT NULL AND gap_us <= 3600000000 THEN gap_us ELSE 0 END) AS DOUBLE) " +
        "/ CAST(sum(CASE WHEN gap_us IS NOT NULL AND gap_us <= 3600000000 THEN 1 ELSE 0 END) AS DOUBLE) " +
        "/ 1000000.0 * 100.0 + 0.5) / 100.0 END AS avg_gap_sec " +
        "FROM m GROUP BY bucket ORDER BY bucket"),
    "q_asof_custom" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events " +
        "WHERE event_type IN ('click', 'purchase')), " +
        "p AS (SELECT * FROM e WHERE event_type = 'purchase'), " +
        "c AS (SELECT * FROM e WHERE event_type = 'click'), " +
        "m AS (SELECT p.user_id, epoch_us(p.ts) - epoch_us(c.ts) AS gap_us " +
        "FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts > c.ts) " +
        "SELECT CAST(user_id % 10 AS BIGINT) AS bucket, count(*) AS n_matched, " +
        "floor(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1000000.0 * 100.0 + 0.5) / 100.0 AS avg_gap_sec " +
        "FROM m GROUP BY bucket ORDER BY bucket"),
    "q_tumbling_1h" ->
      ("SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start, " +
        "event_type, count(*) AS n, round(sum(value), 2) AS sum_val " +
        "FROM events GROUP BY 1, event_type ORDER BY window_start, event_type"),
    "q_sliding_1h_15m" ->
      ("WITH e AS (SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS b15, value FROM events), " +
        "x AS (SELECT b15 - (INTERVAL '15 minutes' * k) AS ws, value FROM e, (SELECT unnest([0, 1, 2, 3]) AS k) ks) " +
        "SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, count(*) AS n, round(sum(value), 2) AS sum_val " +
        "FROM x GROUP BY ws ORDER BY window_start"),
    "q_funnel" ->
      ("WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events), " +
        "v AS (SELECT user_id, min(ts) AS mv FROM ev WHERE event_type = 'view' GROUP BY user_id), " +
        "c AS (SELECT e.user_id, min(e.ts) AS mc FROM ev e JOIN v ON e.user_id = v.user_id " +
        "WHERE e.event_type = 'click' AND e.ts > v.mv GROUP BY e.user_id), " +
        "p AS (SELECT e.user_id, min(e.ts) AS mp FROM ev e JOIN c ON e.user_id = c.user_id " +
        "WHERE e.event_type = 'purchase' AND e.ts > c.mc GROUP BY e.user_id), " +
        "u AS (SELECT '1_view' AS stage, user_id FROM v " +
        "UNION ALL SELECT '2_click', user_id FROM c " +
        "UNION ALL SELECT '3_purchase', user_id FROM p) " +
        "SELECT stage, count(*) AS n_users FROM u GROUP BY stage ORDER BY stage"),
    "q_json_schema" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
        "floor(max(value) * 100.0 + 0.5) / 100.0 AS max_v " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q_resample_locf" ->
      ("WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value, " +
        "date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day FROM events WHERE user_id < 20), " +
        "daily AS (SELECT user_id, day, value AS close FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) AS rn FROM e) t " +
        "WHERE rn = 1), " +
        "cal AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM " +
        "(SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id) sp), " +
        "f AS (SELECT c.user_id, c.day, d.close FROM cal c LEFT JOIN daily d USING (user_id, day)) " +
        "SELECT user_id, CAST(day AS BIGINT) AS day, " +
        "floor(last_value(close IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100.0 + 0.5) / 100.0 AS close " +
        "FROM f ORDER BY user_id, day"),
    "q_event_transitions" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events), " +
        "b AS (SELECT event_type, lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_type FROM e), " +
        "g AS (SELECT prev_type, event_type, count(*) AS n FROM b WHERE prev_type IS NOT NULL GROUP BY 1, 2) " +
        "SELECT prev_type, event_type, n, " +
        "floor(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS p " +
        "FROM g ORDER BY prev_type, event_type"),
    "q_cohort_retention" ->
      ("WITH sm AS (SELECT user_id, CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week " +
        "FROM events WHERE md5(CAST(event_id AS VARCHAR)) < '1'), " +
        "c AS (SELECT user_id, week, min(week) OVER (PARTITION BY user_id) AS cohort_week FROM sm), " +
        "dd AS (SELECT DISTINCT cohort_week, week - cohort_week AS week_offset, user_id FROM c), " +
        "g AS (SELECT cohort_week, week_offset, count(*) AS active_users FROM dd GROUP BY 1, 2), " +
        "z AS (SELECT *, max(CASE WHEN week_offset = 0 THEN active_users END) OVER (PARTITION BY cohort_week) AS cohort_size FROM g) " +
        "SELECT cohort_week, week_offset, active_users, cohort_size, " +
        "floor(CAST(active_users AS DOUBLE) * 100.0 / CAST(cohort_size AS DOUBLE) * 100.0 + 0.5) / 100.0 AS retention_pct " +
        "FROM z ORDER BY cohort_week, week_offset"),
    "q_scd2" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events), " +
        "v AS (SELECT event_type, us, lead(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS next_us FROM e), " +
        "g AS (SELECT event_type, count(*) AS n_versions, " +
        "CAST(sum(CASE WHEN next_us IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_open, " +
        "CAST(sum(next_us - us) AS BIGINT) AS sum_dur_us FROM v GROUP BY event_type) " +
        "SELECT event_type, n_versions, n_open, sum_dur_us, " +
        "CASE WHEN n_versions - n_open > 0 THEN " +
        "floor(CAST(sum_dur_us AS DOUBLE) / CAST(n_versions - n_open AS DOUBLE) / 1000000.0 * 100.0 + 0.5) / 100.0 " +
        "ELSE NULL END AS avg_closed_sec FROM g ORDER BY event_type"),
    "q_scd_latest" ->
      ("SELECT user_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str, " +
        "floor(value * 100.0 + 0.5) / 100.0 AS value_r FROM (" +
        "SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
        "FROM events) t WHERE rn = 1 ORDER BY user_id"),
    "q_sessions_concurrent" ->
      ("WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events), " +
        "f AS (SELECT user_id, event_id, epoch_us(ts) AS us, CASE WHEN lag(epoch_us(ts)) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) IS NULL OR " +
        "epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000 " +
        "THEN 1 ELSE 0 END AS new_s FROM e), " +
        "g AS (SELECT user_id, us, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f), " +
        "sess AS (SELECT user_id, sid, min(us) AS s_us, max(us) AS e_us FROM g GROUP BY 1, 2), " +
        "segs AS (SELECT user_id, sid, s_us, e_us, unnest(generate_series(" +
        "CAST(make_timestamp(s_us) AS DATE), CAST(make_timestamp(e_us) AS DATE), INTERVAL 1 DAY)) AS dayts FROM sess), " +
        "seg2 AS (SELECT CAST(dayts AS DATE) AS day, " +
        "greatest(s_us, epoch_us(CAST(CAST(dayts AS DATE) AS TIMESTAMP))) AS seg_s, " +
        "least(e_us, epoch_us(CAST(CAST(dayts AS DATE) AS TIMESTAMP)) + 86399999999) AS seg_e FROM segs), " +
        "deltas AS (SELECT day, seg_s AS us, 1 AS delta FROM seg2 " +
        "UNION ALL SELECT day, seg_e + 1, -1 FROM seg2), " +
        "sw AS (SELECT day, delta, sum(delta) OVER (PARTITION BY day ORDER BY us " +
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc FROM deltas) " +
        "SELECT strftime(CAST(day AS TIMESTAMP), '%Y-%m-%d') AS day, " +
        "CAST(max(conc) AS BIGINT) AS peak_concurrent, " +
        "CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_segments " +
        "FROM sw GROUP BY 1 ORDER BY day"),
    "q_session_conversion" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events), " +
        "f AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us, CASE WHEN lag(epoch_us(ts)) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) IS NULL OR " +
        "epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000 " +
        "THEN 1 ELSE 0 END AS new_s FROM e), " +
        "g AS (SELECT user_id, event_type, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f), " +
        "sess AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_ev, " +
        "CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS conv " +
        "FROM g GROUP BY 1, 2), " +
        "b AS (SELECT CASE WHEN n_ev <= 1 THEN '1' WHEN n_ev <= 4 THEN '2-4' " +
        "WHEN n_ev <= 9 THEN '5-9' ELSE '10+' END AS size_bucket, conv FROM sess) " +
        "SELECT size_bucket, count(*) AS n_sessions, CAST(sum(conv) AS BIGINT) AS n_converted, " +
        "floor((CAST(sum(conv) AS DOUBLE) * 100.0 / CAST(count(*) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS conv_pct " +
        "FROM b GROUP BY 1 ORDER BY size_bucket"),
    "q_gap_dist" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, CAST(ts AS TIMESTAMP) AS t FROM events), " +
        "g AS (SELECT us - lag(us) OVER (PARTITION BY user_id ORDER BY t, event_id) AS gap_us FROM e), " +
        "s AS (SELECT gap_us // 1000000 AS gap_s FROM g WHERE gap_us IS NOT NULL), " +
        "b AS (SELECT gap_s, CAST(length(CAST(gap_s AS VARCHAR)) AS BIGINT) AS gap_digits FROM s) " +
        "SELECT gap_digits, count(*) AS n_gaps, min(gap_s) AS min_s, max(gap_s) AS max_s, " +
        "floor((CAST(sum(gap_s) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS avg_s " +
        "FROM b GROUP BY 1 ORDER BY gap_digits"),
    "q_first_last_touch" ->
      ("WITH p AS (SELECT user_id, event_id AS pid, CAST(ts AS TIMESTAMP) AS pts, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS cts FROM events WHERE event_type = 'click'), " +
        "t AS (SELECT p.user_id, p.pid, p.pts, p.cents, min(c.cts) AS first_t, max(c.cts) AS last_t " +
        "FROM p JOIN c ON p.user_id = c.user_id AND c.cts <= p.pts GROUP BY 1, 2, 3, 4), " +
        "f AS (SELECT datediff('day', DATE '1970-01-01', CAST(first_t AS DATE)) % 7 AS wd, " +
        "count(*) AS n_first, CAST(sum(cents) AS BIGINT) AS first_cents FROM t GROUP BY 1), " +
        "l AS (SELECT datediff('day', DATE '1970-01-01', CAST(last_t AS DATE)) % 7 AS wd, " +
        "count(*) AS n_last, CAST(sum(cents) AS BIGINT) AS last_cents FROM t GROUP BY 1) " +
        "SELECT CAST(coalesce(f.wd, l.wd) AS BIGINT) AS wd, coalesce(n_first, 0) AS n_first, " +
        "coalesce(first_cents, 0) AS first_cents, coalesce(n_last, 0) AS n_last, " +
        "coalesce(last_cents, 0) AS last_cents " +
        "FROM f FULL JOIN l ON f.wd = l.wd ORDER BY wd"),
    "q_merge_upsert" ->
      ("WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value, event_id FROM events), " +
        "t AS (SELECT user_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str, " +
        "floor(value * 100.0 + 0.5) / 100.0 AS value_r FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
        "FROM e WHERE ts < TIMESTAMP '2024-04-01') x WHERE rn = 1), " +
        "dl AS (SELECT user_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str, " +
        "floor(value * 100.0 + 0.5) / 100.0 AS value_r FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
        "FROM e WHERE ts >= TIMESTAMP '2024-04-01') x WHERE rn = 1), " +
        "m AS (SELECT * FROM t WHERE user_id NOT IN (SELECT user_id FROM dl) " +
        "UNION ALL SELECT * FROM dl) " +
        "SELECT user_id, event_type, ts_str, value_r FROM m ORDER BY user_id"),
    // integer RANGE frame keyed on epoch-day distance; identical
    // floor-snap cents and division chain
    "q_rolling_7d" ->
      ("WITH p AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS dday, " +
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events WHERE event_type = 'purchase'), " +
        "g AS (SELECT dday, CAST(sum(cents) AS BIGINT) AS day_cents, count(*) AS n_purch FROM p GROUP BY 1), " +
        "w AS (SELECT dday, n_purch, day_cents, " +
        "CAST(sum(day_cents) OVER fr AS BIGINT) AS roll7_cents, " +
        "CAST(count(*) OVER fr AS BIGINT) AS roll7_days " +
        "FROM (SELECT *, date_diff('day', DATE '1970-01-01', dday) AS day_num FROM g) t " +
        "WINDOW fr AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) " +
        "SELECT strftime(dday, '%Y-%m-%d') AS day, n_purch, day_cents, roll7_cents, roll7_days, " +
        "floor(CAST(roll7_cents AS DOUBLE) / CAST(roll7_days AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS roll7_avg_usd " +
        "FROM w ORDER BY day"),
    // DuckDB's native ASOF JOIN is backward-only, so the oracle mirrors
    // the forward window construction (purchase-first tie order keeps
    // the match strictly later)
    "q_asof_forward" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, " +
        "CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END AS purchase_ts, " +
        "CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS tag " +
        "FROM events WHERE event_type IN ('click', 'purchase')), " +
        "w AS (SELECT *, first_value(purchase_ts IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY ts, tag, event_id " +
        "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np FROM e) " +
        "SELECT CAST(user_id % 10 AS BIGINT) AS bucket, count(*) AS n_matched, " +
        "floor(CAST(sum(epoch_us(np) - epoch_us(ts)) AS DOUBLE) / count(*) / 1000000.0 * 100.0 + 0.5) / 100.0 AS avg_gap_sec " +
        "FROM w WHERE event_type = 'click' AND np IS NOT NULL " +
        "GROUP BY 1 ORDER BY bucket"),
    "q_ewma" ->
      ("SELECT event_id, user_id, floor(ewma_c / 100.0 * 100.0 + 0.5) / 100.0 AS ewma FROM (" +
        "SELECT event_id, user_id, " +
        (0 to 9).map(j => s"coalesce(CAST(lag(cents, $j) OVER w AS DOUBLE), 0.0) * ${math.pow(0.5, j)}")
          .mkString(" + ") + " AS ewma_c " +
        "FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events) e " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t ORDER BY event_id"),
    "q_dow_hour" ->
      ("SELECT dow, hr, count(*) AS n_events, " +
        "floor(CAST(sum(cents) AS DOUBLE) / count(*) / 100.0 * 100.0 + 0.5) / 100.0 AS avg_value FROM (" +
        "SELECT ((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) % 7 + 7) % 7 AS dow, " +
        "CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events) t " +
        "GROUP BY dow, hr ORDER BY dow, hr"),
    "q_resample_linear" ->
      ("WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, CAST(round(value * 100) AS BIGINT) AS cents, 0 AS is_grid FROM events), " +
        "g AS (SELECT user_id, unnest(generate_series(date_trunc('hour', t0) + INTERVAL 1 HOUR, date_trunc('hour', t1), INTERVAL 1 HOUR)) AS ts " +
        "FROM (SELECT user_id, min(ts) AS t0, max(ts) AS t1 FROM e GROUP BY user_id) b), " +
        "g24 AS (SELECT user_id, ts, CAST(NULL AS BIGINT) AS cents, 1 AS is_grid FROM " +
        "(SELECT user_id, ts, row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn FROM g) x WHERE rn <= 24), " +
        "m AS (SELECT *, epoch_us(ts) AS tus FROM (SELECT * FROM e UNION ALL SELECT * FROM g24) u), " +
        "f AS (SELECT user_id, ts, is_grid, tus, " +
        "last_value(CASE WHEN is_grid = 0 THEN cents END IGNORE NULLS) OVER wp AS c0, " +
        "last_value(CASE WHEN is_grid = 0 THEN tus END IGNORE NULLS) OVER wp AS t0, " +
        "first_value(CASE WHEN is_grid = 0 THEN cents END IGNORE NULLS) OVER wn AS c1, " +
        "first_value(CASE WHEN is_grid = 0 THEN tus END IGNORE NULLS) OVER wn AS t1 " +
        "FROM m WINDOW wp AS (PARTITION BY user_id ORDER BY tus, is_grid ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), " +
        "wn AS (PARTITION BY user_id ORDER BY tus, is_grid ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
        "SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS grid_ts, " +
        "floor(CAST(ic AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS value_interp FROM (" +
        "SELECT user_id, ts, CASE WHEN t1 = t0 THEN c0 ELSE " +
        "CAST((CAST(c0 AS HUGEINT) * (t1 - tus) + CAST(c1 AS HUGEINT) * (tus - t0)) // (t1 - t0) AS BIGINT) END AS ic " +
        "FROM f WHERE is_grid = 1) z ORDER BY user_id, grid_ts"),
    "q_json_tuple" ->
      ("SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k, " +
        "floor(CAST(sum(k) AS DOUBLE) / count(*) * 100.0 + 0.5) / 100.0 AS avg_k " +
        "FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t " +
        "GROUP BY event_type ORDER BY event_type"),
    "q_cohort_ltv" ->
      ("WITH ev AS (SELECT user_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents, " +
        "date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk FROM events), " +
        "cohort AS (SELECT user_id, min(wk) AS cwk FROM ev GROUP BY user_id) " +
        "SELECT CAST(cwk AS BIGINT) AS cohort_week, CAST(wk - cwk AS BIGINT) AS weeks_since, " +
        "count(DISTINCT e.user_id) AS n_buyers, count(*) AS n_purchases, CAST(sum(cents) AS BIGINT) AS cents " +
        "FROM ev e JOIN cohort c ON e.user_id = c.user_id WHERE event_type = 'purchase' " +
        "GROUP BY cwk, wk - cwk ORDER BY cohort_week, weeks_since"),
    "q_asof_nearest" ->
      ("WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tus, " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p FROM events WHERE event_type IN ('click', 'purchase')), " +
        "f AS (SELECT event_id, user_id, is_p, tus, " +
        "last_value(CASE WHEN is_p = 0 THEN tus END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tus, is_p, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_t, " +
        "first_value(CASE WHEN is_p = 0 THEN tus END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tus, is_p, event_id ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_t " +
        "FROM ev) " +
        "SELECT event_id, user_id, dir, floor(CAST(gap_us AS DOUBLE) / 1000000.0 * 100.0 + 0.5) / 100.0 AS gap_sec FROM (" +
        "SELECT event_id, user_id, " +
        "CASE WHEN prev_t IS NULL AND next_t IS NULL THEN 'none' " +
        "WHEN next_t IS NULL OR (prev_t IS NOT NULL AND tus - prev_t <= next_t - tus) THEN 'back' ELSE 'fwd' END AS dir, " +
        "CASE WHEN prev_t IS NULL AND next_t IS NULL THEN NULL " +
        "WHEN next_t IS NULL OR (prev_t IS NOT NULL AND tus - prev_t <= next_t - tus) THEN tus - prev_t ELSE next_t - tus END AS gap_us " +
        "FROM f WHERE is_p = 1) z ORDER BY event_id"),
    "q_variant_extract" ->
      ("SELECT CAST(((k % 7) + 7) % 7 AS BIGINT) AS k_mod, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k, " +
        "min(k) AS min_k, max(k) AS max_k " +
        "FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t " +
        "GROUP BY 1 ORDER BY k_mod"),
    "q_try_arith" ->
      ("WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events WHERE event_type = 'purchase'), " +
        "g AS (SELECT user_id, cents - lag(cents, 1) OVER w AS dc, " +
        "epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS dt " +
        "FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "r AS (SELECT user_id, dc, CASE WHEN dt // 1000000 = 0 THEN NULL " +
        "ELSE CAST(dc AS DOUBLE) / CAST(dt // 1000000 AS DOUBLE) END AS rate FROM g) " +
        "SELECT user_id, count(*) AS n, " +
        "CAST(sum(CASE WHEN rate IS NULL AND dc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_gap, " +
        "floor(sum(coalesce(rate, 0.0)) * 100.0 + 0.5) / 100.0 AS sum_rate " +
        "FROM r GROUP BY user_id ORDER BY user_id"),
    "q_next_event_pairs" ->
      ("WITH s AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events), " +
        "l AS (SELECT event_type, lag(event_type, 1) OVER w AS p1, lag(event_type, 2) OVER w AS p2 " +
        "FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
        "SELECT p2, p1, event_type AS next_event, count(*) AS n_examples " +
        "FROM l WHERE p2 IS NOT NULL GROUP BY p2, p1, next_event " +
        "ORDER BY n_examples DESC, p2, p1, next_event LIMIT 25"),
    "q_holt_forecast" ->
      ("WITH e AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events), " +
        "s AS (SELECT user_id, list(cents ORDER BY ts, event_id) AS vals FROM e GROUP BY 1), " +
        "h AS (SELECT user_id, len(vals) AS n, " +
        // list-valued fold state [l, t]: DuckDB's list_reduce evaluates a
        // STRUCT accumulator's fields sequentially against the already-
        // mutated acc (measured: coupled recursions silently corrupt),
        // while list elements evaluate against the original acc
        "list_reduce(list_concat([[CAST(vals[2] AS DOUBLE), CAST(vals[2] - vals[1] AS DOUBLE)]], " +
        "list_transform(vals[3:], x -> [CAST(x AS DOUBLE), 0.0e0])), " +
        "(acc, x) -> [0.3e0 * x[1] + 0.7e0 * (acc[1] + acc[2]), " +
        "0.1e0 * ((0.3e0 * x[1] + 0.7e0 * (acc[1] + acc[2])) - acc[1]) + 0.9e0 * acc[2]]) AS st " +
        "FROM s WHERE len(vals) >= 2) " +
        "SELECT user_id, CAST(n AS BIGINT) AS n, floor((st[1] + st[2]) * 1000.0 + 0.5) / 1000.0 AS forecast_cents " +
        "FROM h ORDER BY user_id"),
    "q_time_to_convert" ->
      ("WITH v AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS vmin FROM events WHERE event_type = 'view' GROUP BY 1), " +
        "dd AS (SELECT v.user_id AS user_id, min(epoch_us(CAST(e.ts AS TIMESTAMP))) - epoch_us(vmin) AS delta_us " +
        "FROM v JOIN events e ON e.user_id = v.user_id AND e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= vmin " +
        "GROUP BY v.user_id, vmin) " +
        "SELECT delta_us // 600000000 AS bucket_10m, count(*) AS n_users, " +
        "min(delta_us) AS min_us, max(delta_us) AS max_us " +
        "FROM dd GROUP BY 1 ORDER BY bucket_10m"),
    "q_pref_bradley_terry" ->
      ("WITH seq AS (SELECT event_type, value, user_id, event_id, " +
        "lag(event_type) OVER w AS pt, lag(value) OVER w AS pv FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)), " +
        "cmp AS (SELECT CASE WHEN value > pv OR (value = pv AND event_type < pt) THEN event_type ELSE pt END AS winner, " +
        "CASE WHEN value > pv OR (value = pv AND event_type < pt) THEN pt ELSE event_type END AS loser " +
        "FROM seq WHERE pt IS NOT NULL AND pt <> event_type), " +
        "dirpairs AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n, CAST(sum(win) AS BIGINT) AS w FROM (" +
        "SELECT winner AS i, loser AS j, 1 AS win FROM cmp " +
        "UNION ALL SELECT loser, winner, 0 FROM cmp) u GROUP BY i, j), " +
        "p1 AS (SELECT i, sum(w) * 1000000000000 // sum(n * 1000000000000 // 2000000) AS p FROM dirpairs GROUP BY i), " +
        "it2 AS (SELECT d.i AS i, CAST(sum(d.w) AS BIGINT) AS wins, CAST(sum(d.n) AS BIGINT) AS games, " +
        "CAST(sum(d.w) * 1000000000000 // sum(d.n * 1000000000000 // (pi.p + pj.p)) AS BIGINT) AS p " +
        "FROM dirpairs d JOIN p1 pi ON d.i = pi.i JOIN p1 pj ON d.j = pj.i GROUP BY d.i) " +
        "SELECT i AS event_type, games, wins, p AS rating_micro FROM it2 ORDER BY event_type"),
  )
}
