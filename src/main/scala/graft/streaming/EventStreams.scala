package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, MapState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import java.sql.Timestamp

/** SURVEY §2.10 — the true Structured Streaming surface (the batch-
  * checkable window/session queries live in EventQueries; these are the
  * stream-native transforms, exercised by StreamingSpec with
  * MemoryStream since the driver's Verify harness is batch-only).
  *
  * All transforms take an already-streaming DataFrame with the `events`
  * schema (event_id long, user_id long, event_type string, ts timestamp,
  * value double) so tests can feed MemoryStream and production can feed
  * spark.readStream — the logic is source-agnostic.
  *
  * Scale notes (100 TB/day streams): every aggregation keys its state by
  * (window, event_type) or user_id, so state shards across executors;
  * watermarks bound state size (late data dropped, session state
  * timed out); no global state anywhere.
  */
object EventStreams {

  /** 1-hour tumbling counts per event type; 10-minute watermark drops
    * late rows and lets Spark evict window state. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_val"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_val"))

  /** 1-hour windows sliding every 15 minutes (each event lands in 4). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("n"))

  /** Exactly-once-per-id stream dedup, state bounded by the watermark. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Built-in session windows: 30-minute gap, per user. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_val"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_val"))

  /** Stream-static enrichment: join the event stream against a static
    * dimension (broadcast by the planner — no stream-side shuffle, the
    * standard shape for joining a 100 TB/day stream to reference data). */
  def enrich(events: DataFrame, dims: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dims), Seq(key), "left")

  /** Stream-stream interval join — click attribution: each purchase
    * joins clicks by the same user within the preceding 30 minutes.
    * Both sides carry watermarks and the join condition bounds event
    * time on BOTH ends, so Spark can size the state store exactly:
    * click state is evicted once the purchase-side watermark passes
    * click_ts + 30min — the canonical bounded-state stream join. State
    * shards by user_id (the equi-key), no global coordination.
    *
    * joinType "inner" = attributed purchases only; "leftOuter" = every
    * purchase, unattributed ones emitted with null click columns once the
    * click-side watermark proves no match can still arrive — the shape
    * for "conversion + organic" reporting where losing unmatched
    * purchases is wrong. */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    p.join(c, expr(
      """p_user = c_user AND
         click_ts <= purchase_ts AND
         click_ts >= purchase_ts - INTERVAL 30 MINUTES"""), joinType)
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** Checkpointed exactly-once file pipeline: JSON-lines in, parquet out,
    * duplicate event_ids dropped with the dedup state held in the
    * checkpoint. Trigger.AvailableNow drains whatever input exists and
    * stops; a later restart with the SAME checkpoint resumes from the
    * recorded source offsets and dedup state — already-seen files are
    * never reprocessed and already-emitted ids never re-emitted (the
    * parquet sink's _spark_metadata log keeps readers off partial
    * output). This is the batch-cadence deployment shape for continuous
    * ingest at 100 TB: each invocation is an incremental idempotent
    * drain, schedulable like a batch job. */
  def exactlyOnceDrain(spark: SparkSession, inDir: String, outDir: String,
                       ckptDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
      .json(inDir)
      .dropDuplicates("event_id")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** foreachBatch sink: micro-batches handed to arbitrary batch logic
    * (upserts, multi-sink fanout). The handler receives (batchDf, epoch);
    * exactly-once comes from idempotent writes keyed by epoch. */
  def toForeachBatch(events: DataFrame, handler: (DataFrame, Long) => Unit)
  : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch(handler)

  case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** Running per-user totals via mapGroupsWithState (Update mode): one
    * emitted row per user per micro-batch, state = one small record —
    * the continuously-maintained aggregate shape (dashboard counters,
    * rate limits). Complements the Append-mode flatMapGroupsWithState
    * sessionizer below; processing-time state, no timeout (bound state
    * in production with a TTL timeout or key expiry). */
  def runningTotals(events: Dataset[Ev]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double), UserTotal](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { e => n += 1; v += e.value }
          state.update((n, v))
          UserTotal(user, n, v)
      }
  }

  // --- custom stateful sessionization (flatMapGroupsWithState) -----------

  case class Ev(event_id: Long, user_id: Long, event_type: String, ts: Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                        n_events: Long, sum_val: Double)

  private val GapMs = 30L * 60L * 1000L

  /** Custom sessionizer demonstrating arbitrary stateful processing:
    * emits a session when a 30-minute gap elapses (event-time timeout).
    * State is one small record per active user — shards by user_id. */
  def customSessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum))
          } else {
            // fold this micro-batch's rows (in event-time order) into the
            // session state, emitting closed sessions on 30-min gaps
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= GapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + GapMs)
            }
            closed.result().iterator
          }
      }
  }

  // --- transformWithState (Spark 4 arbitrary-state API) -------------------

  case class UserProfile(user_id: Long, n_events: Long, total_value: Double, n_types: Long)

  /** Continuously-maintained per-user profile on the transformWithState
    * API — the Spark 4 successor to map/flatMapGroupsWithState. The point
    * of the new API is COMPOSITE named state: this processor keeps a
    * ValueState (running count/sum) AND a MapState (per-event-type
    * counts) under one key, where GroupState forces everything into a
    * single encoded value (so touching one counter rewrites the whole
    * blob — at 100 TB/day of events that write amplification is the
    * bottleneck; MapState updates only the touched entry, and each state
    * var is a separate RocksDB column family). State shards by user_id;
    * TTLConfig is the production state-size bound (NONE here — tests
    * drive finite input). Requires the RocksDB state store provider. */
  class ProfileProcessor extends StatefulProcessor[Long, Ev, UserProfile] {
    @transient private var totals: ValueState[(Long, Double)] = _
    @transient private var perType: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState[(Long, Double)](
        "totals", Encoders.product[(Long, Double)], TTLConfig.NONE)
      perType = getHandle.getMapState[String, Long](
        "perType", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[UserProfile] = {
      var (n, v) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { e =>
        n += 1; v += e.value
        val c = if (perType.containsKey(e.event_type)) perType.getValue(e.event_type) else 0L
        perType.updateValue(e.event_type, c + 1L)
      }
      totals.update((n, v))
      Iterator.single(UserProfile(user, n, v, perType.keys().size.toLong))
    }
  }

  /** One profile row per user per micro-batch (Update mode, no timers). */
  def runningProfile(events: Dataset[Ev]): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor, TimeMode.None(), OutputMode.Update)
  }

  /** The 30-minute-gap sessionizer on transformWithState EVENT-TIME
    * TIMERS — same semantics as [[customSessionize]], but gap expiry is
    * an explicit registered timer (fires when the watermark passes
    * last + 30 min) handled in handleExpiredTimer, instead of
    * GroupStateTimeout's single implicit per-key timeout. Explicit
    * timers are the API's second capability step: a processor can keep
    * MANY timers per key (session close + daily rollup + TTL sweep),
    * where the old API allows exactly one. Stale timers are deleted on
    * every session extension so state holds one live timer per user. */
  class SessionProcessor extends StatefulProcessor[Long, Ev, SessionOut] {
    @transient private var sess: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    private def close(user: Long, s: SessionState): SessionOut =
      SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var cur = if (sess.exists()) Option(sess.get()) else None
      val closed = Seq.newBuilder[SessionOut]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= GapMs =>
            cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
          case Some(s) =>
            closed += close(user, s)
            cur = Some(SessionState(t, t, 1L, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1L, e.value))
        }
      }
      cur.foreach { s =>
        sess.update(s)
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(s.last + GapMs)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] =
      if (sess.exists()) {
        val s = sess.get()
        sess.clear()
        Iterator.single(close(user, s))
      } else Iterator.empty
  }

  /** Append-mode sessionization with explicit event-time timers. */
  def sessionizeTws(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor, TimeMode.EventTime(), OutputMode.Append)
  }

  case class RecentAvg(user_id: Long, n_window: Long, avg_recent: Double)

  /** Bounded recent-window buffer on ListState — the third state
    * primitive (ValueState/MapState covered by ProfileProcessor, timers
    * by SessionProcessor): keep each user's last N event values in
    * arrival order and emit their running average. ListState appends
    * WITHOUT deserializing the existing buffer (RocksDB merge-op), which
    * is the point at scale — a GroupState Vector would rewrite the whole
    * buffer per event. The trim-on-overflow keeps state O(N) per key. */
  class RecentProcessor(n: Int) extends StatefulProcessor[Long, Ev, RecentAvg] {
    @transient private var recent: ListState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[Double](
        "recent", Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[RecentAvg] = {
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        .foreach(e => recent.appendValue(e.value))
      val buf = recent.get().toArray
      val keep = buf.takeRight(n)
      if (keep.length < buf.length) recent.put(keep)
      Iterator.single(RecentAvg(user, keep.length.toLong, keep.sum / keep.length))
    }
  }

  /** One (user, rolling avg over last 3 values) row per micro-batch. */
  def recentAverages(events: Dataset[Ev]): Dataset[RecentAvg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RecentProcessor(3), TimeMode.None(), OutputMode.Update)
  }

  /** Running totals BOOTSTRAPPED from a batch snapshot — the
    * backfill-then-stream deployment shape: a historical batch aggregate
    * seeds per-key state once at query start (handleInitialState), and
    * the stream continues from there instead of recounting history.
    * The initial-state side is a KeyValueGroupedDataset, so the seed
    * join shards by key like everything else. */
  class BootstrappedTotals
    extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
      Long, Ev, UserTotal, UserTotal] {
    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)](
        "totals", Encoders.product[(Long, Double)], TTLConfig.NONE)

    override def handleInitialState(user: Long, seed: UserTotal,
                                    tv: TimerValues): Unit =
      totals.update((seed.n_events, seed.total_value))

    override def handleInputRows(user: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[UserTotal] = {
      var (n, v) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { e => n += 1; v += e.value }
      totals.update((n, v))
      Iterator.single(UserTotal(user, n, v))
    }
  }

  /** Update-mode running totals seeded from `snapshot` (a batch
    * aggregate with the same key). */
  def bootstrappedTotals(events: Dataset[Ev],
                         snapshot: Dataset[UserTotal]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new BootstrappedTotals, TimeMode.None(), OutputMode.Update,
        snapshot.groupByKey(_.user_id))
  }
}
