package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row-numbering over a total order — the scale-safe
  * replacement for `Window.orderBy(...)` (whose empty PARTITION BY
  * funnels the whole corpus through one reducer; the single worst
  * scale-killer a window query can have).
  *
  * Plan shape — ONE corpus-scale shuffle, no corpus-scale window:
  *   1. `repartitionByRange(shards, sortCols)` — each shard holds a
  *      contiguous, non-overlapping range of the sort order;
  *   2. main branch: `sortWithinPartitions` (parallel per-shard sorts)
  *      + `monotonically_increasing_id()`, which by contract is
  *      `(partitionId << 33) + rowIndexWithinPartition` evaluated in
  *      output order of the sort below it (the id is non-deterministic,
  *      so Catalyst cannot reorder it below the sort) — decoding the id
  *      yields the shard id AND the 1-based local row number with no
  *      second shuffle and no window;
  *   3. census branch: per-shard row counts straight off the same range
  *      exchange (groupBy `spark_partition_id()`, no sort needed —
  *      counts don't depend on intra-shard order) → exclusive prefix
  *      sums via a window over that `shards`-row census → broadcast
  *      joined back, so `global rn = shard offset + local rn`.
  *
  * Correct for ANY boundary choice RangePartitioner's sampling makes:
  * offsets come from the actual per-shard counts, not from the sampled
  * split points, so skewed or unlucky sampling affects only balance,
  * never the numbering. The one remaining `Window.orderBy` consumes the
  * `shards`-row census — k-bounded by construction (PlanSweepSpec
  * allowlists it).
  */
object ShardedRank {

  // Checkpointed range exchanges awaiting release: the eager
  // localCheckpoint pins the ranged data in executor storage, and
  // nothing would ever drop it (driver GC holds the Dataset via the
  // consumer's plan). Consumers that KNOW their action finished call
  // [[flush]] — the identity writer after its commit, Verify/Bench
  // after each query's action. Note localCheckpoint is non-reliable:
  // an executor lost mid-consumption fails the consuming job rather
  // than recomputing (documented cost of the pinned determinism).
  private val live =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  /** Unpersist every checkpointed range exchange registered since the
    * last flush. Call ONLY after the consuming action completed — a
    * plan still holding one of these cannot recompute it. */
  def flush(): Unit = {
    var r = live.poll()
    while (r != null) { r.unpersist(blocking = false); r = live.poll() }
  }

  /** Adds `rnCol` (1-based global row number, long) and `nCol` (total
    * row count, long) for the total order given by `sortCols`. The sort
    * order MUST be total (tie-break on a unique key) or numbering across
    * equal keys is partition-dependent. Output row order is unspecified.
    */
  def withRowNumber(df: DataFrame, rnCol: String, nCol: String, sortCols: Column*): DataFrame = {
    val shards = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // The range exchange is MATERIALIZED (eager localCheckpoint) so the
    // main and census branches read the SAME shard assignment.
    // RangePartitioner's boundary sampling is seeded by the RDD id — a
    // fresh id per evaluation — so two evaluations of the exchange pick
    // DIFFERENT boundaries and the census offsets stop matching the
    // main branch's partitions (observed: duplicate + gapped row
    // numbers whenever the consumer is a WRITE, where exchange reuse
    // does not kick in the way it does under one action). Exchange
    // reuse is an optimization, not a guarantee; the checkpoint makes
    // the consistency unconditional. Cost: one materialization of the
    // ranged data to executor storage — the honest price of a
    // deterministic two-pass numbering at any scale.
    val ranged = df.repartitionByRange(shards, sortCols: _*).localCheckpoint(true)
    ranged.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => live.add(lr.rdd)
      case _ => // checkpoint plan shape changed — nothing to track
    }
    val local = ranged
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__lrn", col("__mid").bitwiseAND(lit((1L << 33) - 1)) + 1L)
      .drop("__mid")
    val census = ranged
      .groupBy(spark_partition_id().cast("long").as("__pid"))
      .agg(count(lit(1)).as("__c"))
    val wPid = Window.orderBy("__pid")
    val offsets = census
      .withColumn("__off",
        coalesce(sum(col("__c")).over(wPid.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(nCol,
        sum(col("__c")).over(wPid.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__pid"), col("__off"), col(nCol))
    local.join(broadcast(offsets), "__pid")
      .withColumn(rnCol, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
  }
}
