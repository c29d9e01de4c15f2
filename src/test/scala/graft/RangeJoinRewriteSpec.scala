package graft

import graft.plans.RangeJoinRewrite
import org.apache.spark.sql.functions._

/** The RangeJoinRewrite optimizer rule: fires on pure range joins
  * (equi-join planned, exact results vs the unrewritten form), declines
  * on joins that already carry an equi key, and stays exact at strict /
  * non-strict bounds and interval edges. */
class RangeJoinRewriteSpec extends SparkSpec {

  private def intervals = {
    import spark.implicits._
    // [lo, hi) windows over a small numeric domain, including touching
    // and overlapping intervals
    Seq((0L, 0L, 10L), (1L, 10L, 20L), (2L, 15L, 40L), (3L, 40L, 41L))
      .toDF("iv_id", "lo", "hi")
  }

  private def points = {
    import spark.implicits._
    (0L to 60L).map(i => (i, i % 7)).toDF("p", "tag")
  }

  test("pure range join plans as an equi-join on the bucket key, results exact") {
    RangeJoinRewrite.install(spark)
    val joined = points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "iv_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join not rewritten:\n$plan")
    assert(plan.contains("graft_bucket"), s"bucket key missing from plan:\n$plan")
    // reference semantics computed driver-side
    val expected = (for {
      p <- 0L to 60L
      (iv, lo, hi) <- Seq((0L, 0L, 10L), (1L, 10L, 20L), (2L, 15L, 40L), (3L, 40L, 41L))
      if p >= lo && p < hi
    } yield (p, iv)).sorted
    val actual = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(actual == expected, s"rewritten join changed results")
  }

  test("strict bounds stay strict through the rewrite") {
    RangeJoinRewrite.install(spark)
    val joined = points.join(intervals, col("p") > col("lo") && col("p") <= col("hi"))
      .select("p", "iv_id")
    val expected = (for {
      p <- 0L to 60L
      (iv, lo, hi) <- Seq((0L, 0L, 10L), (1L, 10L, 20L), (2L, 15L, 40L), (3L, 40L, 41L))
      if p > lo && p <= hi
    } yield (p, iv)).sorted
    val actual = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(actual == expected)
  }

  test("reversed intervals contribute zero matches instead of crashing the sequence") {
    RangeJoinRewrite.install(spark)
    import spark.implicits._
    // hi < lo by more than one bucket width: the naive BNLJ emits no rows
    // for such dirty intervals; the rewritten plan must do the same, not
    // throw 'Illegal sequence boundaries'
    val dirty = Seq((0L, 5000000000000L, 0L), (1L, 10L, 20L)).toDF("iv_id", "lo", "hi")
    val joined = points.join(dirty, col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "iv_id")
    assert(joined.queryExecution.executedPlan.toString.contains("graft_bucket"))
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val expected = (10L until 20L).map(p => (p, 1L)).sorted
    assert(got == expected, s"got $got")
  }

  test("declines when the join already has an equi key (hash join untouched)") {
    RangeJoinRewrite.install(spark)
    val joined = points.join(intervals,
      col("tag") === col("iv_id") && col("p") >= col("lo") && col("p") < col("hi"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(!plan.contains("graft_bucket"),
      s"rule fired on an equi-join — it must leave hash joins alone:\n$plan")
  }

  test("timestamp range join buckets via unix_micros") {
    RangeJoinRewrite.install(spark)
    import spark.implicits._
    val facts = Seq(("2024-01-05", 1L), ("2024-02-10", 2L), ("2024-03-01", 3L))
      .toDF("d", "fact_id").select(col("fact_id"), col("d").cast("timestamp").as("ts"))
    val ivs = Seq(("2024-01-01", "2024-02-01", 10L), ("2024-02-01", "2024-03-01", 20L))
      .toDF("s", "e", "iv_id")
      .select(col("iv_id"), col("s").cast("timestamp").as("ts_s"), col("e").cast("timestamp").as("ts_e"))
    val joined = facts.join(ivs, col("ts") >= col("ts_s") && col("ts") < col("ts_e"))
      .select("fact_id", "iv_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bucket"), s"timestamp form not rewritten:\n$plan")
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L)), s"got $got")
  }
}
