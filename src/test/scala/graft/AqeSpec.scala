package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Proves the engine composes with Spark's runtime re-planning (AQE) —
  * the third leg of the 100 TB skew story next to explicit salting
  * (q_join_salted) and the skew audit (q_skew_report): on a real
  * cluster, AQE is the mitigation that needs NO code change, so this
  * spec pins that (a) a skewed shuffle join is actually split at
  * runtime, (b) undersized shuffle partitions are coalesced, and
  * (c) both re-plans preserve row-level results exactly.
  *
  * AQE confs are runtime-settable; each test snapshots and restores
  * them so the shared session is unaffected.
  */
class AqeSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs[A](confs: (String, String)*)(body: => A): A = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** 1 hot key carrying half the rows + a uniform tail — the shape that
    * stalls one reducer in a static plan. */
  private def skewedLeft: DataFrame =
    spark.range(0, 50000).select(
      when(col("id") < 25000, 0L).otherwise(col("id")).as("k"),
      col("id").as("payload"))

  private def smallRight: DataFrame =
    spark.range(0, 200).select(col("id").as("k"), (col("id") * 7).as("w"))

  private def finalPlan(df: DataFrame) = {
    df.collect() // AQE finalizes only on execution
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("AQE splits the skewed join partition at runtime") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // the fixture is tiny, so make the skew detector fire at test scale
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    ) {
      val joined = skewedLeft.join(smallRight, "k")
      // QueryStageExec wrappers are leaves, so string-match the rendered
      // final plan rather than collect() (which cannot descend into them)
      val plan = finalPlan(joined).toString
      assert(plan.contains("skew=true") && plan.contains("skewed"),
        s"expected a runtime skew-split join in:\n$plan")
      // the re-planned join is still exact: equal to the static plan
      val aqeRows = joined.groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      withConfs("spark.sql.adaptive.enabled" -> "false") {
        val staticRows = skewedLeft.join(smallRight, "k")
          .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(aqeRows == staticRows, "AQE skew split changed results")
      }
    }
  }

  test("AQE coalesces undersized shuffle partitions") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8MB",
      "spark.sql.shuffle.partitions" -> "32",
    ) {
      // a k-key aggregate whose 32 shuffle partitions are all far below
      // the advisory size — AQE must fuse them down
      val agg = spark.range(0, 10000)
        .select((col("id") % 50).as("k")).groupBy("k").count()
      val plan = finalPlan(agg).toString
      assert(plan.contains("AQEShuffleRead coalesced"),
        s"expected a coalesced AQEShuffleRead in:\n$plan")
      // the runtime partition count is the ground truth for coalescing
      val parts = agg.rdd.getNumPartitions
      assert(parts < 32, s"expected coalescing below 32 partitions, got $parts")
      assert(agg.collect().length == 50)
    }
  }
}
