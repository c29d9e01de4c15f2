package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Production-observability surfaces: Observation metrics ride the
  * existing job (no second scan — at 100 TB a count-for-monitoring pass
  * is a real cost), and AQE splits skewed join partitions at runtime. */
class ObservabilitySpec extends SparkSpec {

  test("Observation metrics ride the query without a second scan") {
    val obs = Observation("orders_stats")
    val orders = Tables.orders(spark, sf0001)
    val df = orders
      .observe(obs, count(lit(1)).as("rows_seen"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents_seen"))
      .filter(col("o_totalprice") > 100000.0)
    val filtered = df.count()
    val metrics = obs.get
    val total = orders.count()
    assert(metrics("rows_seen") == total,
      s"observe saw ${metrics("rows_seen")} rows, table has $total")
    assert(filtered < total, "filter did nothing — observe point is meaningless")
    assert(metrics("cents_seen").asInstanceOf[Long] > 0L)
  }

  test("AQE splits a skewed join partition at runtime") {
    val s = spark
    import s.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // one hot key carries ~99% of the left side
      val left = s.range(0, 50000)
        .select(when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val right = s.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // collect() drives joined's OWN query execution to the final
      // adaptive plan — count() would build (and finalize) a different one
      val rows = joined.collect()
      // hot key 7 matches all 49500 skewed rows; k=id rows match for the
      // 10 multiples of 100 under 1000
      assert(rows.length == 49510)
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("skew=true"),
        s"AQE did not mark/split the skewed partition:\n$planStr")
    } finally {
      prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
  }
}
