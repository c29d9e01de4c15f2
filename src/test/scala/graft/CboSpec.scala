package graft

import org.apache.spark.sql.functions._

/** Proves the engine composes with Catalyst's cost-based optimizer —
  * the planning-time complement to AqeSpec's runtime re-planning: table
  * statistics from ANALYZE TABLE are (a) actually collected into the
  * catalog, (b) visible to the optimizer as plan statistics, and
  * (c) decisive — a join side the stats prove small gets broadcast
  * WITHOUT an explicit broadcast() hint, which is how a 100 TB catalog
  * picks strategies when humans aren't hand-hinting every query.
  */
class CboSpec extends SparkSpec {

  private def withConfs[A](confs: (String, String)*)(body: => A): A = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANALYZE TABLE stats reach the catalog and the optimizer") {
    val db = "graft_cbo"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Tables.nation(spark, sf0001).write.mode("overwrite")
        .saveAsTable(s"$db.nation_t")
      spark.sql(s"ANALYZE TABLE $db.nation_t COMPUTE STATISTICS")
      val desc = spark.sql(s"DESC EXTENDED $db.nation_t")
        .filter(col("col_name") === "Statistics").collect()
      assert(desc.nonEmpty && desc.head.getString(1).contains("rows"),
        s"expected row-count statistics in the catalog, got ${desc.toSeq}")
      // the optimizer sees the same numbers on the plan (row counts are
      // only propagated into plan statistics when CBO is on)
      withConfs("spark.sql.cbo.enabled" -> "true") {
        val stats = spark.table(s"$db.nation_t")
          .queryExecution.optimizedPlan.stats
        assert(stats.rowCount.exists(_.toLong == 25L),
          s"optimizer row count should be 25, got ${stats.rowCount}")
      }
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("stats-proven-small join side broadcasts without a hint under CBO") {
    val db = "graft_cbo2"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Tables.orders(spark, sf0001).write.mode("overwrite")
        .saveAsTable(s"$db.orders_t")
      Tables.customer(spark, sf0001).write.mode("overwrite")
        .saveAsTable(s"$db.customer_t")
      spark.sql(s"ANALYZE TABLE $db.orders_t COMPUTE STATISTICS")
      spark.sql(s"ANALYZE TABLE $db.customer_t COMPUTE STATISTICS")
      withConfs(
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true",
        // make the threshold tight enough that only the stats-known-small
        // customer table qualifies
        "spark.sql.autoBroadcastJoinThreshold" -> "1MB",
      ) {
        val joined = spark.table(s"$db.orders_t")
          .join(spark.table(s"$db.customer_t"), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment").count()
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin"),
          s"expected a stats-driven broadcast join in:\n$plan")
        assert(joined.collect().map(_.getLong(1)).sum == 1500L)
      }
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }
}
