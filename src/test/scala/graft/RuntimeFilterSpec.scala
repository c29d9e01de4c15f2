package graft

import org.apache.spark.sql.functions._

import graft.queries.RelationalQueries

/** Runtime bloom-filter join pruning (InjectRuntimeFilter): the optimizer
  * leg of the skew/pruning family next to AQE (AqeSpec), DPP
  * (PlanAuditSpec) and CBO (CboSpec). Asserts the filter is actually
  * INJECTED under q_join_runtime_filter's session confs, and that the
  * result is identical with the feature forced off — the filter must be
  * a pure prune, never a semantics change. */
class RuntimeFilterSpec extends SparkSpec {

  test("q_join_runtime_filter injects bloom_filter_might_contain into the probe side") {
    val df = RelationalQueries.queries("q_join_runtime_filter")(spark, sf001)
    // the query materializes eagerly via localCheckpoint while its confs
    // hold; the checkpointed plan no longer shows the filter, so re-run
    // the same shape with the confs set here and inspect the optimized plan
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "-1"); spark.conf.set(keys(1), "-1")
      spark.conf.set(keys(2), "true"); spark.conf.set(keys(3), "0")
      val ord = Tables.orders(spark, sf001)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"))
      val j = Tables.lineitem(spark, sf001)
        .select(col("l_orderkey"), col("l_returnflag"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val optimized = j.queryExecution.optimizedPlan.toString
      // renders as might_contain(scalar-subquery [bloom_filter_agg(...)])
      assert(optimized.contains("might_contain(") &&
        optimized.contains("bloom_filter_agg("),
        s"no runtime bloom filter injected:\n$optimized")
      assert(j.collect().nonEmpty)
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    assert(df.count() == 3)
  }

  test("runtime-filter result equals the feature-off result") {
    val on = RelationalQueries.queries("q_join_runtime_filter")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    val saved = spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled")
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val ord = Tables.orders(spark, sf001)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"))
      val off = Tables.lineitem(spark, sf001)
        .select(col("l_orderkey"), col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("rev_cents"))
        .orderBy("l_returnflag")
        .collect().map(_.toSeq).toSeq
      assert(on == off, s"bloom-filter prune changed results: $on vs $off")
    } finally saved.fold(
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled"))(
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", _))
  }
}
