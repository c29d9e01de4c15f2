package graft

/** The spark.sql(...) entry path: Tables.registerViews exposes every
  * corpus table and the native functions, so ad-hoc SQL — including
  * graft_cosine and multi-table joins — runs without touching the
  * DataFrame API. */
class SqlSurfaceSpec extends SparkSpec {

  test("registered views serve multi-table SQL with pushdown intact") {
    Tables.registerViews(spark, sf0001)
    val rows = spark.sql(
      """SELECT c_mktsegment, count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 100000.0
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum > 0)
  }

  test("native graft_cosine is callable from SQL") {
    Tables.registerViews(spark, sf0001)
    val rows = spark.sql(
      """SELECT vec_id,
        |       graft_cosine(CAST(embedding AS ARRAY<DOUBLE>),
        |                    CAST(embedding AS ARRAY<DOUBLE>)) AS self_cos
        |FROM embeddings LIMIT 5""".stripMargin).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"self-cosine must be 1.0: $r"))
  }

  test("lakehouse TVFs: version args honored, filters push to the parquet scan") {
    import org.apache.spark.sql.functions.col
    graft.functions.LakeScanTvf.register(spark)
    val base = "/tmp/graft_sql_tvf/delta"
    val W = graft.sources.DeltaLogWriter
    def kv(vals: (Long, Long)*) = spark.createDataFrame(vals).toDF("id", "v").coalesce(1)
    W.create(spark, kv(1L -> 10L, 2L -> 20L), base, "t-tvf")
    W.append(spark, kv(3L -> 30L), base)
    // version pinning straight from SQL text
    assert(spark.sql(s"SELECT sum(v) FROM delta_scan('$base', 0)")
      .head().getLong(0) == 30L)
    assert(spark.sql(s"SELECT sum(v) FROM delta_scan('$base')")
      .head().getLong(0) == 60L)
    // the TVF contributes the reader's plan as a view: a WHERE lands on
    // the parquet source as a pushed filter, not a post-scan residual
    val q = spark.sql(s"SELECT id FROM delta_scan('$base') WHERE v > 15")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(v,15)"),
      s"filter did not reach the scan:\n$plan")
    // non-literal args are rejected with a real message, not misplanned
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM delta_scan('$base', id)").collect())
    assert(e.getMessage.contains("delta_scan") || e.getMessage.contains("UNRESOLVED"),
      e.getMessage)
    // hudi + iceberg spellings resolve through the same registry
    assert(spark.sessionState.tableFunctionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("iceberg_scan")))
    assert(spark.sessionState.tableFunctionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("hudi_scan")))
  }

  test("events view carries the micro-truncated timestamp") {
    Tables.registerViews(spark, sf0001)
    val n = spark.sql(
      "SELECT count(*) FROM events WHERE ts IS NOT NULL").collect()(0).getLong(0)
    assert(n > 0)
  }

  test("DDL: CREATE TABLE USING parquet + INSERT + CREATE VIEW resolve through the catalog") {
    val db = "graft_sql_ddl"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '/tmp/graft_sql_ddl.db'")
    try {
      spark.sql(s"DROP TABLE IF EXISTS $db.kv")
      // a crashed PREVIOUS run can leave managed files the fresh
      // in-memory catalog has no entry to drop (same guard as
      // q_catalog_table) — clear the orphaned location first
      val loc = new org.apache.hadoop.fs.Path("/tmp/graft_sql_ddl.db/kv")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      spark.sql(s"CREATE TABLE $db.kv (k BIGINT, v STRING) USING parquet")
      spark.sql(s"INSERT INTO $db.kv VALUES (1, 'a'), (2, 'b'), (3, 'a')")
      spark.sql(s"CREATE OR REPLACE VIEW $db.kv_counts AS " +
        s"SELECT v, count(*) AS n FROM $db.kv GROUP BY v")
      val rows = spark.sql(s"SELECT v, n FROM $db.kv_counts ORDER BY v")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows == Seq(("a", 2L), ("b", 1L)))
      // INSERT appends through the same committed-file protocol
      spark.sql(s"INSERT INTO $db.kv VALUES (4, 'b')")
      assert(spark.sql(s"SELECT n FROM $db.kv_counts WHERE v = 'b'")
        .collect()(0).getLong(0) == 2L)
    } finally {
      spark.sql(s"DROP VIEW IF EXISTS $db.kv_counts")
      spark.sql(s"DROP TABLE IF EXISTS $db.kv")
    }
  }
}
