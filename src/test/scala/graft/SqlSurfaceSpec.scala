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

  test("events view carries the micro-truncated timestamp") {
    Tables.registerViews(spark, sf0001)
    val n = spark.sql(
      "SELECT count(*) FROM events WHERE ts IS NOT NULL").collect()(0).getLong(0)
    assert(n > 0)
  }
}
