package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 (the declared query
  * inventory) and §3 (entry points). Each QueryGroup contributes
  * (name -> DataFrame fn) plus, where SQL-expressible, a DuckDB oracle
  * query the driver hash-compares against on the same parquet inputs.
  */
object SparkEntry {

  private val groups: Seq[QueryGroup] = Seq(
    RelationalQueries,
    AggQueries,
    WindowQueries,
    ScalarFuncQueries,
    TextQueries,
    EventQueries,
    UdxQueries,
    DedupQueries,
    TextAnalysisQueries,
    AnnQueries,
    MultimodalQueries,
    VectorQueries,
    AnalyticsQueries,
    StreamQueries,
    LakehouseQueries,
    TpchQueries,
    GovernanceQueries,
    SpanQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape — scan + filter + hash aggregate in one codegen stage. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.queries("q_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (NO-ORACLE queries get a rows-only check + property tests). */
  def oracleSql: Map[String, String] =
    groups.map(_.oracleSql).reduce(_ ++ _)
}
