package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One group of declared queries (SURVEY.md §2). Each concrete object
  * contributes entries to SparkEntry.queries / SparkEntry.oracleSql.
  *
  * Output discipline shared by every query (SURVEY §7.3 — the Spark
  * result is hash-compared against DuckDB running `oracleSql` on the
  * same parquet inputs, so both sides must agree bit-for-bit):
  *   - explicit projection with stable aliases, identical dtypes
  *     (computed integers cast to BIGINT on both sides);
  *   - every float output rounded (2dp; similarity scores 3dp); sums of
  *     large double columns are scaled down (e.g. /1e6) before rounding
  *     so accumulation-order noise can't flip a cent-level boundary;
  *   - timestamps/dates formatted to strings (sidesteps parquet
  *     isAdjustedToUTC vs DuckDB TIMESTAMP representation drift);
  *   - total ORDER BY over a unique key, identical in both engines;
  *   - no dropDuplicates/first() row-picks.
  */
trait QueryGroup {
  type QFn = (SparkSession, String) => DataFrame
  def queries: Map[String, QFn]
  def oracleSql: Map[String, String]

  /** Engine-independent 3dp rounding: floor(x*1000 + 0.5)/1000. Each step
    * is a single IEEE-754 op, so identical input bits give identical output
    * bits in any engine — unlike round(x,3), whose half-way semantics
    * differ between Spark (decimal-string HALF_UP) and DuckDB versions.
    * Only valid when both engines hold the SAME double (e.g. values read
    * straight from parquet, or single-op derivations) — aggregated sums may
    * differ in the last ulp and need exact integer arithmetic instead.
    * DuckDB mirror: floor(x*1000.0 + 0.5)/1000.0  */
  def r3(c: Column): Column = floor(c * lit(1000.0) + lit(0.5)) / lit(1000.0)

  /** 2dp variant of the same engine-independent rounding. REQUIRED for
    * any rounded ratio of exact integers (avg of counts, µs/1e6, …):
    * such ratios land exactly on the x.xx5 half-grid often (41/40 =
    * 1.025), where Spark's round() (shortest-decimal-string HALF_UP,
    * 1.025 -> 1.03) and DuckDB's (binary x*100 rounding, 1.0249999… ->
    * 1.02) disagree — caught live by q_session_30m at sf0.1.
    * DuckDB mirror: floor(x*100.0 + 0.5)/100.0 */
  def r2(c: Column): Column = floor(c * lit(100.0) + lit(0.5)) / lit(100.0)

  /** Whitespace class identical in Java regex and RE2 (DuckDB). Java's \s
    * includes U+000B vertical tab, RE2's does not — this explicit class
    * sidesteps the dialect gap. */
  val wsRegex = "[ \\t\\n\\r\\f]+"

  /** date-valued timestamp -> 'yyyy-MM-dd' (DuckDB: strftime(x,'%Y-%m-%d')) */
  def fmtDate(c: Column): Column = date_format(c, "yyyy-MM-dd")
  /** timestamp -> 'yyyy-MM-dd HH:mm:ss' (DuckDB: strftime(x,'%Y-%m-%d %H:%M:%S')) */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
