package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders for the driver-generated parquet corpus
  * (see /root/repo/FIXTURES.md; 10 tables per scale-factor dir).
  *
  * All loads are plain `spark.read.parquet` so Catalyst gets a clean
  * FileSourceScan it can push filters/projections into. The one special
  * case is `events`: depending on the corpus drop, its `ts` column is
  * either parquet TIMESTAMP(NANOS) (read as nanos-long via the legacy
  * conf, then integer-divided to micros) or TIMESTAMP(MICROS)
  * isAdjustedToUTC=false (arrives as TIMESTAMP_NTZ, cast to TimestampType
  * under the UTC session TZ) — see the `events()` scaladoc for why each
  * path is exactly DuckDB's `CAST(ts AS TIMESTAMP)`.
  */
object Tables {
  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    Bootstrap.init(s)
    s.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** events with `ts` normalized to TimestampType microseconds — matching
    * DuckDB `CAST(ts AS TIMESTAMP)` on the same file, whatever the
    * corpus generation wrote:
    *  - parquet TIMESTAMP(NANOS) (earlier corpus drops): read as
    *    nanos-long via the legacy conf, then integer-divide to micros
    *    (never `/1000.0`, which would round instead of truncate and
    *    diverge from DuckDB's truncation);
    *  - parquet TIMESTAMP(MICROS) isAdjustedToUTC=false (current drops):
    *    arrives as TIMESTAMP_NTZ; cast to TimestampType (identity on the
    *    micros value — the session TZ is pinned UTC). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => raw
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case other =>
        // A corrupted regeneration (e.g. string ts) must fail loudly, not
        // silently cast to nulls.
        throw new IllegalStateException(
          s"events.ts has unexpected parquet type $other; expected " +
            "TIMESTAMP(NANOS) [long], TIMESTAMP, or TIMESTAMP_NTZ")
    }
  }

  /** Register every corpus table as a temp view (plus the native
    * functions), so the entire surface is drivable from `spark.sql(...)`
    * — the ad-hoc/BI entry path next to the DataFrame API. Views are
    * lazy: no data is read until a query runs. */
  def registerViews(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(n => t(s, d, n).createOrReplaceTempView(n))
    events(s, d).createOrReplaceTempView("events")
  }
}
