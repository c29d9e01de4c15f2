package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling building blocks for 100 TB aggregations/joins (SURVEY
  * §7.5): AQE's skew-join splitting covers sort-merge joins at runtime,
  * but a hot GROUP BY key still funnels one reducer. Salting splits each
  * hot key into `buckets` sub-keys for the partial phase and re-combines
  * in a second (tiny) phase — the classic two-stage combine.
  *
  * The salt must be deterministic (derived from row content, not rand())
  * so re-runs and retried tasks agree — important both for the DuckDB
  * oracle discipline and for Spark task retry semantics at scale.
  */
object SkewUtils {

  /** Two-phase salted sum/count aggregation over a possibly-skewed key.
    *
    * @param df       input
    * @param key      grouping column name
    * @param saltFrom deterministic per-row column used to derive the salt
    * @param buckets  sub-keys per hot key (≈ max reducer fan-in reduction)
    * @param valueCol column to aggregate
    * @return (key, n, sum_val) — identical to a direct groupBy, but the
    *         wide shuffle distributes each key over `buckets` reducers
    */
  def saltedSumCount(df: DataFrame, key: String, saltFrom: Column,
                     buckets: Int, valueCol: String): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltFrom), lit(buckets.toLong)))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__sum"))
    partial.groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__sum")).as("sum_val"))
  }
}
