package graft

import graft.functions.SkewUtils
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation: equivalence with the direct groupBy and
  * the partial-phase fan-out that makes it worth doing. */
class SkewUtilsSpec extends SparkSpec {

  test("salted sum/count equals direct groupBy on a skewed column") {
    val events = Tables.events(spark, sf0001)
    val salted = SkewUtils.saltedSumCount(events, "event_type", col("event_id"), 8, "value")
      .withColumn("sum_val", round(col("sum_val"), 2))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_val"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(n == direct(k)._1, s"$k count")
      // sums re-associate across salt buckets: allow cent-level tolerance
      assert(math.abs(s - direct(k)._2) <= 0.02, s"$k sum $s vs ${direct(k)._2}")
    }
  }

  test("partial phase fans each key out over the salt buckets") {
    val events = Tables.events(spark, sf0001)
    val fanout = events
      .withColumn("__salt", pmod(xxhash64(col("event_id")), lit(8L)))
      .groupBy("event_type", "__salt").count()
      .groupBy("event_type").count()
      .collect().map(_.getLong(1))
    assert(fanout.forall(_ > 1), "salt produced no fan-out")
  }

  test("salt is deterministic across runs (retry-safe)") {
    val events = Tables.events(spark, sf0001)
    def run() = SkewUtils.saltedSumCount(events, "event_type", col("event_id"), 8, "value")
      .orderBy("event_type").collect().toSeq
    assert(run() == run())
  }
}
