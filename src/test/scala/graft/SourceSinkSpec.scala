package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SURVEY §2.1 sinks/sources beyond parquet: CSV and JSON write+read
  * round-trips preserve schema and values (parquet writing itself is
  * exercised by Verify on every query). */
class SourceSinkSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString + "/out"

  test("csv round-trip preserves values with explicit schema") {
    val dir = tmp("csv")
    val src = Tables.nation(spark, sf0001).orderBy("n_nationkey")
    src.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(src.schema).csv(dir)
      .orderBy("n_nationkey")
    assert(back.schema == src.schema)
    assert(back.collect().toSeq == src.collect().toSeq)
  }

  test("json round-trip preserves values") {
    val dir = tmp("json")
    val src = Tables.region(spark, sf0001).orderBy("r_regionkey")
    src.write.json(dir)
    val back = spark.read.schema(src.schema).json(dir).orderBy("r_regionkey")
    assert(back.collect().toSeq == src.collect().toSeq)
  }

  test("shingle index round-trips through parquet and feeds the dedup queries") {
    val dir = tmp("shidx")
    val direct = graft.queries.DedupQueries.queries("q_dedup_ngram")(spark, sf0001)
      .collect().toSeq
    graft.queries.DedupQueries.saveShingleIndex(spark, sf0001, dir)
    graft.queries.DedupQueries.evict(spark)
    graft.queries.DedupQueries.loadShingleIndex(spark, sf0001, dir)
    val viaLoaded = graft.queries.DedupQueries.queries("q_dedup_ngram")(spark, sf0001)
      .collect().toSeq
    assert(viaLoaded == direct, "dedup over the persisted index diverged from the built index")
    graft.queries.DedupQueries.evict(spark) // leave no test-local artifact behind
  }

  test("evict releases a session's memoized dedup artifacts") {
    graft.queries.DedupQueries.queries("q_dedup_clusters")(spark, sf0001).collect()
    assert(graft.queries.DedupQueries.cachedEntries(spark) >= 2,
      "expected shingle index + pair set to be memoized")
    graft.queries.DedupQueries.evict(spark)
    assert(graft.queries.DedupQueries.cachedEntries(spark) == 0)
    // queries still work after eviction (artifacts rebuild on demand)
    assert(graft.queries.DedupQueries.queries("q_dedup_ngram")(spark, sf0001).count() > 0)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp("part")
    Tables.orders(spark, sf0001)
      .withColumn("yr", year(col("o_orderdate")))
      .write.partitionBy("yr").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("yr") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not a post-scan Filter
    assert(pruned.count() ==
      Tables.orders(spark, sf0001).filter(year(col("o_orderdate")) === 1995).count())
    assert(plan.contains("PartitionFilters: [isnotnull(yr"), s"no partition pruning:\n$plan")
  }

  test("predicate pushdown reaches the parquet scan") {
    val plan = Tables.orders(spark, sf0001)
      .filter(col("o_totalprice") > 400000.0)
      .select("o_orderkey", "o_totalprice")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,400000.0)]"),
      s"pushdown missing:\n$plan")
  }
}
