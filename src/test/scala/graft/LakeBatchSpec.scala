package graft

import org.apache.spark.sql.functions._

import graft.sources.{DeltaLogWriter, HudiWriter, IcebergWriter}

/** Batch DSv2 front doors (`spark.read.format("graft-delta" | ...)`):
  * the scan must stay Spark's OWN parquet scan — pushdown, pruning,
  * vectorization — and the refusal guards must fire rather than
  * mis-read DV/mapped tables. */
class LakeBatchSpec extends SparkSpec {

  private def mkBase(name: String): String = {
    val base = s"/tmp/graft_lakebatch_test/$name"
    graft.sources.TxnLog.rmrf(base)
    base
  }

  private def plane() = spark.range(0, 100).select(
    col("id"), (col("id") % 7).as("x"),
    when(col("id") % 2 === 0, "even").otherwise("odd").as("p"))

  test("graft-delta: format read, pushdown + pruning reach the parquet scan, time travel") {
    val base = mkBase("delta")
    DeltaLogWriter.create(spark, plane().repartition(2), base, "t")
    DeltaLogWriter.append(spark, spark.range(100, 120).select(
      col("id"), (col("id") % 7).as("x"),
      lit("odd").as("p")).coalesce(1), base)
    val df = spark.read.format("graft-delta").option("path", base).load()
      .filter(col("id") < 50).select("x")
    assert(df.count() == 50L)
    val plan = df.queryExecution.executedPlan.toString
    // the DSv2 parquet scan carries the pushed filter and prunes to the
    // referenced columns — the whole point of delegating to ParquetTable
    assert(plan.contains("PushedFilters: [IsNotNull(id), LessThan(id,50)]"), plan)
    assert(plan.contains("ReadSchema: struct<id:bigint,x:bigint>"), plan)
    // time travel rides an option
    assert(spark.read.format("graft-delta").option("path", base)
      .option("versionAsOf", "0").load().count() == 100L)
    // whole-stage codegen spans the scan (vectorized input)
    assert(plan.linesIterator.exists(_.trim.startsWith("*")), plan)
  }

  test("graft-delta refuses DV and column-mapped tables instead of mis-reading") {
    val dvBase = mkBase("delta_dv")
    DeltaLogWriter.create(spark, plane().coalesce(1), dvBase, "t")
    DeltaLogWriter.deleteWhereDv(spark, dvBase, col("id") < 5)
    val e = intercept[IllegalArgumentException](
      spark.read.format("graft-delta").option("path", dvBase).load())
    assert(e.getMessage.contains("deletion vectors"))
    val cmBase = mkBase("delta_cm")
    DeltaLogWriter.createColumnMapped(spark, plane().coalesce(1), cmBase, "t")
    val e2 = intercept[IllegalArgumentException](
      spark.read.format("graft-delta").option("path", cmBase).load())
    assert(e2.getMessage.contains("column-mapped"))
  }

  test("graft-iceberg + graft-hudi format reads and the SQL USING surface") {
    val iBase = mkBase("ice")
    IcebergWriter.create(spark, plane().repartition(2), iBase)
    val ice = spark.read.format("graft-iceberg").option("path", iBase).load()
    assert(ice.filter(col("x") === 3).count() ==
      plane().filter(col("x") === 3).count())
    val hBase = mkBase("hudi")
    HudiWriter.create(spark, plane(), hBase, "t", "id", 4)
    HudiWriter.upsert(spark, spark.range(0, 5).select(
      col("id"), lit(99L).as("x"), lit("even").as("p")), hBase)
    val hudi = spark.read.format("graft-hudi").option("path", hBase).load()
    assert(hudi.filter(col("x") === 99).count() == 5L)
    assert(hudi.count() == 100L)
    // the pure-SQL zero-Scala path
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW lb_ice " +
      s"USING `graft-iceberg` OPTIONS (path '$iBase')")
    assert(spark.sql("SELECT count(*) FROM lb_ice WHERE x = 3").head().getLong(0) ==
      plane().filter(col("x") === 3).count())
    // an Iceberg table with live delete files is refused
    IcebergWriter.deleteWhere(spark, iBase, col("id") < 3)
    val e = intercept[IllegalArgumentException](
      spark.read.format("graft-iceberg").option("path", iBase).load())
    assert(e.getMessage.contains("delete files"))
  }
}
