package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.sources.ParquetFooters

/** The footer-only stats helper that replaced the writers' read-back
  * census jobs (round-13 optimization): counts and integral min/max
  * must equal what the old Spark aggregation computed, including the
  * NULL-skipping rules, and a dynamic-partition stage write's
  * same-basename part files must stay distinguishable (the basename
  * collision that round-13 found in the old `_metadata.file_name`
  * keyed read-back: counts were silently summed across partitions). */
class ParquetFootersSpec extends SparkSpec {

  private def stage(name: String): String = {
    val base = s"/tmp/graft_footers_test/$name"
    graft.sources.TxnLog.rmrf(base)
    Files.createDirectories(Paths.get(base))
    base
  }

  test("statsOf matches the Spark aggregate: count, long/int bounds, null skipping") {
    val base = stage("bounds")
    import spark.implicits._
    val df = Seq(
      (1L, 7, Some(100L)), (2L, -3, None), (3L, 42, Some(-5L)), (4L, 0, Some(99L))
    ).toDF("k", "i32", "optl")
    df.coalesce(1).write.parquet(s"$base/t")
    val file = graft.sources.Fs.list(Paths.get(base, "t")).iterator
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val Some((rows, bounds)) = ParquetFooters.statsOf(file, Seq("k", "i32", "optl"))
    assert(rows == 4L)
    assert(bounds("k") == (1L, 4L))
    assert(bounds("i32") == (-3L, 42L), "int32 bounds widen to long")
    assert(bounds("optl") == (-5L, 100L), "nulls are skipped, not zero")
  }

  test("statsOf: all-NULL column reports no bounds; string column falls back") {
    val base = stage("nulls")
    import spark.implicits._
    Seq((1L, Option.empty[Long], "a"), (2L, Option.empty[Long], "b"))
      .toDF("k", "allnull", "s")
      .coalesce(1).write.parquet(s"$base/t")
    val file = graft.sources.Fs.list(Paths.get(base, "t")).iterator
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val Some((rows, bounds)) = ParquetFooters.statsOf(file, Seq("k", "allnull"))
    assert(rows == 2L)
    assert(bounds.get("allnull").isEmpty, "all-NULL column has no bounds")
    assert(bounds("k") == (1L, 2L))
    // a string stats column is not footer-answerable -> None (callers
    // fall back to the read-back aggregation)
    assert(ParquetFooters.statsOf(file, Seq("s")).isEmpty)
  }

  test("row-tracked partitioned create: same-basename staged files keep distinct counts") {
    // one task writing several partition dirs reuses its part-file NAME
    // across them — createComposed's add actions must carry each FILE's
    // own numRecords (the old basename-keyed read-back summed them)
    val base = "/tmp/graft_footers_test/composed"
    graft.sources.TxnLog.rmrf(base)
    import spark.implicits._
    val df = Seq.tabulate(40)(i => (i.toLong, s"p${i % 4}", i * 10L))
      .toDF("k", "pri", "cents")
    graft.sources.DeltaLogWriter.createComposed(spark, df.coalesce(1), base,
      "footers-composed", partitionBy = Seq("pri"),
      clusterCols = Seq("k"), columnMapped = false, rowTracked = true,
      statsFor = Seq("k"))
    val read = graft.sources.DeltaLogReader.read(spark, base, 0L)
    val ids = graft.sources.DeltaLogReader.readRowIds(spark, base, 0L)
    assert(read.count() == 40L)
    // every add action's numRecords is its own file's count: the sum of
    // per-add ranges equals the table count, and birth ids are unique
    val rowIds = ids.select("_row_id").as[Long].collect().toSeq
    assert(rowIds.distinct.size == 40, s"birth ids not unique: ${rowIds.sorted}")
  }
}
