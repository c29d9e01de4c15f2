package graft

import org.apache.spark.sql.functions._

import graft.sources.{DeltaLogReader, DeltaLogWriter}

/** Delta ROW TRACKING (the `rowTracking` + `domainMetadata` writer
  * features): stable `_row_id` / `_row_commit_version` per row —
  * base+position inheritance, the domain high-water mark, DV-delete
  * stability, OPTIMIZE materialization, and checkpoint survival. */
class DeltaRowTrackingSpec extends SparkSpec {

  private def mkBase(name: String): String = {
    val base = s"/tmp/graft_deltart_test/$name"
    graft.sources.TxnLog.rmrf(base)
    base
  }

  private def sorted(n: Long, off: Long = 0L) =
    spark.range(0, n).select((col("id") + off).as("id"))
      .repartition(1).sortWithinPartitions("id")

  test("create: contiguous baseRowId ranges, hwm = total-1, base+position read") {
    val base = mkBase("rt_create")
    DeltaLogWriter.createRowTracked(spark, spark.range(0, 20).toDF("id")
      .repartition(2), base, "rt")
    val adds = DeltaLogReader.snapshotFiles(Some(spark), base, 0L)
      .sortBy(_.baseRowId.get)
    assert(adds.forall(a => a.baseRowId.isDefined &&
      a.defaultRowCommitVersion.contains(0L)))
    // ranges are contiguous and disjoint in file order
    val ranges = adds.map(a => (a.baseRowId.get, a.numRecords))
    assert(ranges.head._1 == 0L)
    ranges.zip(ranges.drop(1)).foreach { case ((b, n), (b2, _)) => assert(b2 == b + n) }
    assert(DeltaLogReader.rowIdHighWaterMark(Some(spark), base, 0L).contains(19L))
    val ids = DeltaLogReader.readRowIds(spark, base, 0L)
      .select("_row_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L to 19L))
  }

  test("append assigns fresh ids above the mark; DV delete keeps survivors' ids") {
    val base = mkBase("rt_dml")
    DeltaLogWriter.createRowTracked(spark, sorted(10), base, "rt")
    DeltaLogWriter.append(spark, sorted(5, off = 100), base)
    assert(DeltaLogReader.rowIdHighWaterMark(Some(spark), base, 1L).contains(14L))
    val byId = DeltaLogReader.readRowIds(spark, base, 1L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("_row_id"), r.getAs[Long]("_row_commit_version"))).toMap
    assert(byId(0L) == (0L, 0L) && byId(9L) == (9L, 0L))
    assert(byId(100L) == (10L, 1L) && byId(104L) == (14L, 1L))
    // DV delete: the re-add must CARRY baseRowId; survivors keep ids
    DeltaLogWriter.deleteWhereDv(spark, base, col("id") % 2 === 0)
    val after = DeltaLogReader.readRowIds(spark, base, 2L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("_row_id")).toMap
    assert(after(1L) == 1L && after(9L) == 9L && after(101L) == 11L)
    assert(!after.contains(0L) && !after.contains(100L))
    // the mark did not move (a DELETE assigns no ids)
    assert(DeltaLogReader.rowIdHighWaterMark(Some(spark), base, 2L).contains(14L))
  }

  test("OPTIMIZE materializes row ids — identical lineage across the rewrite") {
    val base = mkBase("rt_opt")
    DeltaLogWriter.createRowTracked(spark, sorted(12), base, "rt")
    DeltaLogWriter.append(spark, sorted(6, off = 50), base)
    val before = DeltaLogReader.readRowIds(spark, base, 1L)
      .select("id", "_row_id", "_row_commit_version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (nb, na) = DeltaLogWriter.optimize(spark, base)
    assert(nb == 2 && na == 1)
    val adds = DeltaLogReader.snapshotFiles(Some(spark), base, 2L)
    // fresh baseRowId on the packed file, and the mark bumped past it
    assert(adds.forall(_.baseRowId.isDefined))
    assert(adds.head.baseRowId.get == 18L)
    assert(DeltaLogReader.rowIdHighWaterMark(Some(spark), base, 2L).contains(35L))
    val after = DeltaLogReader.readRowIds(spark, base, 2L)
      .select("id", "_row_id", "_row_commit_version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == before) // materialized values win over base+position
    // plain read enforces the LOG schema: materialized cols stay hidden
    val plain = DeltaLogReader.read(spark, base)
    assert(plain.columns.toSeq == Seq("id"))
    assert(plain.count() == 18L)
  }

  test("row ids and the high-water mark survive checkpoint + expireLog (classic and v2)") {
    for ((name, ckpt) <- Seq(
      ("rt_ckpt", (b: String) => DeltaLogWriter.checkpoint(spark, b)),
      ("rt_ckpt2", (b: String) => DeltaLogWriter.checkpointV2(spark, b)))) {
      val base = mkBase(name)
      DeltaLogWriter.createRowTracked(spark, sorted(8), base, "rt")
      DeltaLogWriter.append(spark, sorted(4, off = 70), base)
      DeltaLogWriter.deleteWhereDv(spark, base, col("id") === 3)
      val before = DeltaLogReader.readRowIds(spark, base, 2L)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("_row_id")).toMap
      ckpt(base)
      DeltaLogWriter.expireLog(base)
      val v = DeltaLogReader.latestVersion(base)
      val after = DeltaLogReader.readRowIds(spark, base, v)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("_row_id")).toMap
      assert(after == before, s"$name: lineage drifted across checkpoint+expiry")
      assert(DeltaLogReader.rowIdHighWaterMark(Some(spark), base, v).contains(11L),
        s"$name: high-water mark lost")
      // the next append still assigns FRESH ids (the mark survived)
      DeltaLogWriter.append(spark, sorted(2, off = 90), base)
      val v2 = DeltaLogReader.latestVersion(base)
      val ids = DeltaLogReader.readRowIds(spark, base, v2)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("_row_id")).toMap
      assert(ids(90L) == 12L && ids(91L) == 13L, s"$name: post-expiry ids reused")
    }
  }

  test("CoW rewrites refuse row-tracked tables rather than reassign ids") {
    val base = mkBase("rt_guard")
    DeltaLogWriter.createRowTracked(spark, sorted(5), base, "rt")
    val e = intercept[IllegalArgumentException](
      DeltaLogWriter.deleteWhere(spark, base, col("id") === 1))
    assert(e.getMessage.contains("row-tracked"))
    val e2 = intercept[IllegalArgumentException](
      DeltaLogWriter.update(spark, base, col("id") === 1,
        df => df.withColumn("id", lit(9L))))
    assert(e2.getMessage.contains("row-tracked"))
  }
}
