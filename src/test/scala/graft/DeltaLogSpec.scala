package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.DeltaLogReader

/** The public-spec Delta log reader: action replay (add/remove algebra),
  * version listing, unknown-action skipping, JSON string-escape
  * handling, and the protocol guard. */
class DeltaLogSpec extends SparkSpec {

  private def mkTable(name: String): String = {
    val base = s"/tmp/graft_delta_test/$name"
    graft.sources.TxnLog.rmrf(base)
    Files.createDirectories(Paths.get(base, "_delta_log"))
    base
  }

  private def commit(base: String, v: Long, lines: String*): Unit =
    Files.write(Paths.get(base, "_delta_log", f"$v%020d.json"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))

  private def writeParquet(base: String, rel: String, ids: Seq[Long]): Unit = {
    val tmp = s"$base/.stage"
    spark.createDataFrame(ids.map(Tuple1(_))).toDF("id")
      .coalesce(1).write.parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator()
    var src: java.nio.file.Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) src = p
    }
    Files.move(src, Paths.get(base, rel))
    graft.sources.TxnLog.rmrf(tmp)
  }

  test("replay accumulates adds and drops removes; versions are pinned") {
    val base = mkTable("replay")
    writeParquet(base, "a.parquet", Seq(1L, 2L))
    writeParquet(base, "b.parquet", Seq(3L))
    writeParquet(base, "c.parquet", Seq(4L, 5L, 6L))
    commit(base, 0,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"{}","partitionColumns":[],"configuration":{},"createdTime":0}}""",
      """{"add":{"path":"a.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""",
      """{"add":{"path":"b.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
    commit(base, 1,
      """{"commitInfo":{"operation":"WRITE","someUnknownField":[1,2]}}""",
      """{"add":{"path":"c.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
    commit(base, 2,
      """{"remove":{"path":"a.parquet","deletionTimestamp":0,"dataChange":true}}""")
    assert(DeltaLogReader.versions(base) == Seq(0L, 1L, 2L))
    assert(DeltaLogReader.latestVersion(base) == 2L)
    assert(DeltaLogReader.snapshotFiles(base, 0).map(_.path).sorted == Seq("a.parquet", "b.parquet"))
    assert(DeltaLogReader.snapshotFiles(base, 1).map(_.path).sorted == Seq("a.parquet", "b.parquet", "c.parquet"))
    assert(DeltaLogReader.snapshotFiles(base, 2).map(_.path).sorted == Seq("b.parquet", "c.parquet"))
    // data reads: v1 sees all six ids, v2 only b+c
    assert(DeltaLogReader.read(spark, base, 1).agg(sum("id")).collect().head.getLong(0) == 21L)
    assert(DeltaLogReader.read(spark, base).agg(sum("id")).collect().head.getLong(0) == 18L)
  }

  test("JSON escapes in paths round-trip") {
    assert(DeltaLogReader.strField("""{"add":{"path":"a\/b A\\x\".parquet"}}""", "path")
      .contains("""a/b A\x".parquet"""))
    assert(DeltaLogReader.strField("""{"remove":{"path":"plain.parquet"}}""", "nope").isEmpty)
  }

  test("protocol requiring reader features is rejected, not misread") {
    val base = mkTable("proto")
    commit(base, 0,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}""",
      """{"add":{"path":"x.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
    val e = intercept[IllegalArgumentException](DeltaLogReader.snapshotFiles(base, 0))
    assert(e.getMessage.contains("minReaderVersion"))
  }

  test("hive-layout partitioned table: partition column recovered, pruning intact") {
    val base = mkTable("part")
    Files.createDirectories(Paths.get(base, "p=a"))
    Files.createDirectories(Paths.get(base, "p=b"))
    writeParquet(base, "p=a/f1.parquet", Seq(1L, 2L))
    writeParquet(base, "p=b/f2.parquet", Seq(10L))
    commit(base, 0,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"{}","partitionColumns":["p"],"configuration":{},"createdTime":0}}""",
      """{"add":{"path":"p=a/f1.parquet","partitionValues":{"p":"a"},"size":1,"modificationTime":0,"dataChange":true}}""",
      """{"add":{"path":"p=b/f2.parquet","partitionValues":{"p":"b"},"size":1,"modificationTime":0,"dataChange":true}}""")
    assert(DeltaLogReader.partitionColumns(base, 0) == Seq("p"))
    val df = DeltaLogReader.read(spark, base)
    assert(df.columns.toSet == Set("id", "p"), s"partition column lost: ${df.columns.toSeq}")
    assert(df.filter(col("p") === "b").agg(sum("id")).collect().head.getLong(0) == 10L)
    // the p='b' predicate must prune at partition level, not row level
    val plan = df.filter(col("p") === "b").queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("p#") || scanLine.contains("(p"),
      s"no partition filter pushed: $scanLine")
  }

  test("partitioned table with non-hive paths is rejected, not silently column-dropped") {
    val base = mkTable("partbad")
    writeParquet(base, "f1.parquet", Seq(1L))
    commit(base, 0,
      """{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"{}","partitionColumns":["p"],"configuration":{},"createdTime":0}}""",
      """{"add":{"path":"f1.parquet","partitionValues":{"p":"a"},"size":1,"modificationTime":0,"dataChange":true}}""")
    val e = intercept[IllegalArgumentException](DeltaLogReader.read(spark, base, 0))
    assert(e.getMessage.contains("non-hive"))
  }

  test("checkpoint bounds the replay: vacuumed early commits stay readable") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = mkTable("ckpt")
    writeParquet(base, "a.parquet", Seq(1L, 2L))
    writeParquet(base, "b.parquet", Seq(3L))
    writeParquet(base, "c.parquet", Seq(4L))
    commit(base, 0,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"add":{"path":"a.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""",
      """{"add":{"path":"b.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
    commit(base, 1,
      """{"remove":{"path":"a.parquet","deletionTimestamp":0,"dataChange":true}}""")
    commit(base, 2,
      """{"add":{"path":"c.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
    // spec-shaped checkpoint at v1: one row per live action (protocol +
    // the surviving add), written as ONE parquet file
    val ckptSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType), StructField("size", LongType))))))
    val ckptRows = Seq(Row(Row(1), null), Row(null, Row("b.parquet", 1L)))
    val tmp = s"$base/.ckpt-stage"
    spark.createDataFrame(spark.sparkContext.parallelize(ckptRows, 1), ckptSchema)
      .coalesce(1).write.parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator()
    var src: java.nio.file.Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) src = p
    }
    Files.move(src, Paths.get(base, "_delta_log", f"${1L}%020d.checkpoint.parquet"))
    graft.sources.TxnLog.rmrf(tmp)
    Files.writeString(Paths.get(base, "_delta_log", "_last_checkpoint"),
      """{"version":1,"size":2}""")
    // checkpoint + tail equals full replay
    assert(DeltaLogReader.snapshotFiles(Some(spark), base, 2).map(_.path).sorted
      == Seq("b.parquet", "c.parquet"))
    // time travel BELOW the checkpoint ignores it (full replay of 0..0)
    assert(DeltaLogReader.snapshotFiles(Some(spark), base, 0).map(_.path).sorted
      == Seq("a.parquet", "b.parquet"))
    assert(DeltaLogReader.read(spark, base, 2).agg(sum("id")).collect().head.getLong(0) == 7L)
    // vacuum the pre-checkpoint commits: checkpointed reads keep working,
    // pre-checkpoint time travel now (correctly) fails
    Files.delete(Paths.get(base, "_delta_log", f"${0L}%020d.json"))
    assert(DeltaLogReader.read(spark, base, 2).agg(sum("id")).collect().head.getLong(0) == 7L)
    intercept[IllegalArgumentException](
      DeltaLogReader.snapshotFiles(Some(spark), base, 0))
  }

  test("non-contiguous log fails fast") {
    val base = mkTable("gap")
    commit(base, 0, """{"commitInfo":{}}""")
    commit(base, 2, """{"commitInfo":{}}""")
    val e = intercept[IllegalArgumentException](DeltaLogReader.versions(base))
    assert(e.getMessage.contains("non-contiguous"))
  }

  test("writer round-trip: create + append produce versions the reader replays") {
    val base = "/tmp/graft_delta_test/writer"
    val df1 = spark.createDataFrame(Seq(1L, 2L, 3L).map(Tuple1(_))).toDF("id")
    val df2 = spark.createDataFrame(Seq(10L, 20L).map(Tuple1(_))).toDF("id")
    graft.sources.DeltaLogWriter.create(spark, df1.repartition(2), base, "t-writer")
    graft.sources.DeltaLogWriter.append(spark, df2.coalesce(1), base)
    assert(DeltaLogReader.versions(base) == Seq(0L, 1L))
    assert(DeltaLogReader.read(spark, base, 0)
      .agg(sum("id")).collect().head.getLong(0) == 6L)
    assert(DeltaLogReader.read(spark, base)
      .agg(sum("id")).collect().head.getLong(0) == 36L)
    // spec essentials on disk: protocol first commit, the REAL Spark
    // schema in schemaString, per-file numRecords stats
    val v0 = Files.readString(Paths.get(base, "_delta_log", "00000000000000000000.json"))
    assert(v0.contains("\"protocol\""))
    assert(v0.contains("schemaString") && v0.contains("\\\"id\\\""))
    assert(v0.contains("numRecords"))
  }

  test("optimize bin-packs live files, content-identically, with dataChange=false actions") {
    val base = "/tmp/graft_delta_test/optimize"
    val df = spark.createDataFrame((1L to 9L).map(Tuple1(_))).toDF("id")
    graft.sources.DeltaLogWriter.create(spark, df.repartition(3), base, "t-opt")
    graft.sources.DeltaLogWriter.append(spark,
      spark.createDataFrame(Seq(100L, 200L).map(Tuple1(_))).toDF("id").repartition(2), base)
    val (before, after) = graft.sources.DeltaLogWriter.optimize(spark, base)
    assert(before == 5 && after == 1)
    assert(DeltaLogReader.snapshotFiles(base, 2).size == 1)
    // the compaction invariant: content identical across the rewrite
    assert(DeltaLogReader.read(spark, base, 1).agg(sum("id")).collect().head.getLong(0) ==
      DeltaLogReader.read(spark, base, 2).agg(sum("id")).collect().head.getLong(0))
    // time travel to pre-OPTIMIZE still sees the small files
    assert(DeltaLogReader.snapshotFiles(base, 1).size == 5)
    // every action in the OPTIMIZE commit is dataChange=false
    val v2 = Files.readString(Paths.get(base, "_delta_log", f"${2L}%020d.json"))
    assert(!v2.contains("\"dataChange\":true"), v2)
    assert(v2.linesIterator.count(_.contains("\"remove\"")) == 5)
    // already-packed table: no-op, no new commit
    assert(graft.sources.DeltaLogWriter.optimize(spark, base) == ((1, 1)))
    assert(DeltaLogReader.latestVersion(base) == 2L)
  }

  test("writer checkpoint + expireLog: O(tail) reads survive log cleanup") {
    val base = "/tmp/graft_delta_test/wckpt"
    def one(ids: Long*) = spark.createDataFrame(ids.map(Tuple1(_))).toDF("id").coalesce(1)
    graft.sources.DeltaLogWriter.create(spark, one(1L, 2L), base, "t-wc")
    graft.sources.DeltaLogWriter.append(spark, one(3L), base)
    assert(graft.sources.DeltaLogWriter.checkpoint(spark, base) == 1L)
    assert(graft.sources.DeltaLogWriter.expireLog(base) == 1) // v0 json gone
    graft.sources.DeltaLogWriter.append(spark, one(10L), base)
    assert(DeltaLogReader.versions(base) == Seq(1L, 2L))
    assert(DeltaLogReader.read(spark, base, 1).agg(sum("id")).collect().head.getLong(0) == 6L)
    assert(DeltaLogReader.read(spark, base, 2).agg(sum("id")).collect().head.getLong(0) == 16L)
    // expireLog refuses to run without a checkpoint
    val bare = "/tmp/graft_delta_test/wckpt_bare"
    graft.sources.DeltaLogWriter.create(spark, one(1L), bare, "t-bare")
    intercept[IllegalArgumentException](graft.sources.DeltaLogWriter.expireLog(bare))
  }

  test("readChanges: cdc files win over add/remove; inserts and deletes derive; OPTIMIZE is silent") {
    val base = mkTable("cdf")
    writeParquet(base, "a.parquet", Seq(1L, 2L))
    writeParquet(base, "b.parquet", Seq(5L))
    commit(base, 0,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"add":{"path":"a.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""",
      """{"add":{"path":"b.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
    // v1: update in a.parquet with explicit cdc file — the rewrite's
    // add/remove must NOT double-count
    Files.createDirectories(Paths.get(base, "_change_data"))
    val cdcDf = spark.createDataFrame(Seq((2L, "update_preimage"), (7L, "update_postimage")))
      .toDF("id", "_change_type")
    val tmp = s"$base/.cdcstage"
    cdcDf.coalesce(1).write.parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator()
    var src: java.nio.file.Path = null
    while (part.hasNext) { val p = part.next(); if (p.getFileName.toString.endsWith(".parquet")) src = p }
    Files.move(src, Paths.get(base, "_change_data", "cdc-1.parquet"))
    graft.sources.TxnLog.rmrf(tmp)
    writeParquet(base, "a2.parquet", Seq(1L, 7L))
    commit(base, 1,
      """{"cdc":{"path":"_change_data/cdc-1.parquet","partitionValues":{},"size":1,"dataChange":false}}""",
      """{"remove":{"path":"a.parquet","deletionTimestamp":0,"dataChange":true}}""",
      """{"add":{"path":"a2.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
    // v2: OPTIMIZE (dataChange=false) — must emit NOTHING
    writeParquet(base, "packed.parquet", Seq(1L, 7L, 5L))
    commit(base, 2,
      """{"remove":{"path":"a2.parquet","deletionTimestamp":0,"dataChange":false}}""",
      """{"remove":{"path":"b.parquet","deletionTimestamp":0,"dataChange":false}}""",
      """{"add":{"path":"packed.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":false}}""")
    // v3: delete the packed file — pre-image derivation
    commit(base, 3,
      """{"remove":{"path":"packed.parquet","deletionTimestamp":0,"dataChange":true}}""")
    val ch = DeltaLogReader.readChanges(spark, base, 0L, 3L)
      .groupBy("_commit_version", "_change_type").agg(sum("id").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(ch == Set(
      (0L, "insert", 8L),            // 1+2+5
      (1L, "update_preimage", 2L),   // cdc file only — not a2's 1+7
      (1L, "update_postimage", 7L),
      (3L, "delete", 13L)))          // packed pre-image 1+7+5; v2 silent
    intercept[IllegalArgumentException](DeltaLogReader.readChanges(spark, base, 2L, 2L))
  }

  test("appendIfAbsent: txn markers absorb redelivered batches; empty batches advance the watermark") {
    val base = "/tmp/graft_delta_test/txnsink"
    graft.sources.TxnLog.rmrf(base)
    def one(ids: Long*) = spark.createDataFrame(ids.map(Tuple1(_))).toDF("id").coalesce(1)
    val W = graft.sources.DeltaLogWriter
    assert(W.appendIfAbsent(spark, one(1L, 2L), base, "app", 0L))   // creates v0
    assert(W.appendIfAbsent(spark, one(3L), base, "app", 1L))       // v1
    assert(!W.appendIfAbsent(spark, one(99L), base, "app", 1L))     // redelivery: skipped
    assert(!W.appendIfAbsent(spark, one(99L), base, "app", 0L))
    assert(DeltaLogReader.lastTxnVersion(base, "app").contains(1L))
    assert(DeltaLogReader.lastTxnVersion(base, "other").isEmpty)
    // a DIFFERENT app's batches are independent
    assert(W.appendIfAbsent(spark, one(10L), base, "app2", 0L))
    // empty batch: txn-only commit, no data change, watermark advances
    val empty = spark.createDataFrame(Seq.empty[Tuple1[Long]]).toDF("id")
    assert(W.appendIfAbsent(spark, empty, base, "app", 2L))
    assert(DeltaLogReader.lastTxnVersion(base, "app").contains(2L))
    assert(!W.appendIfAbsent(spark, one(99L), base, "app", 2L))
    assert(DeltaLogReader.read(spark, base)
      .agg(sum("id")).collect().head.getLong(0) == 16L)
  }

  test("restore reverts content as a new commit, re-adding dropped files") {
    val base = "/tmp/graft_delta_test/restore"
    val W = graft.sources.DeltaLogWriter
    val df = spark.createDataFrame((1L to 6L).map(Tuple1(_))).toDF("id")
    W.create(spark, df.repartition(3), base, "t-restore")
    W.optimize(spark, base)
    assert(W.restore(spark, base, 0L) == ((1, 3))) // drop packed, re-add 3
    assert(DeltaLogReader.latestVersion(base) == 2L)
    assert(DeltaLogReader.snapshotFiles(base, 2).size == 3)
    assert(DeltaLogReader.read(spark, base).agg(sum("id")).collect().head.getLong(0) == 21L)
    // history intact: the packed version still reads
    assert(DeltaLogReader.snapshotFiles(base, 1).size == 1)
    intercept[IllegalArgumentException](W.restore(spark, base, 5L))
  }

  test("partitioned create: hive layout, real values in partitionValues, pruning on read-back") {
    val base = "/tmp/graft_delta_test/partwrite"
    val df = spark.createDataFrame(Seq(
      (1L, "a b"), (2L, "a b"), (10L, "c"))).toDF("id", "p")
    graft.sources.DeltaLogWriter.create(spark, df, base, "t-pw", partitionBy = Seq("p"))
    // the dir name is escaped, the logged partitionValue is NOT
    val v0 = Files.readString(Paths.get(base, "_delta_log", "00000000000000000000.json"))
    assert(v0.contains(""""partitionColumns":["p"]"""))
    assert(v0.contains(""""p":"a b""""), v0)
    val back = DeltaLogReader.read(spark, base)
    assert(back.columns.toSet == Set("id", "p"))
    assert(back.filter(col("p") === "a b").agg(sum("id")).collect().head.getLong(0) == 3L)
    // appends follow the declared partitioning automatically
    graft.sources.DeltaLogWriter.append(spark,
      spark.createDataFrame(Seq((20L, "c"))).toDF("id", "p"), base)
    assert(DeltaLogReader.read(spark, base).filter(col("p") === "c")
      .agg(sum("id")).collect().head.getLong(0) == 30L)
    // OPTIMIZE would flatten the layout — rejected fast
    intercept[IllegalArgumentException](
      graft.sources.DeltaLogWriter.optimize(spark, base))
  }

  test("data skipping: stats bounds prune files; unstated bounds keep them") {
    val base = "/tmp/graft_delta_test/skip"
    val W = graft.sources.DeltaLogWriter
    def one(vals: (Long, Long)*) =
      spark.createDataFrame(vals).toDF("id", "k").coalesce(1)
    W.create(spark, one(1L -> 10L, 2L -> 19L), base, "t-skip", statsFor = Seq("k"))
    W.append(spark, one(3L -> 20L, 4L -> 29L), base, statsFor = Seq("k"))
    W.append(spark, one(5L -> 30L), base, statsFor = Seq("k"))
    W.append(spark, one(6L -> 99L), base) // no stats: must always be kept
    val v = DeltaLogReader.latestVersion(base)
    def planned(lo: Long, hi: Long) =
      DeltaLogReader.filesWhere(spark, base, v, "k", lo, hi).size
    assert(planned(20L, 29L) == 2) // the middle file + the stats-less one
    assert(planned(0L, 5L) == 1)   // only the stats-less file survives
    assert(planned(0L, 99L) == 4)
    assert(DeltaLogReader.readWhere(spark, base, v, "k", 20L, 29L)
      .filter(col("k").between(20L, 29L))
      .agg(sum("id")).collect().head.getLong(0) == 7L)
    intercept[IllegalArgumentException](
      DeltaLogReader.filesWhere(spark, base, v, "k", 5L, 4L))
    // the stats JSON carries both bounds objects, escaped per spec
    val v0 = Files.readString(Paths.get(base, "_delta_log", "00000000000000000000.json"))
    assert(v0.contains("""minValues\":{\"k\":10}"""), v0)
    assert(v0.contains("""maxValues\":{\"k\":19}"""), v0)
  }

  test("deleteWhere/update rewrite only affected files and emit consumable CDF") {
    val base = "/tmp/graft_delta_test/dml"
    val W = graft.sources.DeltaLogWriter
    // two files: evens in one, odds in the other
    W.create(spark, spark.createDataFrame(Seq(2L, 4L, 6L).map(Tuple1(_))).toDF("id").coalesce(1),
      base, "t-dml")
    W.append(spark, spark.createDataFrame(Seq(1L, 3L).map(Tuple1(_))).toDF("id").coalesce(1), base)
    val before = DeltaLogReader.snapshotFiles(base, 1L).map(_.path).toSet
    // delete id=4: only the evens file is rewritten
    assert(W.deleteWhere(spark, base, col("id") === 4L) == ((1, 1L)))
    val afterDel = DeltaLogReader.snapshotFiles(base, 2L).map(_.path).toSet
    assert((before -- afterDel).size == 1 && (afterDel -- before).size == 1,
      s"expected exactly one file swapped: $before -> $afterDel")
    assert(DeltaLogReader.read(spark, base).agg(sum("id")).collect().head.getLong(0) == 12L)
    // update odds: +10 each
    assert(W.update(spark, base, col("id") % 2 === 1L,
      df => df.withColumn("id", col("id") + 10L)) == ((1, 2L)))
    assert(DeltaLogReader.read(spark, base).agg(sum("id")).collect().head.getLong(0) == 32L)
    // the CDF both DMLs emitted reads back exactly
    val ch = DeltaLogReader.readChanges(spark, base, 2L, 3L)
      .groupBy("_commit_version", "_change_type").agg(sum("id").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(ch == Set(
      (2L, "delete", 4L),
      (3L, "update_preimage", 4L),    // 1+3
      (3L, "update_postimage", 24L))) // 11+13
    // a predicate matching nothing is a no-op: no commit
    assert(W.deleteWhere(spark, base, col("id") === 999L) == ((0, 0L)))
    assert(DeltaLogReader.latestVersion(base) == 3L)
  }

  test("merge upserts in one commit: matched files rewritten, unseen keys insert, CDF complete") {
    val base = "/tmp/graft_delta_test/merge"
    val W = graft.sources.DeltaLogWriter
    def kv(vals: (Long, Long)*) = spark.createDataFrame(vals).toDF("id", "v").coalesce(1)
    W.create(spark, kv(1L -> 10L, 2L -> 20L), base, "t-merge")
    W.append(spark, kv(5L -> 50L), base)
    // update id=2 (file 1 only), insert id=9 — ONE commit
    assert(W.merge(spark, base, kv(2L -> 99L, 9L -> 90L), "id") == ((1L, 1L)))
    assert(DeltaLogReader.latestVersion(base) == 2L)
    assert(DeltaLogReader.read(spark, base).agg(sum("v")).collect().head.getLong(0)
      == 10L + 99L + 50L + 90L)
    // the untouched second file survived the merge
    assert(DeltaLogReader.snapshotFiles(base, 2L).map(_.path)
      .exists(p => DeltaLogReader.snapshotFiles(base, 1L).map(_.path).contains(p)))
    val ch = DeltaLogReader.readChanges(spark, base, 2L, 2L)
      .groupBy("_change_type").agg(sum("v").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ch == Map("update_preimage" -> 20L, "update_postimage" -> 99L, "insert" -> 90L))
    // a merge with nothing to do is rejected, not an empty commit
    intercept[IllegalArgumentException](
      W.merge(spark, base, kv(2L -> 99L).filter(col("id") === 0L), "id"))
  }

  test("writer refuses to overwrite an already-committed version") {
    val base = "/tmp/graft_delta_test/writer_clash"
    val df = spark.createDataFrame(Seq(1L).map(Tuple1(_))).toDF("id")
    graft.sources.DeltaLogWriter.create(spark, df, base, "t-clash")
    // a racing writer committing the SAME version must fail, not
    // clobber — the spec's mutual-exclusion point (CREATE_NEW)
    intercept[java.nio.file.FileAlreadyExistsException](
      graft.sources.DeltaLogWriter.commit(base, 0L,
        Seq("""{"commitInfo":{"operation":"RACER"}}""")))
  }
}
