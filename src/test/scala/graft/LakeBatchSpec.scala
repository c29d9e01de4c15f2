package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.{DeltaLogWriter, HudiWriter, IcebergWriter}

/** Batch DSv2 front doors (`spark.read.format("graft-delta" | ...)`):
  * the unmasked scan must stay Spark's OWN parquet scan — pushdown,
  * pruning, vectorization — while masked tables (DVs, delete files,
  * MOR logs) serve through the full readers' mask-applying plans via
  * the V1-read fallback, never a silent mis-read. */
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

  test("graft-delta serves DV tables through the mask-applying V1-fallback scan") {
    val dvBase = mkBase("delta_dv")
    DeltaLogWriter.create(spark, plane().coalesce(1), dvBase, "t")
    DeltaLogWriter.deleteWhereDv(spark, dvBase, col("id") < 5)
    // masked rows are GONE through the front door (the r12 refusal is
    // lifted: the scan rides the full reader's anti-join plan)
    val df = spark.read.format("graft-delta").option("path", dvBase).load()
    assert(df.count() == 95L)
    assert(df.agg(min("id")).head().getLong(0) == 5L)
    // pushdown is real on this path too: the pushed set shows on the
    // DSv2 node, and the re-stated predicate reaches the inner parquet
    // scan through the anti-join (filter works + prunes)
    val q = df.filter(col("id") < 50).select("x")
    assert(q.count() == 45L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), LessThan(id,50)]"), plan)
    // pure-SQL works against the same masked table
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW lb_dv USING `graft-delta` " +
      s"OPTIONS (path '$dvBase')")
    assert(spark.sql("SELECT count(*) FROM lb_dv WHERE id < 50").head().getLong(0) == 45L)
    // the write surface stays live on a DV table (append composes)
    spark.range(200, 205).select(col("id"), (col("id") % 7).as("x"),
      lit("odd").as("p")).write.format("graft-delta")
      .option("path", dvBase).mode("append").save()
    assert(spark.read.format("graft-delta").option("path", dvBase).load()
      .count() == 100L)
  }

  test("graft-delta serves COLUMN-MAPPED tables by parquet field id, through renames") {
    val cmBase = mkBase("delta_cm")
    DeltaLogWriter.createColumnMapped(spark, plane().coalesce(1), cmBase, "t")
    // logical names surface even though the files carry col-1/col-2/col-3
    val before = spark.read.format("graft-delta").option("path", cmBase).load()
    assert(before.columns.toSeq == Seq("id", "x", "p"))
    assert(before.filter(col("x") === 3).count() ==
      plane().filter(col("x") === 3).count())
    // a metadata-only RENAME changes the requested spelling only — the
    // field id still binds the same physical column
    DeltaLogWriter.renameColumn(spark, cmBase, "x", "septile")
    val after = spark.read.format("graft-delta").option("path", cmBase).load()
    assert(after.columns.toSeq == Seq("id", "septile", "p"))
    assert(after.agg(sum("septile")).head().getLong(0) ==
      plane().agg(sum("x")).head().getLong(0))
    // id-mode binds the same way (physical names immaterial)
    val idBase = mkBase("delta_cmid")
    DeltaLogWriter.createColumnMappedId(spark, plane().coalesce(1), idBase, "t")
    assert(spark.read.format("graft-delta").option("path", idBase).load()
      .filter(col("p") === "even").count() == 50L)
    // mapped + partitioned stays refused (hive dirs carry physical names)
    val pmBase = mkBase("delta_cmpart")
    DeltaLogWriter.createComposed(spark, plane().coalesce(1), pmBase, "t",
      partitionBy = Seq("p"), columnMapped = true)
    val e = intercept[IllegalArgumentException](
      spark.read.format("graft-delta").option("path", pmBase).load())
    assert(e.getMessage.contains("PARTITIONED"))
  }

  test("DSv2 write front door: append, SQL INSERT INTO, overwrite, guards") {
    val base = mkBase("delta_w")
    DeltaLogWriter.create(spark, plane().repartition(2), base, "t")
    // DataFrame append
    spark.range(100, 120).select(col("id"), (col("id") % 7).as("x"),
      lit("odd").as("p")).write.format("graft-delta")
      .option("path", base).mode("append").save()
    assert(graft.sources.DeltaLogReader.read(spark, base).count() == 120L)
    // pure-SQL INSERT INTO through the USING view
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW lbw USING `graft-delta` " +
      s"OPTIONS (path '$base')")
    spark.range(120, 130).select(col("id"), (col("id") % 7).as("x"),
      lit("odd").as("p")).createOrReplaceTempView("lbw_src")
    spark.sql("INSERT INTO lbw SELECT * FROM lbw_src")
    // the USING view pins its resolution-time snapshot (the Table holds
    // the planned file list) — a fresh resolution sees the insert
    assert(spark.read.format("graft-delta").option("path", base).load()
      .count() == 130L)
    // overwrite = ONE remove-all+add commit; prior versions survive
    spark.range(0, 7).select(col("id"), col("id").as("x"), lit("ow").as("p"))
      .write.format("graft-delta").option("path", base).mode("overwrite").save()
    assert(graft.sources.DeltaLogReader.read(spark, base).count() == 7L)
    assert(graft.sources.DeltaLogReader.read(spark, base, 2L).count() == 130L)
    // the append path is the FULL writer: a CHECK constraint holds here too
    DeltaLogWriter.addConstraint(spark, base, "id_bound", "id < 1000")
    val e = intercept[IllegalArgumentException](
      spark.range(5000, 5003).select(col("id"), col("id").as("x"),
        lit("bad").as("p")).write.format("graft-delta")
        .option("path", base).mode("append").save())
    assert(e.getMessage.contains("CHECK"))
    // a time-travel read is not a write target (no forked history)
    val e2 = intercept[Exception](
      spark.range(0, 1).select(col("id"), col("id").as("x"), lit("z").as("p"))
        .write.format("graft-delta").option("path", base)
        .option("versionAsOf", "0").mode("append").save())
    assert(e2.getMessage.contains("read-only"))
    // graft-iceberg appends; graft-hudi stays read-only
    val iBase = mkBase("ice_w")
    IcebergWriter.create(spark, plane().repartition(2), iBase)
    spark.range(100, 110).select(col("id"), (col("id") % 7).as("x"),
      lit("odd").as("p")).write.format("graft-iceberg")
      .option("path", iBase).mode("append").save()
    assert(graft.sources.IcebergReader.read(spark, iBase).count() == 110L)
    val hBase = mkBase("hudi_w")
    HudiWriter.create(spark, plane(), hBase, "t", "id", 4)
    val e3 = intercept[Exception](
      plane().write.format("graft-hudi").option("path", hBase)
        .mode("append").save())
    assert(e3.getMessage != null)
  }

  test("GraftCatalog: names, DDL lifecycle, ALTER guards") {
    val root = mkBase("catalog")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "db"))
    DeltaLogWriter.create(spark, plane().coalesce(1), s"$root/db/t1", "t1")
    HudiWriter.create(spark, plane(), s"$root/db/h1", "h1", "id", 2)
    spark.conf.set("spark.sql.catalog.gcat_test", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat_test.root", root)
    // reads resolve by name, both formats, one catalog
    assert(spark.sql("SELECT count(*) FROM gcat_test.db.t1").head().getLong(0) == 100L)
    assert(spark.sql("SELECT count(*) FROM gcat_test.db.h1").head().getLong(0) == 100L)
    assert(spark.sql("SHOW TABLES IN gcat_test.db").count() == 2L)
    // CREATE TABLE writes a schema-only v0; INSERT populates it
    spark.sql("CREATE TABLE gcat_test.db.t2 (id BIGINT, x INT) USING `graft-delta`")
    spark.sql("INSERT INTO gcat_test.db.t2 " +
      "SELECT id, CAST(x AS INT) FROM gcat_test.db.t1 WHERE id < 10")
    assert(spark.sql("SELECT count(*) FROM gcat_test.db.t2").head().getLong(0) == 10L)
    // ALTER: add + widen ride the metadata-only writer ops
    spark.sql("ALTER TABLE gcat_test.db.t2 ADD COLUMN note STRING")
    assert(spark.sql("SELECT count(*) FROM gcat_test.db.t2 WHERE note IS NULL")
      .head().getLong(0) == 10L)
    spark.sql("ALTER TABLE gcat_test.db.t2 ALTER COLUMN x TYPE BIGINT")
    assert(spark.sql("SELECT sum(x) FROM gcat_test.db.t2").head().getLong(0) ==
      plane().filter(col("id") < 10).agg(sum("x")).head().getLong(0))
    // narrowing dies in Spark's OWN analyzer before reaching the writer
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gcat_test.db.t2 ALTER COLUMN x TYPE INT"))
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), e.getMessage)
    // ALTER on a Hudi table refuses (Delta and Iceberg are served)
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE gcat_test.db.h1 ADD COLUMN z INT"))
    assert(e2.getMessage.contains("hudi"), e2.getMessage)
    // RENAME + DROP are directory ops
    spark.sql("ALTER TABLE gcat_test.db.t2 RENAME TO db.t3")
    assert(spark.sql("SELECT count(*) FROM gcat_test.db.t3").head().getLong(0) == 10L)
    spark.sql("DROP TABLE gcat_test.db.t3")
    assert(spark.sql("SHOW TABLES IN gcat_test.db").count() == 2L)
  }

  test("GraftCatalog ALTER on ICEBERG tables: add/rename/widen/drop, metadata-only") {
    val root = mkBase("catalog_ice")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "db"))
    IcebergWriter.create(spark, spark.range(0, 50).select(
      col("id"), (col("id") % 7).cast("int").as("x")).coalesce(1), s"$root/db/i")
    spark.conf.set("spark.sql.catalog.gcat_ice", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat_ice.root", root)
    // ADD COLUMN: metadata-only, old rows surface NULL — the front
    // door routes the evolved table through the projection read
    spark.sql("ALTER TABLE gcat_ice.db.i ADD COLUMN note STRING")
    assert(spark.sql("SELECT count(*) FROM gcat_ice.db.i WHERE note IS NULL")
      .head().getLong(0) == 50L)
    spark.sql("INSERT INTO gcat_ice.db.i VALUES (100, CAST(1 AS INT), 'n')")
    assert(spark.sql("SELECT count(*) FROM gcat_ice.db.i WHERE note = 'n'")
      .head().getLong(0) == 1L)
    // RENAME binds by field id across eras
    spark.sql("ALTER TABLE gcat_ice.db.i RENAME COLUMN note TO memo")
    assert(spark.sql("SELECT count(*) FROM gcat_ice.db.i WHERE memo = 'n'")
      .head().getLong(0) == 1L)
    // the spec's int→long promotion; old narrow files upcast
    spark.sql("ALTER TABLE gcat_ice.db.i ALTER COLUMN x TYPE BIGINT")
    assert(spark.sql("SELECT sum(x) FROM gcat_ice.db.i").head().getLong(0) ==
      (0L until 50L).map(_ % 7).sum + 1L)
    // DROP retires the id without a rewrite
    spark.sql("ALTER TABLE gcat_ice.db.i DROP COLUMN memo")
    assert(!spark.sql("SELECT * FROM gcat_ice.db.i").columns.contains("memo"))
    assert(spark.sql("SELECT count(*) FROM gcat_ice.db.i").head().getLong(0) == 51L)
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
    // an Iceberg table with live delete files serves through the
    // delete-applying reader plan (position deletes masked)
    IcebergWriter.deleteWhere(spark, iBase, col("id") < 3)
    val masked = spark.read.format("graft-iceberg").option("path", iBase).load()
    assert(masked.count() == 97L)
    assert(masked.agg(min("id")).head().getLong(0) == 3L)
    val mq = masked.filter(col("x") === 3)
    assert(mq.count() == plane().filter(col("id") >= 3 && col("x") === 3).count())
    assert(mq.queryExecution.executedPlan.toString
      .contains("PushedFilters: [IsNotNull(x), EqualTo(x,3)]"))
  }

  test("graft-hudi serves MOR tables through the log-merging reader") {
    val mBase = mkBase("hudi_mor")
    HudiWriter.createMor(spark, plane(), mBase, "t", "id", 4)
    HudiWriter.logCommit(spark, mBase,
      spark.range(0, 5).select(col("id"), lit(42L).as("x"), lit("even").as("p")),
      deleteKeys = Some(spark.range(90, 100).select(col("id"))))
    val df = spark.read.format("graft-hudi").option("path", mBase).load()
    assert(df.count() == 90L)
    assert(df.filter(col("x") === 42).count() == 5L)
    // pure SQL over the MOR table
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW lb_mor USING `graft-hudi` " +
      s"OPTIONS (path '$mBase')")
    assert(spark.sql("SELECT count(*) FROM lb_mor WHERE x = 42").head().getLong(0) == 5L)
  }

  test("SQL DELETE on a Hudi MOR catalog table: tombstone delta commit") {
    val root = mkBase("catalog_hudidel")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "db"))
    HudiWriter.createMor(spark, plane(), s"$root/db/m", "m", "id", 4)
    spark.conf.set("spark.sql.catalog.gcat_hdel", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat_hdel.root", root)
    spark.sql("DELETE FROM gcat_hdel.db.m WHERE id >= 80")
    def n(sql: String): Long = spark.sql(sql).head().getLong(0)
    assert(n("SELECT count(*) FROM gcat_hdel.db.m") == 80L)
    // no base file rewritten — the delete landed as log tombstones
    val logs = graft.sources.HudiReader.logFiles(s"$root/db/m")
    assert(logs.nonEmpty, "expected tombstone log files")
    // deletes stack; already-tombstoned rows never re-match
    spark.sql("DELETE FROM gcat_hdel.db.m WHERE id >= 70 OR id < 5")
    assert(n("SELECT count(*) FROM gcat_hdel.db.m") == 65L)
    assert(n("SELECT min(id) FROM gcat_hdel.db.m") == 5L)
    assert(n("SELECT max(id) FROM gcat_hdel.db.m") == 69L)
  }

  test("masked tables report live size: a small DV dimension broadcast-joins") {
    val base = mkBase("delta_stats")
    DeltaLogWriter.create(spark, plane().coalesce(1), base, "dim")
    DeltaLogWriter.deleteWhereDv(spark, base, col("id") < 10)
    val dim = spark.read.format("graft-delta").option("path", base).load()
    // without the sizeInBytes override the V1 relation reports
    // defaultSizeInBytes (effectively infinite) and this join could
    // never auto-broadcast
    val fact = spark.range(0, 100000).select(col("id"), (col("id") % 90 + 10).as("k"))
    val joined = fact.join(dim, fact("k") === dim("id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(joined.count() == 100000L)
  }

  test("SQL time travel through the catalog: VERSION AS OF + TIMESTAMP AS OF") {
    val root = mkBase("catalog_tt")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "db"))
    // Delta: version coordinates are log versions
    DeltaLogWriter.create(spark, plane().coalesce(1), s"$root/db/d", "d")
    DeltaLogWriter.append(spark, spark.range(100, 120).select(
      col("id"), (col("id") % 7).as("x"), lit("odd").as("p")).coalesce(1),
      s"$root/db/d")
    // Iceberg: snapshot ids (sequential for this writer), stamped
    // timestamp-ms = id
    IcebergWriter.create(spark, plane().coalesce(1), s"$root/db/i")
    IcebergWriter.append(spark, spark.range(100, 130).select(
      col("id"), (col("id") % 7).as("x"), lit("odd").as("p")).coalesce(1),
      s"$root/db/i")
    // Hudi: instants
    HudiWriter.create(spark, plane(), s"$root/db/h", "h", "id", 2)
    HudiWriter.upsert(spark,
      spark.range(200, 210).select(col("id"), lit(0L).as("x"), lit("even").as("p")),
      s"$root/db/h")
    spark.conf.set("spark.sql.catalog.gcat_tt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat_tt.root", root)
    def n(sql: String): Long = spark.sql(sql).head().getLong(0)
    assert(n("SELECT count(*) FROM gcat_tt.db.d") == 120L)
    assert(n("SELECT count(*) FROM gcat_tt.db.d VERSION AS OF 0") == 100L)
    assert(n("SELECT count(*) FROM gcat_tt.db.i VERSION AS OF 1") == 100L)
    assert(n("SELECT count(*) FROM gcat_tt.db.i VERSION AS OF 2") == 130L)
    assert(n("SELECT count(*) FROM gcat_tt.db.h VERSION AS OF '001'") == 100L)
    assert(n("SELECT count(*) FROM gcat_tt.db.h") == 110L)
    // Iceberg TIMESTAMP AS OF: snapshot timestamps are 1ms and 2ms
    assert(n("SELECT count(*) FROM gcat_tt.db.i " +
      "TIMESTAMP AS OF timestamp'1970-01-01 00:00:00.001+00:00'") == 100L)
    assert(n("SELECT count(*) FROM gcat_tt.db.i " +
      "TIMESTAMP AS OF timestamp'1970-01-01 00:00:05+00:00'") == 130L)
    // travel to before the first snapshot fails loudly
    val e0 = intercept[Exception](spark.sql("SELECT count(*) FROM gcat_tt.db.i " +
      "TIMESTAMP AS OF timestamp'1969-12-31 00:00:00+00:00'").collect())
    assert(e0.getMessage.contains("at or before"), e0.getMessage)
    // Delta TIMESTAMP AS OF binds commitInfo timestamps — simulate a
    // FOREIGN writer's clock by restamping the self-written log (and
    // adding the commitInfo a real writer puts on its CREATE, which
    // this writer's version-0 commit omits)
    val logDir = java.nio.file.Paths.get(s"$root/db/d/_delta_log")
    Seq(0L -> 1000L, 1L -> 2000L).foreach { case (v, ts) =>
      val p = logDir.resolve(f"$v%020d.json")
      val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      val stamped =
        if (txt.contains("\"commitInfo\""))
          txt.replace("\"timestamp\":0", s""""timestamp":$ts""")
        else s"""{"commitInfo":{"operation":"CREATE","timestamp":$ts}}""" + "\n" + txt
      java.nio.file.Files.write(p, stamped.getBytes("UTF-8"))
    }
    assert(n("SELECT count(*) FROM gcat_tt.db.d " +
      "TIMESTAMP AS OF timestamp'1970-01-01 00:00:01.5+00:00'") == 100L)
    assert(n("SELECT count(*) FROM gcat_tt.db.d " +
      "TIMESTAMP AS OF timestamp'1970-01-01 00:00:02+00:00'") == 120L)
    // Hudi wall-clock travel refuses (ordinal instants)
    val e1 = intercept[Exception](spark.sql("SELECT count(*) FROM gcat_tt.db.h " +
      "TIMESTAMP AS OF timestamp'1970-01-01 00:00:01+00:00'").collect())
    assert(e1.getMessage.contains("ordinals"), e1.getMessage)
    // a time-travel INSERT refuses — it would fork history
    val e2 = intercept[Exception](spark.sql(
      "INSERT INTO gcat_tt.db.d VERSION AS OF 0 VALUES (1, 1, 'x')"))
    assert(e2 != null)
  }

  test("SQL DELETE on Iceberg catalog tables: v2 position deletes, v3 DVs") {
    val root = mkBase("catalog_icedel")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "db"))
    IcebergWriter.create(spark, plane().repartition(2), s"$root/db/i2")
    IcebergWriter.createV3(spark, plane().repartition(2), s"$root/db/i3")
    spark.conf.set("spark.sql.catalog.gcat_idel", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat_idel.root", root)
    spark.sql("DELETE FROM gcat_idel.db.i2 WHERE id < 10")
    def n(sql: String): Long = spark.sql(sql).head().getLong(0)
    assert(n("SELECT count(*) FROM gcat_idel.db.i2") == 90L)
    // the delete landed as POSITION-DELETE files (format stays v2,
    // no data file rewritten)
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/db/i2/data"))
      .iterator.asScala.exists(_.getFileName.toString.startsWith("del-s")))
    // deletes stack; already-masked rows never re-match
    spark.sql("DELETE FROM gcat_idel.db.i2 WHERE id < 20 AND p = 'even'")
    assert(n("SELECT count(*) FROM gcat_idel.db.i2") == 85L)
    assert(n("SELECT min(id) FROM gcat_idel.db.i2") == 11L)
    // v3: the same statement lands puffin DVs
    spark.sql("DELETE FROM gcat_idel.db.i3 WHERE p = 'odd'")
    assert(n("SELECT count(*) FROM gcat_idel.db.i3") == 50L)
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/db/i3/data"))
      .iterator.asScala.exists(_.getFileName.toString.endsWith(".puffin")))
  }

  test("CREATE TABLE refuses a non-empty marker-less target directory") {
    val root = mkBase("catalog_create_guard")
    // a directory with unrelated content where the table would live —
    // tableExists sniffs only format markers, so CREATE must refuse to
    // clear it rather than destroy whatever is there
    val dir = java.nio.file.Paths.get(root, "db", "occupied")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("precious.txt"), "not a table")
    spark.conf.set("spark.sql.catalog.gcat_guard", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat_guard.root", root)
    val eDelta = intercept[Exception](spark.sql(
      "CREATE TABLE gcat_guard.db.occupied (id BIGINT) USING `graft-delta`"))
    assert(eDelta.getMessage.contains("not empty"), eDelta.getMessage)
    val eIce = intercept[Exception](spark.sql(
      "CREATE TABLE gcat_guard.db.occupied (id BIGINT) USING `graft-iceberg`"))
    assert(eIce.getMessage.contains("not empty"), eIce.getMessage)
    // the occupant survived both refusals
    assert(java.nio.file.Files.exists(dir.resolve("precious.txt")))
  }
}
