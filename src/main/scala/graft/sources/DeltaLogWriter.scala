package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}

/** Write-side twin of [[DeltaLogReader]]: emit a PUBLIC-spec Delta
  * Lake table (the open delta-io protocol) so existing Delta consumers
  * can read what this engine produces — the export path a user needs
  * when they adopt the engine but their downstream stays on Delta.
  *
  * Scope (minimal, spec-conformant, append-only):
  *   - `create`: write the DataFrame's rows as parquet part files
  *     under the table base, then commit version 0 with `protocol`
  *     (minReader/Writer 1/2 — no reader-blocking features),
  *     `metaData` (real Spark schema JSON in `schemaString`) and one
  *     `add` per part file carrying size + `stats.numRecords`.
  *   - `append`: the next version, `add` actions only.
  *
  * The DATA write is the ordinary distributed parquet sink; only the
  * KB-scale commit JSON is composed on the driver. Part files keep the
  * names Spark gave them (the spec just requires relative paths), and
  * the commit file is written LAST and atomically (create-new), so a
  * concurrent reader never sees a half-commit — the same
  * last-writer-wins discipline the spec's optimistic protocol builds
  * on. numRecords comes from one metadata-cheap `_metadata.file_path`
  * group-by over just the new files.
  */
object DeltaLogWriter {

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Undo hive-style partition-dir escaping (`%XX`) — dir names are
    * escaped on disk, but `partitionValues` in the log carry the real
    * value (the spec's split between path spelling and metadata). */
  private def unescapeHive(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 3 <= s.length)
        { sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3 }
      else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** `col=value/...` path prefix → (column, real value) pairs. */
  private def partitionValuePairs(rel: String): Seq[(String, String)] =
    rel.split('/').dropRight(1).toSeq.flatMap { seg =>
      val eq = seg.indexOf('=')
      if (eq < 0) None else Some(seg.take(eq) -> unescapeHive(seg.drop(eq + 1)))
    }

  /** `col=value/...` path prefix → the add action's partitionValues. */
  private def partitionValuesOf(rel: String): String =
    partitionValuePairs(rel)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")

  /** One add action per new part file, stats included. With
    * `statsFor`, each add also carries per-file `minValues`/`maxValues`
    * for those (integral) columns — the spec's data-skipping stats,
    * what lets a reader plan around files whose range misses the
    * predicate. One read-back aggregation computes counts and bounds
    * for every new file together. */
  private def addActions(spark: SparkSession, base: String, relPaths: Seq[String],
                         statsFor: Seq[String] = Nil): Seq[String] =
    addActionsCounted(spark, base, relPaths, statsFor)._1

  /** add actions + total row count. With `rowTracking = Some((start,
    * commitVersion))` each file carries a fresh contiguous
    * `baseRowId` range (assigned in file order from `start`) and
    * `defaultRowCommitVersion` — the ROW TRACKING fields; the caller
    * bumps the high-water mark by the returned total. */
  private def addActionsCounted(spark: SparkSession, base: String, relPaths: Seq[String],
                                statsFor: Seq[String] = Nil,
                                rowTracking: Option[(Long, Long)] = None): (Seq[String], Long) = {
    import org.apache.spark.sql.functions.{max, min}
    // cast the bounds to long up front: an IntegerType stats column
    // would otherwise CCE on the Long read, and an all-NULL file would
    // NPE on unboxing — null bounds are skipped below instead
    val aggs = count(lit(1)).as("n") +:
      statsFor.flatMap(c => Seq(min(col(c)).cast("long").as(s"mn_$c"),
        max(col(c)).cast("long").as(s"mx_$c")))
    val byFile = spark.read.parquet(relPaths.map(r => s"$base/$r"): _*)
      .groupBy(col("_metadata.file_name").as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getAs[String]("f") -> r).toMap
    var nextId = rowTracking.map(_._1).getOrElse(0L)
    var total = 0L
    val actions = relPaths.map { rel =>
      val name = rel.split('/').last
      val row = byFile.get(name)
      val n = row.map(_.getAs[Long]("n")).getOrElse(0L)
      val sz = Files.size(Paths.get(base, rel))
      val tracked = row.toSeq.flatMap(r => statsFor.filter(c =>
        !r.isNullAt(r.fieldIndex(s"mn_$c")) && !r.isNullAt(r.fieldIndex(s"mx_$c"))))
      val bounds = if (tracked.isEmpty) "" else {
        def side(tag: String, pre: String) = tracked
          .map(c => s"""\\"${esc(c)}\\":${row.get.getAs[Long](s"${pre}_$c")}""")
          .mkString(s""",\\"$tag\\":{""", ",", "}")
        side("minValues", "mn") + side("maxValues", "mx")
      }
      val rt = rowTracking.map { case (_, ver) =>
        val s = s""""baseRowId":$nextId,"defaultRowCommitVersion":$ver,"""
        nextId += n
        s
      }.getOrElse("")
      total += n
      s"""{"add":{"path":"${esc(rel)}","partitionValues":${partitionValuesOf(rel)},""" +
        s""""size":$sz,"modificationTime":0,$rt""" +
        s""""dataChange":true,"stats":"{\\"numRecords\\":$n$bounds}"}}"""
    }
    (actions, total)
  }

  /** The `delta.rowTracking` domain-metadata action carrying the id
    * high-water mark — the reason ids are never reused even after
    * their files are removed. */
  private def rowTrackingDomain(hwm: Long): String =
    s"""{"domainMetadata":{"domain":"delta.rowTracking",""" +
      s""""configuration":"{\\"rowIdHighWaterMark\\":$hwm}","removed":false}}"""

  private def rowTrackingConf(spark: SparkSession, base: String,
                              version: Long): Option[Map[String, String]] =
    DeltaLogReader.latestMetaConfig(Some(spark), base, version).map(_._2)
      .filter(_.get("delta.enableRowTracking").contains("true"))

  /** Stage-write `df` as parquet and move the part files under the
    * table base with a version prefix; returns their relative paths.
    * With `partitionBy`, the stage write uses the hive layout and the
    * moves preserve the `col=value/` dirs — partition values then live
    * in BOTH the paths (for the scan's basePath recovery) and the add
    * actions' partitionValues (for log-only readers), as delta-spark
    * itself writes them. */
  private def writeData(df: DataFrame, base: String, version: Long,
                        partitionBy: Seq[String] = Nil): Seq[String] = {
    val tmp = s"$base/.stage-v$version"
    TxnLog.rmrf(tmp)
    val w = df.write
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmp)
    Files.createDirectories(Paths.get(base))
    val moved = Files.walk(Paths.get(tmp)).iterator.asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val relDir = Paths.get(tmp).relativize(p.getParent).toString
        val prefix = if (relDir.isEmpty) "" else relDir + "/"
        val rel = s"$prefix" + s"v$version-${p.getFileName}"
        Files.createDirectories(Paths.get(base, rel).getParent)
        Files.move(p, Paths.get(base, rel))
        rel
      }.toSeq
    TxnLog.rmrf(tmp)
    require(moved.nonEmpty, s"writeData produced no part files under $tmp")
    moved
  }

  private[graft] def commit(base: String, version: Long, actions: Seq[String]): Unit = {
    val dir = Paths.get(base, "_delta_log")
    Files.createDirectories(dir)
    val name = f"$version%020d.json"
    // CREATE_NEW: committing an already-committed version must fail,
    // not overwrite — the spec's mutual-exclusion point
    Files.write(dir.resolve(name),
      (actions.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
  }

  /** Create a new Delta table at `base` (version 0). With
    * `partitionBy`, data lands in the hive layout and partition values
    * ride both the paths and each add's `partitionValues`. */
  def create(spark: SparkSession, df: DataFrame, base: String, tableId: String,
             partitionBy: Seq[String] = Nil, statsFor: Seq[String] = Nil): Unit = {
    TxnLog.rmrf(base)
    val rels = writeData(df, base, 0L, partitionBy)
    val pcols = partitionBy.map(c => s""""${esc(c)}"""").mkString("[", ",", "]")
    commit(base, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"${esc(tableId)}","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${esc(df.schema.json)}","partitionColumns":$pcols,""" +
        s""""configuration":{},"createdTime":0}}""") ++ addActions(spark, base, rels, statsFor))
  }

  /** Create a LIQUID-CLUSTERED Delta table (the `clustering` +
    * `domainMetadata` writer features): the clustering columns are
    * declared ONCE in the `delta.clustering` domain — unlike hive
    * partitioning they are a LAYOUT HINT, not a path scheme, so they
    * can be changed later and high-cardinality columns are fine.
    * [[optimizeClustered]] applies the layout: a Z-ORDER rewrite whose
    * per-file min/max stats become tight on BOTH columns, which is
    * what makes [[DeltaLogReader.filesWhere]] skipping effective on
    * either dimension. */
  def createClustered(spark: SparkSession, df: DataFrame, base: String,
                      tableId: String, clusterCols: Seq[String]): Unit = {
    require(clusterCols.size == 2,
      "this minimal writer z-orders exactly 2 clustering columns")
    require(clusterCols.forall(df.columns.contains),
      s"clustering columns ${clusterCols.mkString(",")} must exist in the data")
    TxnLog.rmrf(base)
    val rels = writeData(df, base, 0L)
    val cc = clusterCols.map(c => s"""["${esc(c)}"]""").mkString("[", ",", "]")
    commit(base, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["clustering","domainMetadata"]}}""",
      s"""{"metaData":{"id":"${esc(tableId)}","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${esc(df.schema.json)}","partitionColumns":[],""" +
        s""""configuration":{},"createdTime":0}}""",
      s"""{"domainMetadata":{"domain":"delta.clustering",""" +
        s""""configuration":"{\\"clusteringColumns\\":${cc.replace("\"", "\\\"")}}","removed":false}}""") ++
      addActions(spark, base, rels, statsFor = clusterCols))
  }

  /** OPTIMIZE on a clustered table — the Z-ORDER rewrite: bucket each
    * clustering column into 8 equi-width cells over its observed
    * [min,max] (two driver-side scalars), interleave the 3-bit cell
    * ids into a 64-cell Z-value, and rewrite the live set as ONE FILE
    * PER occupied Z-bucket (`zBuckets` buckets of 4 adjacent cells).
    * Each output file then covers a NARROW range of BOTH columns, so
    * its min/max stats prune under predicates on EITHER — the liquid
    * clustering promise. The rewrite reshapes storage only
    * (`dataChange=false`); the routing is one value-derived column, so
    * the layout is DETERMINISTIC for a fixed corpus regardless of
    * input partitioning. Returns (filesBefore, filesAfter). */
  def optimizeClustered(spark: SparkSession, base: String,
                        zBuckets: Int = 16): (Int, Int) = {
    import org.apache.spark.sql.functions.{expr, shiftleft, shiftrightunsigned}
    val version = DeltaLogReader.latestVersion(base)
    val ccols = DeltaLogReader.clusteringColumns(Some(spark), base, version)
    require(ccols.size == 2, s"$base declares no 2-column clustering domain")
    require(rowTrackingConf(spark, base, version).isEmpty,
      "clustered OPTIMIZE on a row-tracked table is beyond this minimal writer")
    require(DeltaLogReader.partitionColumns(Some(spark), base, version).isEmpty,
      "liquid clustering replaces hive partitioning — not combined here")
    val live = DeltaLogReader.snapshotFiles(Some(spark), base, version)
    requireNoDv(live, "OPTIMIZE (clustered)")
    val df = spark.read.parquet(live.map(a => s"$base/${a.path}"): _*)
    val Seq(c1, c2) = ccols
    val mm = df.agg(
      org.apache.spark.sql.functions.min(col(c1)).cast("long"),
      org.apache.spark.sql.functions.max(col(c1)).cast("long"),
      org.apache.spark.sql.functions.min(col(c2)).cast("long"),
      org.apache.spark.sql.functions.max(col(c2)).cast("long")).head()
    def cell(c: String, lo: Long, hi: Long) =
      expr(s"(($c - $lo) * 8) div ${math.max(1L, hi - lo + 1)}")
    val bx = cell(c1, mm.getLong(0), mm.getLong(1))
    val by = cell(c2, mm.getLong(2), mm.getLong(3))
    val z = (0 until 3).map { i =>
      val xb = shiftleft(shiftrightunsigned(bx, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftrightunsigned(by, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
    require(zBuckets > 0 && 64 % zBuckets == 0 && Integer.bitCount(64 / zBuckets) == 1,
      s"zBuckets must be a power-of-two divisor of 64, got $zBuckets")
    val shift = Integer.numberOfTrailingZeros(64 / zBuckets)
    val next = version + 1
    // one write task per occupied z-bucket (partitionBy staging), then
    // flat deterministic names — no hive dirs on a clustered table
    val tmp = s"$base/.stage-zopt$next"
    TxnLog.rmrf(tmp)
    df.withColumn("__zb", shiftrightunsigned(z, shift))
      .repartition(col("__zb"))
      .write.partitionBy("__zb").parquet(tmp)
    val rels = Files.list(Paths.get(tmp)).iterator.asScala
      .filter(_.getFileName.toString.startsWith("__zb="))
      .flatMap { dir =>
        val zb = dir.getFileName.toString.stripPrefix("__zb=")
        val parts = Files.list(dir).iterator.asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        require(parts.size == 1, s"z-bucket $zb staged ${parts.size} files")
        val rel = s"v$next-zb$zb.parquet"
        Files.move(parts.head, Paths.get(base, rel))
        Seq(rel)
      }.toSeq.sorted
    TxnLog.rmrf(tmp)
    val adds = addActions(spark, base, rels, statsFor = ccols)
      .map(_.replace("\"dataChange\":true", "\"dataChange\":false"))
    val removes = live.map(a =>
      s"""{"remove":{"path":"${esc(a.path)}","deletionTimestamp":0,"dataChange":false}}""")
    commit(base, next,
      s"""{"commitInfo":{"operation":"OPTIMIZE","timestamp":0}}""" +: (removes ++ adds))
    (live.size, rels.size)
  }

  /** Create a ROW-TRACKED Delta table (the `rowTracking` +
    * `domainMetadata` writer features): every add action carries
    * `baseRowId` (a fresh contiguous id range per file) and
    * `defaultRowCommitVersion`, the metadata names the MATERIALIZED
    * column spellings rewrites must use, and the
    * `delta.rowTracking` domain records the id high-water mark —
    * [[DeltaLogReader.readRowIds]] surfaces `_row_id` /
    * `_row_commit_version` per the spec's base+position rule. */
  def createRowTracked(spark: SparkSession, df: DataFrame, base: String,
                       tableId: String, statsFor: Seq[String] = Nil): Unit = {
    TxnLog.rmrf(base)
    val rels = writeData(df, base, 0L)
    val (adds, total) = addActionsCounted(spark, base, rels, statsFor, Some((0L, 0L)))
    val conf = Seq(
      """"delta.enableRowTracking":"true"""",
      """"delta.rowTracking.materializedRowIdColumnName":"_row_id_mat"""",
      """"delta.rowTracking.materializedRowCommitVersionColumnName":"_row_commit_mat"""")
      .mkString("{", ",", "}")
    commit(base, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["domainMetadata","rowTracking"]}}""",
      s"""{"metaData":{"id":"${esc(tableId)}","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${esc(df.schema.json)}","partitionColumns":[],""" +
        s""""configuration":$conf,"createdTime":0}}""",
      rowTrackingDomain(total - 1)) ++ adds)
  }

  /** ALTER TABLE ADD CONSTRAINT (CHECK): a metaData-only commit whose
    * configuration carries `delta.constraints.<name>` and whose
    * protocol bumps minWriterVersion to 3 (the spec's constraint
    * writer version — feature-blind writers must not append
    * unvalidated rows). Existing rows must already satisfy it. */
  def addConstraint(spark: SparkSession, base: String,
                    name: String, expr: String): Unit = {
    import org.apache.spark.sql.functions.{expr => sqlExpr}
    val version = DeltaLogReader.latestVersion(base)
    require(DeltaLogReader.columnMappingSchema(Some(spark), base, version).isEmpty,
      "constraints on a column-mapped table are beyond this minimal writer")
    val bad = DeltaLogReader.read(spark, base)
      .filter(!sqlExpr(expr).eqNullSafe(true)).count()
    require(bad == 0L, s"$bad existing rows violate CHECK ($expr) — constraint not added")
    val (id, schema, pcols, _) = latestMetaData(spark, base, version)
    val all = DeltaLogReader.constraintsOf(Some(spark), base, version) + (name -> expr)
    val conf = all.toSeq.sortBy(_._1)
      .map { case (n, e) => s""""delta.constraints.${esc(n)}":"${esc(e)}"""" }
      .mkString("{", ",", "}")
    val pc = pcols.map(c => s""""${esc(c)}"""").mkString("[", ",", "]")
    commit(base, version + 1, Seq(
      s"""{"commitInfo":{"operation":"ADD CONSTRAINT","timestamp":0}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":3}}""",
      s"""{"metaData":{"id":"${esc(id)}","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${esc(schema)}","partitionColumns":$pc,""" +
        s""""configuration":$conf,"createdTime":0}}"""))
  }

  /** Append-only commit: the table's next version adds `df`'s rows.
    * Partitioning follows the table's declared partitionColumns.
    * Declared CHECK constraints are validated BEFORE any data is
    * staged — a violating batch aborts the whole transaction with
    * nothing on disk, the spec's writer obligation. */
  def append(spark: SparkSession, df: DataFrame, base: String,
             statsFor: Seq[String] = Nil): Unit = {
    val version = DeltaLogReader.latestVersion(base) + 1
    DeltaLogReader.constraintsOf(Some(spark), base, version - 1).foreach { case (name, e) =>
      import org.apache.spark.sql.functions.{expr => sqlExpr}
      val bad = df.filter(!sqlExpr(e).eqNullSafe(true)).count()
      require(bad == 0L,
        s"append violates CHECK constraint $name ($e) on $bad rows — transaction aborted")
    }
    val rels = writeData(df, base, version,
      DeltaLogReader.partitionColumns(Some(spark), base, version - 1))
    rowTrackingConf(spark, base, version - 1) match {
      case Some(_) =>
        // fresh ids start ABOVE the high-water mark; the same commit
        // bumps the mark so ids are never reused
        val hwm = DeltaLogReader.rowIdHighWaterMark(Some(spark), base, version - 1)
          .getOrElse(-1L)
        val (adds, total) =
          addActionsCounted(spark, base, rels, statsFor, Some((hwm + 1, version)))
        commit(base, version,
          Seq(s"""{"commitInfo":{"operation":"WRITE","timestamp":0}}""",
            rowTrackingDomain(hwm + total)) ++ adds)
      case None =>
        commit(base, version,
          s"""{"commitInfo":{"operation":"WRITE","timestamp":0}}""" +:
            addActions(spark, base, rels, statsFor))
    }
  }

  /** Schema-evolving append (ADD COLUMN + write in one commit, the
    * mergeSchema write): `df`'s schema must be a SUPERSET of the
    * table's current columns (same names may widen nullability only);
    * the commit carries a new metaData with the union schema, and
    * every earlier file's rows surface the new columns as NULL under
    * the log-enforced read — no old file is rewritten (the evolution
    * economics at 100 TB). */
  def appendEvolved(spark: SparkSession, df: DataFrame, base: String,
                    statsFor: Seq[String] = Nil): Unit = {
    val version = DeltaLogReader.latestVersion(base) + 1
    require(rowTrackingConf(spark, base, version - 1).isEmpty,
      "schema-evolving append on a row-tracked table is beyond this " +
        "minimal writer — it would add id-less files; use append")
    val pcols = DeltaLogReader.partitionColumns(Some(spark), base, version - 1)
    require(pcols.forall(df.columns.contains),
      s"evolved schema drops a partition column (${pcols.mkString(",")})")
    DeltaLogReader.tableSchema(Some(spark), base, version - 1).foreach { cur =>
      cur.fields.foreach { f =>
        val g = df.schema.fields.find(_.name == f.name).getOrElse(
          throw new IllegalArgumentException(
            s"evolved schema drops column ${f.name} — only ADD COLUMN is supported"))
        require(g.dataType == f.dataType,
          s"evolved schema changes ${f.name}: ${f.dataType} -> ${g.dataType}")
      }
    }
    val rels = writeData(df, base, version, pcols)
    val pc = pcols.map(c => s""""${esc(c)}"""").mkString("[", ",", "]")
    commit(base, version,
      Seq(s"""{"commitInfo":{"operation":"WRITE","timestamp":0}}""",
        s"""{"metaData":{"id":"graft","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":"${esc(df.schema.json)}","partitionColumns":$pc,""" +
          s""""configuration":{},"createdTime":0}}""") ++
        addActions(spark, base, rels, statsFor))
  }

  /** Create a COLUMN-MAPPED table (mode=name): parquet files carry
    * deterministic PHYSICAL names (`col-<id>`), the logical schema
    * lives only in the log — each field's metadata records its
    * `delta.columnMapping.physicalName`/`id`, the configuration sets
    * the mode, and the protocol is minReader 2 / minWriter 5 (the
    * column-mapping protocol). This is what any table that ever ran
    * ALTER TABLE RENAME COLUMN looks like. */
  def createColumnMapped(spark: SparkSession, df: DataFrame, base: String,
                         tableId: String): Unit = {
    import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
    TxnLog.rmrf(base)
    val phys = df.schema.fields.zipWithIndex.map { case (f, i) => f.name -> s"col-${i + 1}" }
    val physDf = phys.foldLeft(df) { case (d, (l, p)) => d.withColumnRenamed(l, p) }
    val rels = writeData(physDf, base, 0L)
    val logical = StructType(df.schema.fields.zipWithIndex.map { case (f, i) =>
      StructField(f.name, f.dataType, f.nullable, new MetadataBuilder()
        .putLong("delta.columnMapping.id", i + 1L)
        .putString("delta.columnMapping.physicalName", s"col-${i + 1}")
        .build())
    })
    commit(base, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"${esc(tableId)}","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${esc(logical.json)}","partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"name",""" +
        s""""delta.columnMapping.maxColumnId":"${phys.length}"},"createdTime":0}}""") ++
      addActions(spark, base, rels))
  }

  /** ALTER TABLE RENAME COLUMN on a column-mapped table: a
    * metaData-ONLY commit — the logical field name changes, the
    * physicalName stays, and NOT ONE data byte moves (the reason the
    * feature exists; on a 100 TB table this is the difference between
    * an instant and a rewrite). */
  def renameColumn(spark: SparkSession, base: String, from: String, to: String): Unit = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val version = DeltaLogReader.latestVersion(base)
    val logical = DeltaLogReader.columnMappingSchema(Some(spark), base, version).getOrElse(
      throw new IllegalArgumentException(
        s"renameColumn on $base, which is not column-mapped — a rename " +
          "would strand the parquet column names"))
    require(logical.fieldNames.contains(from), s"no column $from to rename")
    require(!logical.fieldNames.contains(to), s"column $to already exists")
    val renamed = StructType(logical.fields.map(f =>
      if (f.name == from) StructField(to, f.dataType, f.nullable, f.metadata) else f))
    val maxId = logical.fields.length
    commit(base, version + 1, Seq(
      s"""{"commitInfo":{"operation":"RENAME COLUMN","timestamp":0}}""",
      s"""{"metaData":{"id":"graft","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${esc(renamed.json)}","partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"name",""" +
        s""""delta.columnMapping.maxColumnId":"$maxId"},"createdTime":0}}"""))
  }

  /** Idempotent streaming append — the spec's `txn` (SetTransaction)
    * protocol, exactly what Delta's own streaming sink rides: every
    * commit carries `{"txn":{"appId","version"}}` with the micro-batch
    * id, and a redelivered batch is SKIPPED when the log already holds
    * a txn for this appId at or beyond it. The TABLE is the source of
    * truth, not the engine's checkpoint — at-least-once delivery +
    * this marker = exactly-once at the sink. Creates the table on the
    * first batch. Returns true when the batch was written. */
  def appendIfAbsent(spark: SparkSession, df: DataFrame, base: String,
                     appId: String, batchId: Long): Boolean = {
    val exists = Files.isDirectory(Paths.get(base, "_delta_log")) &&
      DeltaLogReader.versions(base).nonEmpty
    if (exists && DeltaLogReader.lastTxnVersion(Some(spark), base, appId).exists(_ >= batchId))
      return false
    val txn = s"""{"txn":{"appId":"${esc(appId)}","version":$batchId,"lastUpdated":0}}"""
    if (df.isEmpty) {
      // an empty batch still advances the watermark (txn-only commit);
      // it cannot CREATE a table — there is no schema to declare yet
      if (exists) commit(base, DeltaLogReader.latestVersion(base) + 1, Seq(txn))
      return exists
    }
    if (!exists) {
      TxnLog.rmrf(base)
      val rels = writeData(df, base, 0L)
      commit(base, 0L, Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"${esc(appId)}","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":"${esc(df.schema.json)}","partitionColumns":[],""" +
          s""""configuration":{},"createdTime":0}}""",
        txn) ++ addActions(spark, base, rels))
    } else {
      val version = DeltaLogReader.latestVersion(base) + 1
      require(rowTrackingConf(spark, base, version - 1).isEmpty,
        "streaming append into a row-tracked table is beyond this minimal " +
          "writer — it would add id-less files; use append")
      val rels = writeData(df, base, version,
        DeltaLogReader.partitionColumns(Some(spark), base, version - 1))
      commit(base, version,
        Seq(s"""{"commitInfo":{"operation":"STREAMING UPDATE","timestamp":0}}""", txn) ++
          addActions(spark, base, rels))
    }
    true
  }

  /** OPTIMIZE: bin-pack the current live files into
    * `ceil(liveBytes / targetBytes)` compacted files and commit the
    * rewrite as one version whose add AND remove actions all carry
    * `dataChange=false` — the spec's marker that the commit reshapes
    * storage without changing table content, which is what lets a
    * streaming consumer of the log skip it. Time travel to any prior
    * version keeps working (removes only drop paths from the live set;
    * the old part files stay on disk until VACUUM).
    *
    * The rewrite itself is the ordinary distributed read of just the
    * live files followed by a repartition to the packed file count —
    * at cluster scale this is the standard small-file compaction job,
    * and only the KB-scale commit JSON is driver-side. Returns the
    * (filesBefore, filesAfter) census so callers can report it. */
  def optimize(spark: SparkSession, base: String,
               targetBytes: Long = 128L << 20): (Int, Int) = {
    val version = DeltaLogReader.latestVersion(base)
    val pcols = DeltaLogReader.partitionColumns(Some(spark), base, version)
    val live = DeltaLogReader.snapshotFiles(Some(spark), base, version)
    requireNoDv(live, "OPTIMIZE")
    // partition dirs are independent pack domains (a file can only
    // merge with files of its own partition values) — bin-pack each
    // partition's live set separately and commit every rewrite in ONE
    // version. Non-partitioned tables are the single-domain case.
    val domains: Seq[(String, Seq[DeltaLogReader.DeltaAdd])] =
      if (pcols.isEmpty) Seq(("", live))
      else live.groupBy(a => a.path.take(a.path.lastIndexOf('/') + 1)).toSeq.sortBy(_._1)
    val next = version + 1
    // ROW TRACKING: a rewrite would reassign base+position ids, so the
    // packed files must MATERIALIZE each row's id and commit version
    // into the configured physical columns BEFORE the shuffle scrambles
    // positions — reads then prefer the materialized values
    val rtConf = rowTrackingConf(spark, base, version)
    def domainRead(files: Seq[DeltaLogReader.DeltaAdd]): DataFrame = {
      val paths = files.map(a => s"$base/${a.path}")
      rtConf match {
        case None => spark.read.parquet(paths: _*)
        case Some(conf) =>
          import org.apache.spark.sql.functions.{broadcast, coalesce, regexp_replace}
          val matId = conf.getOrElse("delta.rowTracking.materializedRowIdColumnName",
            "_row_id_mat")
          val matVer = conf.getOrElse(
            "delta.rowTracking.materializedRowCommitVersionColumnName", "_row_commit_mat")
          val raw = spark.read.option("mergeSchema", "true").parquet(paths: _*)
          val meta = files.map(a => (
            Paths.get(base).toAbsolutePath.normalize.resolve(a.path).normalize.toString,
            a.baseRowId.map(java.lang.Long.valueOf).orNull,
            a.defaultRowCommitVersion.map(java.lang.Long.valueOf).orNull))
          val metaDf = spark.createDataFrame(meta).toDF("__rt_path", "__rt_base", "__rt_ver")
          def matCol(c: String) = if (raw.columns.contains(c)) col(c) else lit(null)
          val userCols = raw.columns.filterNot(c => c == matId || c == matVer).map(col).toSeq
          raw
            .withColumn("__path", regexp_replace(col("_metadata.file_path"), "^file:/*", "/"))
            .withColumn("__pos", col("_metadata.row_index"))
            .join(broadcast(metaDf), col("__path") === col("__rt_path"))
            .select(userCols ++ Seq(
              coalesce(matCol(matId), col("__rt_base") + col("__pos"))
                .cast("long").as(matId),
              coalesce(matCol(matVer), col("__rt_ver")).cast("long").as(matVer)): _*)
      }
    }
    var counter = 0
    val packed = domains.flatMap { case (prefix, files) =>
      val bytes = files.map(_.size).sum
      val numOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      if (numOut >= files.size) None // this domain is already packed
      else {
        // stage the packed rewrite, then move parts under the SAME
        // partition dir — partition values live in the path (and the
        // add's partitionValues derive from it)
        val tmp = s"$base/.stage-opt$next-$counter"
        counter += 1
        TxnLog.rmrf(tmp)
        domainRead(files)
          .repartition(numOut).write.parquet(tmp)
        val rels = Files.list(Paths.get(tmp)).iterator.asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map { p =>
            val rel = s"$prefix" + s"v$next-${p.getFileName}"
            Files.createDirectories(Paths.get(base, rel).getParent)
            Files.move(p, Paths.get(base, rel))
            rel
          }.toSeq
        TxnLog.rmrf(tmp)
        Some((files, rels))
      }
    }
    if (packed.isEmpty) return (live.size, live.size) // nothing to pack
    // on a row-tracked table the NEW files still get fresh baseRowIds
    // (the spec: every add carries one) — reads prefer the materialized
    // columns, and the high-water mark bumps past the fresh range
    val hwm = rtConf.map(_ =>
      DeltaLogReader.rowIdHighWaterMark(Some(spark), base, version).getOrElse(-1L))
    val (adds0, total) = addActionsCounted(spark, base, packed.flatMap(_._2),
      rowTracking = hwm.map(h => (h + 1, next)))
    val adds = adds0.map(_.replace("\"dataChange\":true", "\"dataChange\":false"))
    val removes = packed.flatMap(_._1).map(a =>
      s"""{"remove":{"path":"${esc(a.path)}","deletionTimestamp":0,"dataChange":false}}""")
    val domainBump = hwm.map(h => rowTrackingDomain(h + total)).toSeq
    commit(base, next,
      (s"""{"commitInfo":{"operation":"OPTIMIZE","timestamp":0}}""" +: domainBump) ++
        (removes ++ adds))
    val rewrittenBefore = packed.map(_._1.size).sum
    val rewrittenAfter = packed.map(_._2.size).sum
    (live.size, live.size - rewrittenBefore + rewrittenAfter)
  }

  /** REORG TABLE ... APPLY (PURGE): MATERIALIZE the deletion vectors —
    * rewrite ONLY the DV-carrying files with their masks applied and
    * drop the descriptors. Content is IDENTICAL, so the commit is
    * `dataChange=false` (CDF/streaming consumers skip it, like
    * OPTIMIZE), and the purge unblocks every rewrite-based op
    * (OPTIMIZE / CoW DML / MERGE / RESTORE refuse DV tables rather
    * than resurrect masked rows). Files without a DV are NOT touched —
    * on a 100 TB table the rewrite cost is proportional to the
    * soft-deleted surface, not the table. Returns
    * (purgedFiles, droppedPositions). */
  def reorgPurge(spark: SparkSession, base: String): (Int, Long) = {
    val version = DeltaLogReader.latestVersion(base)
    require(DeltaLogReader.columnMappingSchema(Some(spark), base, version).isEmpty,
      "REORG PURGE on a column-mapped table is beyond this minimal writer")
    require(rowTrackingConf(spark, base, version).isEmpty,
      "REORG PURGE on a row-tracked table is beyond this minimal writer — " +
        "the purge rewrite would reassign row ids (OPTIMIZE materializes " +
        "them; the purge path does not yet)")
    val pcols = DeltaLogReader.partitionColumns(Some(spark), base, version)
    val live = DeltaLogReader.snapshotFiles(Some(spark), base, version)
    val withDv = live.filter(_.dv.isDefined)
    if (withDv.isEmpty) return (0, 0L)
    val masked = DeltaLogReader.readAddsWithDvs(spark, base, withDv, pcols)
    val next = version + 1
    // stats keys carried from the purged files keep data skipping alive
    val statsFor = withDv.flatMap(a => a.minValues.keys).distinct
    val rels = writeData(shapeRewrite(masked, pcols, withDv.size), base, next, pcols)
    val adds = addActions(spark, base, rels, statsFor)
      .map(_.replace("\"dataChange\":true", "\"dataChange\":false"))
    val removes = withDv.map(a =>
      s"""{"remove":{"path":"${esc(a.path)}","deletionTimestamp":0,"dataChange":false}}""")
    commit(base, next,
      s"""{"commitInfo":{"operation":"REORG","timestamp":0}}""" +: (removes ++ adds))
    (withDv.size, withDv.map(_.dv.get.cardinality).sum)
  }

  /** Rewrite-based ops read live parquet raw — on a DV-carrying table
    * they would resurrect soft-deleted rows, so they refuse instead. */
  private def requireNoDv(live: Seq[DeltaLogReader.DeltaAdd], op: String): Unit =
    require(live.forall(_.dv.isEmpty),
      s"$op over deletion vectors — materialize them first (rewrite the " +
        "DV-masked files) before running this rewrite op")

  /** Canonical stats JSON for an add action (numRecords stays the
    * PHYSICAL row count per spec, even under a deletion vector). */
  private def statsJsonOf(a: DeltaLogReader.DeltaAdd): String = {
    def side(tag: String, m: Map[String, Long]) =
      if (m.isEmpty) ""
      else m.toSeq.sortBy(_._1)
        .map { case (k, v) => s"""\\"${esc(k)}\\":$v""" }
        .mkString(s""",\\"$tag\\":{""", ",", "}")
    s"""{\\"numRecords\\":${a.numRecords}${side("minValues", a.minValues)}${side("maxValues", a.maxValues)}}"""
  }

  /** DELETE WHERE via DELETION VECTORS — the modern Delta DML shape:
    * no data file is rewritten; instead each affected file gets a
    * roaring-bitmap sidecar marking its deleted row positions, and the
    * commit swaps the file's add action for one carrying the
    * `deletionVector` descriptor (the one same-path remove+add the
    * spec allows in a commit). The commit also upgrades the protocol
    * to the table-features form (minReaderVersion 3 +
    * readerFeatures=[deletionVectors]) — exactly what makes modern
    * tables unreadable to feature-blind readers, which
    * [[DeltaLogReader]] now implements. Stacks: a second DV delete
    * unions positions into a fresh sidecar. Position sets are
    * DML-sized (KB-scale bitmaps), never table-sized. Returns
    * (affectedFiles, newlyDeletedRows). */
  def deleteWhereDv(spark: SparkSession, base: String,
                    predicate: org.apache.spark.sql.Column): (Int, Long) = {
    import org.apache.spark.sql.functions.{broadcast, col, regexp_replace}
    import org.apache.spark.sql.Encoders
    val version = DeltaLogReader.latestVersion(base)
    require(DeltaLogReader.columnMappingSchema(Some(spark), base, version).isEmpty,
      "DV DELETE on a column-mapped table is beyond this minimal writer " +
        "(the predicate would bind logical names against physical columns)")
    val pcols = DeltaLogReader.partitionColumns(Some(spark), base, version)
    val live = DeltaLogReader.snapshotFiles(Some(spark), base, version)
    val byAbs = live.map(a =>
      Paths.get(base).resolve(a.path).normalize.toString -> a).toMap
    // existing DV payloads as BYTES keyed by absolute path: positions
    // deserialize executor-side only (both for the already-masked
    // anti-join and the per-file merge below) — the driver never holds
    // a position list, just KB-scale bitmap blobs
    val existingBytes: Map[String, Array[Byte]] = live.flatMap(a => a.dv.map { d =>
      Paths.get(base).resolve(a.path).normalize.toString ->
        RoaringDv.loadPayload(base, d.storageType, d.pathOrInlineDv, d.offset, d.sizeInBytes)
    }).toMap
    val pairEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    val alreadyDf =
      if (existingBytes.isEmpty) None
      else Some(spark.createDataset(existingBytes.toSeq)(
          Encoders.tuple(Encoders.STRING, Encoders.BINARY))
        .flatMap { case (p, b) => RoaringDv.deserialize(b).map(pos => (p, pos)) }(pairEnc)
        .toDF("__dp", "__dq"))
    // matched = predicate-TRUE rows not already masked by a DV
    val scan = dmlScan(spark, base, live, pcols)
      .withColumn("__path", regexp_replace(col("_metadata.file_path"), "^file:/*", "/"))
      .withColumn("__pos", col("_metadata.row_index"))
    val matchedAll = scan.filter(predicate.eqNullSafe(true))
    val matched = alreadyDf.fold(matchedAll)(d => matchedAll.join(broadcast(d),
      col("__path") === col("__dp") && col("__pos") === col("__dq"), "left_anti"))
    // per-file bitmap construction runs EXECUTOR-side (one group per
    // affected file): the driver receives only (path, counts, payload)
    // rows — KB-scale serialized bitmaps, never the position lists, so
    // a wide DELETE at 100 TB cannot OOM the driver
    val exBc = spark.sparkContext.broadcast(existingBytes)
    val fileEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.BINARY)
    val perFile = matched.select(col("__path"), col("__pos")).as(pairEnc)
      .groupByKey(_._1)(Encoders.STRING)
      .mapGroups { (p, it) =>
        val fresh = it.map(_._2).toArray
        val merged = (exBc.value.get(p).map(RoaringDv.deserialize).getOrElse(Seq.empty) ++
          fresh).distinct.sorted
        (p, fresh.length.toLong, merged.size.toLong, RoaringDv.serialize(merged))
      }(fileEnc)
      .collect().sortBy(_._1)
    if (perFile.isEmpty) return (0, 0L)
    val next0 = version + 1
    // CDF: the newly-masked rows ride a _change_data file, so
    // readChanges' cdc-priority rule represents this commit by THEM —
    // without it the same-path remove+add pair would derive a
    // whole-file delete AND a whole-file insert (double counting)
    val newlyDeleted = matched.drop("__path", "__pos")
    val cdcActions = writeCdc(spark, base, next0,
      newlyDeleted.withColumn("_change_type", lit("delete")), perFile.length)
    val actions = perFile.toSeq.map { case (abs, _, card, payload) =>
      val a = byAbs.getOrElse(abs,
        throw new IllegalStateException(s"matched file $abs not in the live set"))
      val (uuidZ85, off, sz) = RoaringDv.writeDvPayload(base, payload)
      val dvJson = s""""deletionVector":{"storageType":"u","pathOrInlineDv":"$uuidZ85",""" +
        s""""offset":$off,"sizeInBytes":$sz,"cardinality":$card}"""
      // a row-tracked file's re-add must CARRY its baseRowId — dropping
      // it here would silently shift every surviving row's id
      val rt = (a.baseRowId, a.defaultRowCommitVersion) match {
        case (Some(b), Some(dv0)) =>
          s""""baseRowId":$b,"defaultRowCommitVersion":$dv0,"""
        case _ => ""
      }
      Seq(
        s"""{"remove":{"path":"${esc(a.path)}","deletionTimestamp":0,"dataChange":true}}""",
        s"""{"add":{"path":"${esc(a.path)}","partitionValues":${partitionValuesOf(a.path)},""" +
          s""""size":${a.size},"modificationTime":0,$rt"dataChange":true,""" +
          s""""stats":"${statsJsonOf(a)}",$dvJson}}""")
    }
    // upgrading to the table-features protocol (3, 7) must carry every
    // feature the PRIOR protocol implied (the spec's legacy mapping),
    // not just deletionVectors — dropping, say, an implied invariants
    // feature would let feature-blind writers append unvalidated rows
    val (mr0, mw0, rf0, wf0) = DeltaLogReader.latestProtocol(Some(spark), base, version)
    // legacy implication holds only BELOW the table-features versions
    // (at 3/7 the feature lists are already explicit)
    val legacyReader = if (mr0 >= 3) Nil else (2 to mr0).flatMap {
      case 2 => Seq("columnMapping")
      case _ => Nil
    }
    val legacyWriter = if (mw0 >= 7) Nil else (2 to mw0).flatMap {
      case 2 => Seq("appendOnly", "invariants")
      case 3 => Seq("checkConstraints")
      case 4 => Seq("generatedColumns", "changeDataFeed")
      case 5 => Seq("columnMapping")
      case 6 => Seq("identityColumns")
      case _ => Nil
    }
    def featJson(fs: Seq[String]) = fs.map(f => s""""$f"""").mkString("[", ",", "]")
    val readerFeats = (rf0 ++ legacyReader :+ "deletionVectors").distinct.sorted
    val writerFeats = (wf0 ++ legacyWriter :+ "deletionVectors").distinct.sorted
    commit(base, version + 1, Seq(
      s"""{"commitInfo":{"operation":"DELETE","timestamp":0}}""",
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        s""""readerFeatures":${featJson(readerFeats)},"writerFeatures":${featJson(writerFeats)}}}""") ++
      cdcActions ++ actions.flatten)
    (perFile.length, perFile.map(_._2).sum)
  }

  /** Partition-aware live-file scan for DML: partitioned tables read
    * via `basePath` so hive-path partition values surface as columns
    * (Delta keeps them OUT of the data files) and Catalyst's partition
    * pruning still applies to the DML predicate — on a 100 TB table a
    * `WHERE part = x` DELETE scans one partition, not the table. */
  private def dmlScan(spark: SparkSession, base: String,
                      live: Seq[DeltaLogReader.DeltaAdd], pcols: Seq[String]): DataFrame = {
    val files = live.map(a => s"$base/${a.path}")
    val version = DeltaLogReader.latestVersion(base)
    // the LOG's schema governs the scan (like the read path): on an
    // evolved table, pre-ADD-COLUMN files must surface the new column
    // as NULL — a footer-sampled scan schema would silently DROP the
    // column from every survivor the rewrite re-writes
    val declared = DeltaLogReader.tableSchema(Some(spark), base, version)
    if (pcols.isEmpty) {
      declared match {
        case Some(logical) => spark.read.schema(logical).parquet(files: _*)
        case None          => spark.read.parquet(files: _*)
      }
    } else {
      require(live.forall(a => pcols.forall(c => a.path.contains(c + "="))),
        s"partitioned Delta table (${pcols.mkString(",")}) with non-hive " +
          "data paths — partition values live only in the log; this " +
          "minimal writer supports hive-style layouts only")
      val reader = spark.read.option("basePath", base)
      declared match {
        case Some(logical) => reader.schema(logical).parquet(files: _*)
        case None          => reader.parquet(files: _*)
      }
    }
  }

  /** Copy-on-write core for DELETE/UPDATE: find the live files holding
    * predicate-matching rows (via the scan's own `_metadata.file_path`),
    * rewrite ONLY those files (survivors + post-images), and commit
    * removes + adds + a `cdc` action whose `_change_data/` file carries
    * the change rows — so [[DeltaLogReader.readChanges]] sees exactly
    * the DML's effect. Untouched files are not rewritten; on a
    * partitioned table the rewrite keeps the hive layout (an UPDATE
    * that changes a partition value routes the post-image to its new
    * partition), and untouched PARTITIONS never appear in the commit.
    * Returns (affectedFiles, matchedRows). */
  private def cowModify(spark: SparkSession, base: String, predicate: org.apache.spark.sql.Column,
                        op: String, post: Option[DataFrame => DataFrame]): (Int, Long) = {
    import org.apache.spark.sql.functions.{col, regexp_replace}
    val version = DeltaLogReader.latestVersion(base)
    require(rowTrackingConf(spark, base, version).isEmpty,
      s"$op (copy-on-write) on a row-tracked table is beyond this minimal " +
        "writer — the rewrite would reassign row ids; use the DV delete " +
        "(deleteWhereDv), which preserves them")
    val pcols = DeltaLogReader.partitionColumns(Some(spark), base, version)
    val live = DeltaLogReader.snapshotFiles(Some(spark), base, version)
    requireNoDv(live, op)
    val relByAbs = live.map(a =>
      Paths.get(base).resolve(a.path).normalize.toString -> a.path).toMap
    val scan = dmlScan(spark, base, live, pcols)
      .withColumn("__path", regexp_replace(col("_metadata.file_path"), "^file:/*", "/"))
    val matched = scan.filter(predicate)
    val affectedAbs = matched.select("__path").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (affectedAbs.isEmpty) return (0, 0L)
    val affectedRel = affectedAbs.map(a => relByAbs.getOrElse(a,
      throw new IllegalStateException(s"matched file $a not in the live set")))
    val inAffected = scan.filter(col("__path").isin(affectedAbs: _*))
    // SQL DML semantics: a row is matched only when the predicate is
    // TRUE — rows where it evaluates to NULL (e.g. a NULL column under
    // ===) must survive the rewrite, so the survivor filter is
    // NOT-null-safe-true, not the plain negation (which is NULL too)
    val survivors = inAffected.filter(!predicate.eqNullSafe(true)).drop("__path")
    val hit = matched.drop("__path")
    val nMatched = hit.count()
    val changes = post match {
      case None => hit.withColumn("_change_type", lit("delete"))
      case Some(f) => hit.withColumn("_change_type", lit("update_preimage"))
        .unionAll(f(hit).withColumn("_change_type", lit("update_postimage")))
    }
    val newData = post.fold(survivors)(f => survivors.unionAll(f(hit)))
    val next = version + 1
    val cdcActions = writeCdc(spark, base, next, changes, affectedRel.size)
    val adds =
      if (newData.isEmpty) Nil
      else addActions(spark, base,
        writeData(shapeRewrite(newData, pcols, affectedRel.size), base, next, pcols))
    val removes = affectedRel.map(rel =>
      s"""{"remove":{"path":"${esc(rel)}","deletionTimestamp":0,"dataChange":true}}""")
    commit(base, next,
      s"""{"commitInfo":{"operation":"$op","timestamp":0}}""" +:
        (cdcActions ++ removes ++ adds))
    (affectedRel.size, nMatched)
  }

  /** Shape a DML rewrite for the write: partitioned tables repartition
    * by the partition columns (one write task per live partition value
    * — the rewrite parallelizes with the partitions it touches); flat
    * tables cap at one task per affected file. Never `coalesce(1)` —
    * a wide DELETE's rewrite must not serialize onto one task. */
  private def shapeRewrite(df: DataFrame, pcols: Seq[String],
                           affected: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (pcols.nonEmpty) df.repartition(pcols.map(col): _*)
    else df.coalesce(math.max(1, affected))
  }

  /** Stage the commit's `_change_data` files (one task per affected
    * file, up to the data's own parallelism — a wide DML's change set
    * is data-sized and must not serialize) and return one cdc action
    * per staged part. */
  private def writeCdc(spark: SparkSession, base: String, version: Long,
                       changes: DataFrame, affected: Int): Seq[String] = {
    Files.createDirectories(Paths.get(base, "_change_data"))
    val cdcTmp = s"$base/.stage-cdc$version"
    TxnLog.rmrf(cdcTmp)
    changes.coalesce(math.max(1, affected)).write.parquet(cdcTmp)
    val rels = Files.list(Paths.get(cdcTmp)).iterator.asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.getFileName.toString)
      .zipWithIndex.map { case (p, i) =>
        val rel = s"_change_data/cdc-$version-$i.parquet"
        Files.move(p, Paths.get(base, rel))
        rel
      }
    TxnLog.rmrf(cdcTmp)
    require(rels.nonEmpty, "no cdc file staged")
    rels.map(rel =>
      s"""{"cdc":{"path":"${esc(rel)}","partitionValues":{},""" +
        s""""size":${Files.size(Paths.get(base, rel))},"dataChange":false}}""")
  }

  /** DELETE WHERE — copy-on-write: matching rows disappear from the
    * rewritten files, and the CDF carries them as `delete` rows. */
  def deleteWhere(spark: SparkSession, base: String,
                  predicate: org.apache.spark.sql.Column): (Int, Long) =
    cowModify(spark, base, predicate, "DELETE", None)

  /** UPDATE ... WHERE — copy-on-write: matching rows are transformed by
    * `set`, and the CDF carries `update_preimage`/`update_postimage`
    * pairs. */
  def update(spark: SparkSession, base: String, predicate: org.apache.spark.sql.Column,
             set: DataFrame => DataFrame): (Int, Long) =
    cowModify(spark, base, predicate, "UPDATE", Some(set))

  /** MERGE (upsert) — ONE commit, like the real statement: source rows
    * REPLACE same-key table rows (whole-row UPDATE SET *), source rows
    * with unseen keys INSERT. Only the files holding matched keys are
    * rewritten (new keys ride the same new file); the commit's
    * `_change_data` file carries update_preimage/update_postimage
    * pairs AND the insert rows, so CDF consumers see the merge's exact
    * effect. `source` must have the table's data schema. Returns
    * (updatedRows, insertedRows). */
  def merge(spark: SparkSession, base: String, source: DataFrame,
            keyCol: String): (Long, Long) = {
    import org.apache.spark.sql.functions.{broadcast, col, regexp_replace}
    val version = DeltaLogReader.latestVersion(base)
    val pcols = DeltaLogReader.partitionColumns(Some(spark), base, version)
    val live = DeltaLogReader.snapshotFiles(Some(spark), base, version)
    requireNoDv(live, "MERGE")
    val relByAbs = live.map(a =>
      Paths.get(base).resolve(a.path).normalize.toString -> a.path).toMap
    val scan = dmlScan(spark, base, live, pcols)
      .withColumn("__path", regexp_replace(col("_metadata.file_path"), "^file:/*", "/"))
    val srcKeys = broadcast(source.select(col(keyCol)).distinct())
    val matched = scan.join(srcKeys, keyCol)
    val affectedAbs = matched.select("__path").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val affectedRel = affectedAbs.map(a => relByAbs.getOrElse(a,
      throw new IllegalStateException(s"matched file $a not in the live set")))
    val cols = scan.drop("__path").columns.toIndexedSeq
    val src = source.select(cols.map(col): _*)
    val updSrc = src.join(broadcast(scan.select(col(keyCol)).distinct()), keyCol, "left_semi")
      .select(cols.map(col): _*)
    val insSrc = src.join(broadcast(scan.select(col(keyCol)).distinct()), keyCol, "left_anti")
      .select(cols.map(col): _*)
    val survivors = scan.filter(col("__path").isin(affectedAbs: _*))
      .join(srcKeys, Seq(keyCol), "left_anti").select(cols.map(col): _*)
    val pre = matched.select(cols.map(col): _*)
    val nUpd = pre.count()
    val nIns = insSrc.count()
    require(nUpd + nIns > 0, "MERGE source matches nothing and inserts nothing")
    val changes = pre.withColumn("_change_type", lit("update_preimage"))
      .unionAll(updSrc.withColumn("_change_type", lit("update_postimage")))
      .unionAll(insSrc.withColumn("_change_type", lit("insert")))
    val next = version + 1
    val cdcActions = writeCdc(spark, base, next, changes, affectedRel.size + 1)
    val newData = survivors.unionAll(updSrc).unionAll(insSrc)
    val adds = addActions(spark, base,
      writeData(shapeRewrite(newData, pcols, affectedRel.size + 1), base, next, pcols))
    val removes = affectedRel.map(rel =>
      s"""{"remove":{"path":"${esc(rel)}","deletionTimestamp":0,"dataChange":true}}""")
    commit(base, next,
      s"""{"commitInfo":{"operation":"MERGE","timestamp":0}}""" +:
        (cdcActions ++ removes ++ adds))
    (nUpd, nIns)
  }

  /** RESTORE: make the table's NEXT version content-identical to
    * `toVersion` — as a new commit (history stays intact; this is how
    * the real feature works, a forward-moving revert, not a rollback):
    * remove every currently-live file the target lacks, add back every
    * target file the current snapshot dropped. Both sides are KB-scale
    * path-set diffs; no data file is read or written. Returns
    * (removed, readded) counts. */
  def restore(spark: SparkSession, base: String, toVersion: Long): (Int, Int) = {
    val current = DeltaLogReader.latestVersion(base)
    require(toVersion < current, s"restore target $toVersion is not before $current")
    val want = DeltaLogReader.snapshotFiles(Some(spark), base, toVersion)
    val have = DeltaLogReader.snapshotFiles(Some(spark), base, current)
    requireNoDv(want ++ have, "RESTORE")
    val wantP = want.map(_.path).toSet
    val haveP = have.map(_.path).toSet
    val removes = have.filterNot(a => wantP.contains(a.path)).map(a =>
      s"""{"remove":{"path":"${esc(a.path)}","deletionTimestamp":0,"dataChange":true}}""")
    val adds = want.filterNot(a => haveP.contains(a.path)).map { a =>
      // row-tracked files restore WITH their original ids (the old
      // log's add carried them; re-adding id-less would shift rows)
      val rt = (a.baseRowId, a.defaultRowCommitVersion) match {
        case (Some(b), Some(dv0)) =>
          s""""baseRowId":$b,"defaultRowCommitVersion":$dv0,"""
        case _ => ""
      }
      s"""{"add":{"path":"${esc(a.path)}","partitionValues":${partitionValuesOf(a.path)},""" +
        s""""size":${a.size},"modificationTime":0,$rt"dataChange":true}}"""
    }
    commit(base, current + 1,
      s"""{"commitInfo":{"operation":"RESTORE","readVersion":$toVersion,"timestamp":0}}""" +:
        (removes ++ adds))
    (removes.size, adds.size)
  }

  /** Write the spec's replay-bounding checkpoint for the CURRENT
    * version: one parquet file `<v>.checkpoint.parquet` holding every
    * action needed to reconstruct the snapshot — protocol, the REAL
    * metaData (schemaString + partitionColumns, folded from the log so
    * expired commits keep partitioned tables and external readers
    * whole), every appId's txn watermark (so [[expireLog]] never
    * re-opens the exactly-once window), and one row per live add
    * carrying partitionValues and the stats JSON (numRecords +
    * min/max bounds, so data skipping survives the expiry) — each in
    * its own nullable struct column, the spec's checkpoint schema
    * shape — then point `_last_checkpoint` at it. Remove tombstones
    * are NOT folded: this writer's expireLog cleans only the log,
    * never data files, so no reader consumes them here. Readers seed
    * the live set from the checkpoint and replay only the JSON tail —
    * O(tail) instead of O(history) on long-lived tables. */
  // -- checkpoint schemas (the spec's nullable-struct-per-action shape) --
  private val dvT = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("storageType", StringType),
      StructField("pathOrInlineDv", StringType),
      StructField("offset", LongType),
      StructField("sizeInBytes", IntegerType),
      StructField("cardinality", LongType)))
  }
  private val addT = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType),
      StructField("deletionVector", dvT),
      StructField("baseRowId", LongType),
      StructField("defaultRowCommitVersion", LongType)))
  }
  private val domainT = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("domain", StringType),
      StructField("configuration", StringType),
      StructField("removed", BooleanType)))
  }
  private val protoT = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType))))
  }
  private val metaT = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(StructField("provider", StringType)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))
  }
  private val txnT = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType),
      StructField("lastUpdated", LongType)))
  }

  /** The folded snapshot state every checkpoint flavor writes:
    * (version, one Row per protocol/metaData/txn action, one add Row
    * per live file). Remove tombstones are NOT folded: this writer's
    * expireLog only cleans the log, never data files, so no reader
    * needs them — documented, not spec-divergent for that use. */
  private def foldCheckpointState(spark: SparkSession, base: String)
  : (Long, Seq[org.apache.spark.sql.Row], Seq[org.apache.spark.sql.Row]) = {
    import org.apache.spark.sql.Row
    val version = DeltaLogReader.latestVersion(base)
    val live = DeltaLogReader.snapshotFiles(Some(spark), base, version)
    // fold the REAL table state, not placeholders: the latest metaData
    // (schemaString + partitionColumns — without it a post-expiry read
    // of a partitioned table would silently drop partition columns)
    // and every appId's txn watermark (without it expireLog would
    // re-open the exactly-once window for redelivered micro-batches)
    val meta = latestMetaData(spark, base, version)
    val txns = foldedTxns(spark, base, version)
    // fold the table's REAL protocol, features included — a DV table's
    // checkpoint advertising minReaderVersion 1 would invite
    // feature-blind external readers to scan the files raw and
    // resurrect soft-deleted rows after the JSON log expires
    val proto = DeltaLogReader.latestProtocol(Some(spark), base, version)
    def statsJson(a: DeltaLogReader.DeltaAdd): String = {
      def side(tag: String, m: Map[String, Long]) =
        if (m.isEmpty) ""
        else m.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":$v""" }
          .mkString(s""","$tag":{""", ",", "}")
      s"""{"numRecords":${a.numRecords}${side("minValues", a.minValues)}${side("maxValues", a.maxValues)}}"""
    }
    // domain metadata must survive into the checkpoint: a rowTracking
    // mark lost here would make the next append REUSE row ids after
    // expireLog, and a lost clustering domain would sever the declared
    // layout — fold every known domain, one action row each
    val domain = DeltaLogReader.rowIdHighWaterMark(Some(spark), base, version)
      .map(h => Row("delta.rowTracking", s"""{"rowIdHighWaterMark":$h}""", false)).toSeq ++ {
      val cc = DeltaLogReader.clusteringColumns(Some(spark), base, version)
      if (cc.isEmpty) Nil
      else Seq(Row("delta.clustering",
        cc.map(c => s"""["$c"]""").mkString("""{"clusteringColumns":[""", ",", "]}"),
        false))
    }
    val actionRows = (Seq(
      Row(Row(proto._1, proto._2,
        if (proto._3.isEmpty) null else proto._3,
        if (proto._4.isEmpty) null else proto._4), null, null, null),
      Row(null, Row(meta._1, Row("parquet"), meta._2, meta._3, meta._4, 0L), null, null)) ++
      txns.toSeq.sortBy(_._1).map { case (app, v) => Row(null, null, Row(app, v, 0L), null) }) ++
      domain.map(d => Row(null, null, null, d))
    val addRows = live.map(a =>
      Row(Row(a.path, partitionValuePairs(a.path).toMap, a.size, 0L, true, statsJson(a),
        a.dv.map(d => Row(d.storageType, d.pathOrInlineDv, d.offset,
          d.sizeInBytes, d.cardinality)).orNull,
        a.baseRowId.map(java.lang.Long.valueOf).orNull,
        a.defaultRowCommitVersion.map(java.lang.Long.valueOf).orNull)))
    (version, actionRows, addRows)
  }

  /** Stage-write one single-part parquet of `rows` and move it to
    * `dest`; returns the row count. */
  private def writeOneParquet(spark: SparkSession, stage: String,
                              rows: Seq[org.apache.spark.sql.Row],
                              schema: org.apache.spark.sql.types.StructType,
                              dest: java.nio.file.Path): Unit = {
    TxnLog.rmrf(stage)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1).write.parquet(stage)
    val part = Files.list(Paths.get(stage)).iterator.asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"stage $stage wrote no parquet"))
    Files.createDirectories(dest.getParent)
    Files.move(part, dest)
    TxnLog.rmrf(stage)
  }

  def checkpoint(spark: SparkSession, base: String): Long = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val (version, actions, adds) = foldCheckpointState(spark, base)
    val schema = StructType(Seq(
      StructField("protocol", protoT), StructField("metaData", metaT),
      StructField("txn", txnT), StructField("domainMetadata", domainT),
      StructField("add", addT)))
    val rows = actions.map(r => Row(r.get(0), r.get(1), r.get(2), r.get(3), null)) ++
      adds.map(r => Row(null, null, null, null, r.get(0)))
    val dir = Paths.get(base, "_delta_log")
    writeOneParquet(spark, s"$base/_delta_log/.ckpt-stage", rows, schema,
      dir.resolve(f"$version%020d.checkpoint.parquet"))
    Files.write(dir.resolve("_last_checkpoint"),
      s"""{"version":$version,"size":${rows.size}}""".getBytes(StandardCharsets.UTF_8))
    version
  }

  /** The spec's V2 CHECKPOINT (`checkpointPolicy=v2`), the layout
    * modern writers emit by default on large tables: the top-level
    * `<v>.checkpoint.<uniqueStr>.parquet` holds ONLY non-file actions —
    * `checkpointMetadata`, protocol, metaData, txn — plus `sidecar`
    * pointer rows; the add actions live in sidecar parquet files under
    * `_delta_log/_sidecars/`. The top-level file stays KB-scale no
    * matter how many files the snapshot holds, and sidecars
    * parallelize both write and read. Two sidecars are written (when
    * the live set allows) so readers must genuinely UNION them. */
  def checkpointV2(spark: SparkSession, base: String): Long = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val (version, actions, adds) = foldCheckpointState(spark, base)
    val sideSchema = StructType(Seq(StructField("add", addT)))
    val sideDir = Paths.get(base, "_delta_log", "_sidecars")
    val halves =
      if (adds.size <= 1) Seq(adds)
      else Seq(adds.take(adds.size / 2), adds.drop(adds.size / 2))
    val sidecars = halves.zipWithIndex.map { case (rows, i) =>
      // deterministic uuid-shaped names (fixture reproducibility); the
      // spec only requires uniqueness within _sidecars/
      val name = java.util.UUID.nameUUIDFromBytes(
        s"$base-$version-$i".getBytes(StandardCharsets.UTF_8)).toString + ".parquet"
      writeOneParquet(spark, s"$base/_delta_log/.sidecar-stage$i", rows, sideSchema,
        sideDir.resolve(name))
      (name, Files.size(sideDir.resolve(name)))
    }
    val ckptMetaT = StructType(Seq(StructField("version", LongType)))
    val sidecarT = StructType(Seq(
      StructField("path", StringType),
      StructField("sizeInBytes", LongType),
      StructField("modificationTime", LongType)))
    val topSchema = StructType(Seq(
      StructField("checkpointMetadata", ckptMetaT),
      StructField("sidecar", sidecarT),
      StructField("protocol", protoT), StructField("metaData", metaT),
      StructField("txn", txnT), StructField("domainMetadata", domainT)))
    val topRows =
      Row(Row(version), null, null, null, null, null) +:
      (sidecars.map { case (n, sz) => Row(null, Row(n, sz, 0L), null, null, null, null) } ++
        actions.map(r => Row(null, null, r.get(0), r.get(1), r.get(2), r.get(3))))
    val dir = Paths.get(base, "_delta_log")
    val unique = java.util.UUID.nameUUIDFromBytes(
      s"$base-$version-top".getBytes(StandardCharsets.UTF_8)).toString
    writeOneParquet(spark, s"$base/_delta_log/.ckpt-stage", topRows, topSchema,
      dir.resolve(f"$version%020d.checkpoint.$unique.parquet"))
    Files.write(dir.resolve("_last_checkpoint"),
      s"""{"version":$version,"size":${topRows.size}}""".getBytes(StandardCharsets.UTF_8))
    version
  }

  /** Latest metaData action at or before `version`: (id, schemaString,
    * partitionColumns, configuration). Seeds from a prior checkpoint's
    * folded metaData when the early commits are already expired, then
    * overlays any later JSON metaData (Delta replaces table metadata
    * wholesale). */
  private def latestMetaData(spark: SparkSession, base: String,
                             version: Long): (String, String, Seq[String], Map[String, String]) = {
    val vs = DeltaLogReader.versions(base).filter(_ <= version)
    var found: Option[(String, String, Seq[String], Map[String, String])] =
      if (vs.headOption.contains(0L)) None
      else DeltaLogReader.checkpointMeta(spark, base, vs.head)
    vs.foreach { v =>
      Files.readAllLines(Paths.get(base, "_delta_log", f"$v%020d.json"),
          StandardCharsets.UTF_8).asScala.foreach { line =>
        if (line.contains("\"metaData\"")) {
          val id = DeltaLogReader.strField(line, "id").getOrElse("graft")
          val schema = DeltaLogReader.strField(line, "schemaString").getOrElse("{}")
          val pcols = """"partitionColumns":\[([^\]]*)\]""".r
            .findFirstMatchIn(line)
            .map(g => """"([^"]*)"""".r.findAllMatchIn(g.group(1)).map(_.group(1)).toSeq)
            .getOrElse(Seq.empty)
          found = Some((id, schema, pcols, DeltaLogReader.configOf(line)))
        }
      }
    }
    found.getOrElse(throw new IllegalStateException(
      s"no metaData action found in $base's log or checkpoint — cannot checkpoint"))
  }

  /** Every appId's highest txn watermark at or before `version`,
    * seeded from a prior checkpoint's folded txn rows. */
  private def foldedTxns(spark: SparkSession, base: String,
                         version: Long): Map[String, Long] = {
    val vs = DeltaLogReader.versions(base).filter(_ <= version)
    val seed =
      if (vs.headOption.contains(0L)) Map.empty[String, Long]
      else DeltaLogReader.checkpointTxns(spark, base, vs.head)
    vs.foldLeft(seed) { (acc, v) =>
      Files.readAllLines(Paths.get(base, "_delta_log", f"$v%020d.json"),
          StandardCharsets.UTF_8).asScala.foldLeft(acc) { (m, line) =>
        if (!line.contains("\"txn\"")) m
        else {
          val app = DeltaLogReader.strField(line, "appId").getOrElse(
            throw new IllegalStateException(s"txn action without appId: $line"))
          val tv = DeltaLogReader.longField(line, "version").getOrElse(
            throw new IllegalStateException(s"txn action without version: $line"))
          m + (app -> math.max(tv, m.getOrElse(app, Long.MinValue)))
        }
      }
    }
  }

  /** VACUUM, the data half: delete part files no READABLE version
    * references (after [[expireLog]], readable = the checkpointed
    * version onward — so files only pre-checkpoint history referenced
    * become reclaimable, exactly the real feature's retention
    * semantics with the checkpoint as the horizon). The reference set
    * is a KB-scale path-set union over the readable snapshots; DV
    * sidecars, `_change_data` files and the log itself are never
    * touched. Time travel to vacuumed versions was already gone with
    * their commits. Returns how many data files were deleted. */
  def vacuum(spark: SparkSession, base: String): Int = {
    val referenced = DeltaLogReader.versions(base)
      .flatMap(v => DeltaLogReader.snapshotFiles(Some(spark), base, v))
      .map(_.path).toSet
    require(referenced.nonEmpty, s"vacuum would empty $base entirely")
    val root = Paths.get(base)
    val victims = Files.walk(root).iterator.asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString)
      .filterNot(rel => rel.startsWith("_") || referenced.contains(rel))
      .toSeq
    victims.foreach(rel => Files.delete(root.resolve(rel)))
    victims.size
  }

  /** Log cleanup (the metadata half of VACUUM): delete JSON commits
    * STRICTLY BEFORE the checkpointed version — they are redundant once
    * the checkpoint exists, and the spec permits removing them. Reads
    * at or after the checkpoint keep working; earlier time travel is
    * gone by design. Refuses to run without a checkpoint. Returns how
    * many commit files were deleted. */
  def expireLog(base: String): Int = {
    val dir = Paths.get(base, "_delta_log")
    val lc = dir.resolve("_last_checkpoint")
    require(Files.exists(lc), s"expireLog without a checkpoint under $base")
    val ckpt = DeltaLogReader.longField(
      Files.readString(lc, StandardCharsets.UTF_8), "version")
      .getOrElse(throw new IllegalStateException("_last_checkpoint has no version"))
    val victims = Files.list(dir).iterator.asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".json") && n.length == 25 && n.stripSuffix(".json").toLong < ckpt
      }.toSeq
    victims.foreach(Files.delete)
    victims.size
  }
}
