package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Read-only interop with the PUBLIC Delta Lake transaction-log layout
  * (the open delta-io protocol spec: `_delta_log/<v padded to 20>.json`,
  * one JSON "action" per line — `protocol`, `metaData`, `add`, `remove`,
  * `commitInfo`, …). This is what a user points the engine at when their
  * existing data already lives in a Delta table: no rewrite, the
  * manifest chain IS the source of truth.
  *
  * Scope (spec-conformant): version listing, snapshot reconstruction
  * by action replay (removes apply before adds within a commit — the
  * DV DML same-path swap is the one same-path pair the spec allows),
  * snapshot/time-travel reads that hand the live file list straight to
  * the parquet scan (column pruning and predicate pushdown work
  * exactly as on any parquet read), checkpoint-seeded O(tail) replay,
  * DELETION VECTORS (minReaderVersion 3 + readerFeatures, roaring
  * sidecars applied as a broadcast anti-join on `_metadata.row_index`
  * — see [[RoaringDv]]), and COLUMN MAPPING mode=name (physical→
  * logical projection per version). Unknown action types are skipped,
  * as the spec requires of readers; protocols demanding features
  * outside [[SupportedReaderFeatures]] are rejected rather than
  * silently misread.
  *
  * The JSON is parsed line-by-line on the driver with a tiny
  * field-extractor (the log is KB-scale metadata; the DATA path stays
  * fully distributed). At real scale the same replay runs over the log
  * via Spark — shape-identical, and the spec's checkpoint mechanism
  * bounds the replayed tail.
  */
object DeltaLogReader {

  /** Sessions whose DV path-spelling probe already passed (weak: a
    * stopped session must not pin its entry). */
  private val probedSessions = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Spec deletion-vector descriptor riding an add action: which rows
    * of the file are soft-deleted, as a serialized roaring bitmap in a
    * sidecar (`u`/`p`) or inline (`i`). */
  final case class DvDescriptor(storageType: String, pathOrInlineDv: String,
                                offset: Long, sizeInBytes: Int, cardinality: Long)

  final case class DeltaAdd(path: String, size: Long, dataChange: Boolean,
                            minValues: Map[String, Long] = Map.empty,
                            maxValues: Map[String, Long] = Map.empty,
                            numRecords: Long = -1L,
                            dv: Option[DvDescriptor] = None,
                            baseRowId: Option[Long] = None,
                            defaultRowCommitVersion: Option[Long] = None)

  /** Parse the `deletionVector` sub-object out of an add action line.
    * The closing brace is found with a quote-aware scan: the z85
    * alphabet puts `{`/`}` INSIDE pathOrInlineDv strings, so a naive
    * indexOf('}') truncates the object mid-field. */
  private[sources] def dvOf(line: String): Option[DvDescriptor] = {
    val i = line.indexOf("\"deletionVector\"")
    if (i < 0) return None
    var j = line.indexOf('{', i)
    var depth = 0
    var inStr = false
    var end = -1
    while (end < 0 && j < line.length) {
      val c = line.charAt(j)
      if (inStr) {
        if (c == '\\') j += 1
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) end = j
        case _ =>
      }
      j += 1
    }
    val obj = line.substring(i, if (end < 0) line.length else end + 1)
    Some(DvDescriptor(
      strField(obj, "storageType").getOrElse(
        throw new IllegalStateException(s"deletionVector without storageType: $line")),
      strField(obj, "pathOrInlineDv").getOrElse(
        throw new IllegalStateException(s"deletionVector without pathOrInlineDv: $line")),
      longField(obj, "offset").getOrElse(0L),
      longField(obj, "sizeInBytes").getOrElse(
        throw new IllegalStateException(s"deletionVector without sizeInBytes: $line")).toInt,
      longField(obj, "cardinality").getOrElse(-1L)))
  }

  /** Integral `minValues`/`maxValues` out of an add action's embedded
    * `stats` JSON string (quotes arrive backslash-escaped inside the
    * action line — match both spellings, the DeltaStream discipline). */
  private[graft] def statBounds(line: String, tag: String): Map[String, Long] = {
    val obj = (tag + "\\\\?\":\\s?\\{([^}]*)\\}").r
    obj.findFirstMatchIn(line).map { m =>
      "\\\\?\"(\\w+)\\\\?\":\\s?(-?[0-9]+)".r.findAllMatchIn(m.group(1))
        .map(kv => kv.group(1) -> kv.group(2).toLong).toMap
    }.getOrElse(Map.empty)
  }

  private def logDir(base: String): Path = Paths.get(base, "_delta_log")

  /** Committed JSON versions, ascending. The chain must be gap-free —
    * but it may START above 0 on a vacuumed table (pre-checkpoint
    * commits legally deleted; reads then require the checkpoint). */
  def versions(base: String): Seq[Long] = {
    val d = logDir(base)
    if (!Files.isDirectory(d)) return Seq.empty
    val vs = Fs.list(d).iterator
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".json") && n.length == 25)
      .map(n => n.stripSuffix(".json").toLong)
      .toSeq.sorted
    vs.zip(vs.drop(1)).foreach { case (a, b) =>
      require(b == a + 1, s"non-contiguous _delta_log: gap between $a and $b")
    }
    vs
  }

  def latestVersion(base: String): Long = {
    val vs = versions(base)
    require(vs.nonEmpty, s"no _delta_log under $base")
    vs.last
  }

  /** Extract a string field `"name":"value"` from one JSON action line.
    * Handles the escapes Delta paths legally contain (\" \\ \/ \uXXXX);
    * the writer-side fixture and any URI-encoded real path round-trip. */
  private[graft] def strField(json: String, name: String): Option[String] = {
    val key = "\"" + name + "\":\""
    val i = json.indexOf(key)
    if (i < 0) return None
    val sb = new StringBuilder
    var j = i + key.length
    while (j < json.length && json.charAt(j) != '"') {
      val c = json.charAt(j)
      if (c == '\\' && j + 1 < json.length) {
        json.charAt(j + 1) match {
          case 'u' =>
            sb.append(Integer.parseInt(json.substring(j + 2, j + 6), 16).toChar)
            j += 6
          case 'n' => sb.append('\n'); j += 2
          case 't' => sb.append('\t'); j += 2
          case 'r' => sb.append('\r'); j += 2
          case e => sb.append(e); j += 2
        }
      } else { sb.append(c); j += 1 }
    }
    Some(sb.toString)
  }

  private[graft] def longField(json: String, name: String): Option[Long] = {
    val m = ("\"" + java.util.regex.Pattern.quote(name) + "\":(-?[0-9]+)").r
    m.findFirstMatchIn(json).map(_.group(1).toLong)
  }

  private def partitionColsOfLine(line: String): Option[Seq[String]] = {
    val m = """"partitionColumns":\[([^\]]*)\]""".r
    m.findFirstMatchIn(line).map { g =>
      """"([^"]*)"""".r.findAllMatchIn(g.group(1)).map(_.group(1)).toSeq
    }
  }

  /** Partition columns from the LAST metaData action at or before
    * `version` (Delta replaces table metadata wholesale per commit).
    * On a vacuumed table (pre-checkpoint commits deleted) the v0
    * metaData JSON is gone — the checkpoint's folded metaData row
    * supplies it instead, then any later JSON metaData overrides. */
  def partitionColumns(base: String, version: Long): Seq[String] =
    partitionColumns(None, base, version)

  def partitionColumns(spark: Option[SparkSession], base: String, version: Long): Seq[String] = {
    val ckpt = spark.flatMap(s => checkpointAt(base, version).map((s, _)))
    var cols: Seq[String] = ckpt.map { case (s, cv) =>
      checkpointMeta(s, base, cv).map(_._3).getOrElse(Seq.empty)
    }.getOrElse {
      require(versions(base).headOption.contains(0L) || version < 0,
        s"vacuumed _delta_log under $base: table metadata needs the " +
          "checkpoint — pass a SparkSession to partitionColumns")
      Seq.empty
    }
    val from = ckpt.map(_._2 + 1).getOrElse(0L)
    (from to version).foreach { v =>
      val f = logDir(base).resolve(f"$v%020d.json")
      if (Files.exists(f))
        Files.readAllLines(f, StandardCharsets.UTF_8).asScala.foreach { line =>
          if (line.contains("\"metaData\""))
            partitionColsOfLine(line).foreach(cols = _)
        }
    }
    cols
  }

  /** The checkpoint's folded metaData row, if the checkpoint carries
    * one: (id, schemaString, partitionColumns, configuration). Older
    * checkpoints without the column return None; ones folded before
    * configuration was carried surface an empty map. */
  private[sources] def checkpointMeta(spark: SparkSession, base: String,
                                      cv: Long): Option[(String, String, Seq[String], Map[String, String])] = {
    import org.apache.spark.sql.functions.col
    val cp = checkpointFile(base, cv)
    val cdf = spark.read.parquet(cp.toString)
    if (!cdf.columns.contains("metaData")) return None
    val fields = cdf.schema("metaData").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    if (!fields.contains("partitionColumns")) return None
    val confCol =
      if (fields.contains("configuration")) col("metaData.configuration")
      else org.apache.spark.sql.functions.lit(null)
        .cast("map<string,string>")
    cdf.filter(col("metaData").isNotNull)
      .select(col("metaData.id"), col("metaData.schemaString"),
        col("metaData.partitionColumns"), confCol)
      .collect().headOption
      .map(r => (r.getString(0), r.getString(1), r.getSeq[String](2),
        if (r.isNullAt(3)) Map.empty[String, String]
        else r.getMap[String, String](3).toMap))
  }

  /** The checkpoint's folded protocol row, if present:
    * (minReaderVersion, minWriterVersion, readerFeatures,
    * writerFeatures). Checkpoints folded before the feature arrays
    * were carried surface them empty. */
  private[sources] def checkpointProtocol(spark: SparkSession, base: String, cv: Long)
  : Option[(Int, Int, Seq[String], Seq[String])] = {
    import org.apache.spark.sql.functions.col
    val cp = checkpointFile(base, cv)
    val cdf = spark.read.parquet(cp.toString)
    if (!cdf.columns.contains("protocol")) return None
    val fields = cdf.schema("protocol").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    if (!fields.contains("minReaderVersion")) return None
    def opt(name: String, tpe: String) =
      if (fields.contains(name)) col(s"protocol.$name").cast(tpe)
      else org.apache.spark.sql.functions.lit(null).cast(tpe)
    cdf.filter(col("protocol.minReaderVersion").isNotNull)
      .select(col("protocol.minReaderVersion").cast("int"), opt("minWriterVersion", "int"),
        opt("readerFeatures", "array<string>"), opt("writerFeatures", "array<string>"))
      .collect().headOption
      .map(r => (r.getInt(0), if (r.isNullAt(1)) 2 else r.getInt(1),
        if (r.isNullAt(2)) Seq.empty[String] else r.getSeq[String](2),
        if (r.isNullAt(3)) Seq.empty[String] else r.getSeq[String](3)))
  }

  /** The table's protocol in force at `version`: the LAST protocol
    * action at or before it, seeded from the checkpoint when the early
    * commits are expired. Defaults to the base (1, 2) protocol a table
    * created without one implies. */
  private[graft] def latestProtocol(spark: Option[SparkSession], base: String,
                                    version: Long): (Int, Int, Seq[String], Seq[String]) = {
    def featsOf(line: String, name: String): Seq[String] =
      ("\"" + name + "\":\\[([^\\]]*)\\]").r.findFirstMatchIn(line)
        .map(m => """"([^"]*)"""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
        .getOrElse(Seq.empty)
    val vs = versions(base).filter(_ <= version)
    var proto: (Int, Int, Seq[String], Seq[String]) =
      if (vs.headOption.contains(0L)) (1, 2, Seq.empty, Seq.empty)
      else spark.flatMap(s => checkpointAt(base, version)
          .flatMap(cv => checkpointProtocol(s, base, cv)))
        .getOrElse((1, 2, Seq.empty, Seq.empty))
    vs.foreach { v =>
      val f = logDir(base).resolve(f"$v%020d.json")
      if (Files.exists(f))
        Files.readAllLines(f, StandardCharsets.UTF_8).asScala.foreach { line =>
          if (line.contains("\"protocol\""))
            longField(line, "minReaderVersion").foreach { mr =>
              proto = (mr.toInt,
                longField(line, "minWriterVersion").map(_.toInt).getOrElse(proto._2),
                featsOf(line, "readerFeatures"), featsOf(line, "writerFeatures"))
            }
        }
    }
    proto
  }

  /** Reader features this engine honors (the table-features protocol:
    * minReaderVersion=3 lists the features a reader MUST implement). */
  private val SupportedReaderFeatures =
    // typeWidening/timestampNtz are honored because every scan enforces
    // the LOG schema (tableSchema → spark.read.schema) and Spark's
    // parquet reader upcasts narrow physical types natively
    Set("deletionVectors", "columnMapping", "v2Checkpoint",
      "typeWidening", "timestampNtz")

  /** Fail fast on tables this minimal reader cannot honor. Version 1
    * needs nothing; version 2 is column mapping by protocol version
    * (implemented — see [[columnMappingSchema]]); version 3 is
    * readable iff every listed readerFeature is implemented here. */
  private def assertReadable(line: String): Unit =
    longField(line, "minReaderVersion").foreach { v =>
      if (v == 3L) {
        val feats = """"readerFeatures":\[([^\]]*)\]""".r
          .findFirstMatchIn(line)
          .map(m => """"([^"]*)"""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSet)
          .getOrElse(Set.empty[String])
        val unsupported = feats -- SupportedReaderFeatures
        require(unsupported.isEmpty,
          s"Delta readerFeatures ${unsupported.mkString(",")} not implemented " +
            s"by this reader (supported: ${SupportedReaderFeatures.mkString(",")})")
      } else require(v <= 2L,
        s"Delta protocol minReaderVersion=$v requires reader features " +
          "outside this minimal reader")
    }

  /** Scan one JSON string token starting at its opening quote; returns
    * (unescaped value, index past the closing quote). */
  private def scanString(s: String, from: Int): (String, Int) = {
    val sb = new StringBuilder
    var j = from + 1
    while (j < s.length && s.charAt(j) != '"') {
      val c = s.charAt(j)
      if (c == '\\' && j + 1 < s.length) {
        s.charAt(j + 1) match {
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(j + 2, j + 6), 16).toChar)
            j += 6
          case 'n' => sb.append('\n'); j += 2
          case 't' => sb.append('\t'); j += 2
          case 'r' => sb.append('\r'); j += 2
          case e => sb.append(e); j += 2
        }
      } else { sb.append(c); j += 1 }
    }
    (sb.toString, j + 1)
  }

  /** The metaData line's `configuration` map (flat string→string per
    * the spec), parsed with balanced braces and string escapes so CHECK
    * expressions containing quotes or braces can't corrupt it. */
  private[sources] def configOf(line: String): Map[String, String] = {
    val key = "\"configuration\":{"
    val i = line.indexOf(key)
    if (i < 0) return Map.empty
    val start = i + key.length - 1 // at '{'
    var j = start
    var depth = 0
    var inStr = false
    var end = -1
    while (j < line.length && end < 0) {
      val c = line.charAt(j)
      if (inStr) {
        if (c == '\\') j += 1
        else if (c == '"') inStr = false
      } else {
        if (c == '"') inStr = true
        else if (c == '{') depth += 1
        else if (c == '}') { depth -= 1; if (depth == 0) end = j }
      }
      j += 1
    }
    require(end > start, s"unterminated configuration object in: $line")
    val out = Map.newBuilder[String, String]
    var p = start + 1
    while (p < end) {
      if (line.charAt(p) == '"') {
        val (k, afterK) = scanString(line, p)
        var q = afterK
        while (q < end && line.charAt(q) != '"') q += 1
        require(q < end, s"configuration key $k without a string value")
        val (v, afterV) = scanString(line, q)
        out += k -> v
        p = afterV
      } else p += 1
    }
    out.result()
  }

  /** The LAST metaData's (schemaString, configuration) at or before
    * `version` — the JSON tail overriding, the checkpoint's folded
    * metaData seeding when the early commits are already expired
    * (without the seed, a checkpointed+expired column-mapped or
    * constrained table would silently lose its mapping/constraints). */
  private[sources] def latestMetaConfig(spark: Option[SparkSession], base: String,
                                        version: Long): Option[(String, Map[String, String])] = {
    val vs = versions(base).filter(_ <= version)
    var found: Option[(String, Map[String, String])] =
      if (vs.headOption.contains(0L)) None
      else spark.flatMap(s => checkpointAt(base, version)
        .flatMap(cv => checkpointMeta(s, base, cv)).map(m => (m._2, m._4)))
    vs.foreach { v =>
      val f = logDir(base).resolve(f"$v%020d.json")
      if (Files.exists(f))
        Files.readAllLines(f, StandardCharsets.UTF_8).asScala.foreach { line =>
          if (line.contains("\"metaData\""))
            found = Some((strField(line, "schemaString").getOrElse("{}"), configOf(line)))
        }
    }
    found
  }

  /** Sampled loudness check for id-bound reads: the given data file's
    * footer must embed parquet field ids (the spec's writer
    * requirement on column-mapped tables) — catches id-less foreign
    * files BEFORE `fieldId.read.ignoreMissing` would turn them into a
    * silent all-NULL read. One KB-scale footer open on the driver. */
  private[graft] def assertEmbeddedIds(spark: SparkSession, file: String): Unit = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val fields = r.getFooter.getFileMetaData.getSchema.getFields
      require(fields.asScala.exists(_.getId != null),
        s"column-mapped table data file $file embeds NO parquet field ids — " +
          "id-bound reads would silently surface NULLs; the writer that " +
          "produced this file violates the spec")
    } finally r.close()
  }

  /** The table's `metaData.id` at `version` — the spec treats it as a
    * STABLE table GUID (external readers interpret an id change as
    * table replacement), so every metadata-replacing commit must carry
    * the original id forward. */
  private[sources] def latestMetaId(spark: Option[SparkSession], base: String,
                                    version: Long): Option[String] = {
    val vs = versions(base).filter(_ <= version)
    var found: Option[String] =
      if (vs.headOption.contains(0L)) None
      else spark.flatMap(s => checkpointAt(base, version)
        .flatMap(cv => checkpointMeta(s, base, cv)).map(_._1))
    vs.foreach { v =>
      val f = logDir(base).resolve(f"$v%020d.json")
      if (Files.exists(f))
        Files.readAllLines(f, StandardCharsets.UTF_8).asScala.foreach { line =>
          if (line.contains("\"metaData\""))
            found = strField(line, "id").orElse(found)
        }
    }
    found
  }

  /** Column-mapping (mode=name) schema of the table at `version`, if
    * the latest metaData declares it: tables that ever RENAMED a
    * column write `delta.columnMapping.mode=name` and address parquet
    * columns by each field's `delta.columnMapping.physicalName`
    * metadata — the logical schema is log-only, so a mapping-blind
    * reader sees the physical uuid names (or misses renamed columns
    * entirely). Returns the LOGICAL schema whose field metadata
    * carries the physical names. */
  private[sources] def columnMappingSchema(base: String, version: Long)
  : Option[org.apache.spark.sql.types.StructType] =
    columnMappingSchema(None, base, version)

  private[sources] def columnMappingSchema(spark: Option[SparkSession], base: String,
                                           version: Long)
  : Option[org.apache.spark.sql.types.StructType] =
    latestMetaConfig(spark, base, version)
      .filter(_._2.contains("delta.columnMapping.mode"))
      .map { case (schemaJson, conf) =>
        val mode = conf("delta.columnMapping.mode")
        require(mode == "name" || mode == "id",
          s"delta.columnMapping.mode=$mode — only 'name' and 'id' are supported")
        org.apache.spark.sql.types.DataType.fromJson(schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
      }

  /** The declared column-mapping mode ("name" | "id"), if any. */
  private[sources] def columnMappingMode(spark: Option[SparkSession], base: String,
                                         version: Long): Option[String] =
    latestMetaConfig(spark, base, version).flatMap(_._2.get("delta.columnMapping.mode"))

  /** TIMESTAMP AS OF resolution: the latest version whose commit
    * timestamp is at or before `tsMillis` — the spec reads the
    * commitInfo `timestamp` (the in-commit-provenance field; real
    * Delta falls back to file mtimes, which are not reproducible and
    * therefore rejected here rather than silently used). Fails when
    * the table predates no commit (ts before the first commit) or a
    * commit carries no timestamp. */
  def versionAtTimestamp(base: String, tsMillis: Long): Long = {
    val stamped = versions(base).map { v =>
      val ts = Files.readAllLines(logDir(base).resolve(f"$v%020d.json"), StandardCharsets.UTF_8)
        .asScala.collectFirst {
          case line if line.contains("\"commitInfo\"") =>
            longField(line, "timestamp").getOrElse(
              throw new IllegalStateException(s"commitInfo without timestamp at version $v"))
        }.getOrElse(throw new IllegalArgumentException(
          s"version $v of $base has no commitInfo timestamp — " +
            "timestamp travel needs in-commit provenance, not file mtimes"))
      (v, ts)
    }
    stamped.zip(stamped.drop(1)).foreach { case ((va, a), (vb, b)) =>
      require(a <= b, s"non-monotonic commit timestamps: v$va=$a > v$vb=$b")
    }
    val at = stamped.filter(_._2 <= tsMillis)
    require(at.nonEmpty,
      s"no commit of $base at or before timestamp $tsMillis (first is ${stamped.head._2})")
    at.last._1
  }

  /** `_last_checkpoint` pointer (spec: JSON `{"version":N,"size":M}`),
    * if present and usable for `version` (checkpoint ≤ requested). */
  private def checkpointAt(base: String, version: Long): Option[Long] = {
    val p = logDir(base).resolve("_last_checkpoint")
    if (!Files.exists(p)) return None
    longField(Files.readString(p, StandardCharsets.UTF_8), "version")
      .filter(_ <= version)
  }

  /** Resolve checkpoint version `cv` to its parquet file: the classic
    * `<v>.checkpoint.parquet`, else the V2 spelling
    * `<v>.checkpoint.<uniqueStr>.parquet` (UUID-named, what
    * checkpointPolicy=v2 writers emit). */
  private def checkpointFileOpt(base: String, cv: Long): Option[Path] = {
    val d = logDir(base)
    val classic = d.resolve(f"$cv%020d.checkpoint.parquet")
    if (Files.exists(classic)) return Some(classic)
    if (!Files.isDirectory(d)) return None
    val prefix = f"$cv%020d.checkpoint."
    val matches = Fs.list(d).iterator.filter { p =>
      val n = p.getFileName.toString
      n.startsWith(prefix) && n.endsWith(".parquet")
    }.toSeq
    require(matches.size <= 1,
      s"ambiguous checkpoint for version $cv under $d: $matches")
    matches.headOption
  }

  private def checkpointFile(base: String, cv: Long): Path =
    checkpointFileOpt(base, cv).getOrElse(throw new IllegalStateException(
      s"_last_checkpoint points at version $cv but no checkpoint parquet exists"))

  /** Live file set at `version`.
    *
    * With a usable checkpoint (the spec's replay-bounding mechanism —
    * `_last_checkpoint` → `<v>.checkpoint.parquet`, one row per live
    * action): seed the live set from the checkpoint's `add` rows via a
    * regular Spark parquet read, then replay ONLY the JSON commits
    * after it. Without one: full action replay from 0. Either path
    * applies the same add/remove algebra; on a long-lived table the
    * checkpoint turns O(history) replay into O(tail). */
  def snapshotFiles(base: String, version: Long): Seq[DeltaAdd] =
    snapshotFiles(None, base, version)

  def snapshotFiles(spark: Option[SparkSession], base: String, version: Long): Seq[DeltaAdd] = {
    val live = scala.collection.mutable.LinkedHashMap.empty[String, DeltaAdd]
    val ckpt = spark.flatMap(s => checkpointAt(base, version).map((s, _)))
    ckpt.foreach { case (s, cv) =>
      val cp = checkpointFile(base, cv)
      import org.apache.spark.sql.functions.col
      val cdf = s.read.parquet(cp.toString)
      // the checkpoint carries the protocol action too — honor the
      // guard WITH its feature list (a v3 protocol reconstructed
      // featureless would skip the unsupported-feature check entirely)
      checkpointProtocol(s, base, cv).foreach { case (mr, _, rf, _) =>
        val feats = rf.map(f => s""""$f"""").mkString("[", ",", "]")
        assertReadable(
          s"""{"protocol":{"minReaderVersion":$mr,"readerFeatures":$feats}}""")
      }
      // V2 checkpoints (checkpointPolicy=v2): the top-level file holds
      // only non-file actions plus `sidecar` pointers; the add rows
      // live in sidecar parquet under _delta_log/_sidecars/ — read the
      // union (a classic checkpoint carries adds inline instead)
      val addSources: Seq[DataFrame] =
        (if (cdf.columns.contains("add")) Seq(cdf) else Nil) ++
          (if (!cdf.columns.contains("sidecar")) Nil
           else {
             val sidecars = cdf.filter(col("sidecar").isNotNull)
               .select(col("sidecar.path")).collect().map(_.getString(0))
               .map(p => if (p.startsWith("/") || p.contains("://")) p
                 else logDir(base).resolve("_sidecars").resolve(p).toString)
             if (sidecars.isEmpty) Nil else Seq(s.read.parquet(sidecars.toIndexedSeq: _*))
           })
      require(addSources.nonEmpty,
        s"checkpoint $cp carries neither add rows nor sidecar pointers")
      addSources.foreach { src =>
        val addFields = src.schema("add").dataType
          .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
        val statsCol = if (addFields.contains("stats")) col("add.stats")
                       else org.apache.spark.sql.functions.lit(null).cast("string")
        val dvCol = if (addFields.contains("deletionVector"))
          org.apache.spark.sql.functions.to_json(col("add.deletionVector"))
        else org.apache.spark.sql.functions.lit(null).cast("string")
        // row-tracking fields must SURVIVE checkpointing: after
        // expireLog a baseRowId dropped here would shift every row id
        def optL(f: String) = if (addFields.contains(f)) col(s"add.$f")
          else org.apache.spark.sql.functions.lit(null).cast("long")
        src.filter(col("add").isNotNull)
          .select(col("add.path"), col("add.size"), statsCol, dvCol,
            optL("baseRowId"), optL("defaultRowCommitVersion"))
          .collect()
          .foreach { r =>
            val stats = if (r.isNullAt(2)) "" else r.getString(2)
            val dv = if (r.isNullAt(3)) None
                     else dvOf("\"deletionVector\":" + r.getString(3))
            live(r.getString(0)) = DeltaAdd(r.getString(0),
              if (r.isNullAt(1)) 0L else r.getLong(1), dataChange = true,
              minValues = statBounds(stats, "minValues"),
              maxValues = statBounds(stats, "maxValues"),
              numRecords = DeltaStream.numRecords(stats),
              dv = dv,
              baseRowId = if (r.isNullAt(4)) None else Some(r.getLong(4)),
              defaultRowCommitVersion = if (r.isNullAt(5)) None else Some(r.getLong(5)))
          }
      }
    }
    val from = ckpt.map(_._2 + 1).getOrElse(0L)
    (from to version).foreach { v =>
      val f = logDir(base).resolve(f"$v%020d.json")
      require(Files.exists(f), s"missing Delta commit $v under $base")
      // removes apply BEFORE adds within one commit: a DV-writing DML
      // legally removes a path and re-adds it with a new deletionVector
      // in the same commit (the only same-path add+remove the spec
      // allows); for ordinary commits the order is immaterial
      val adds = Seq.newBuilder[DeltaAdd]
      Files.readAllLines(f, StandardCharsets.UTF_8).asScala.foreach { line =>
        if (line.contains("\"protocol\"")) assertReadable(line)
        if (line.contains("\"add\"")) {
          val p = strField(line, "path").getOrElse(
            throw new IllegalStateException(s"add action without path: $line"))
          adds += DeltaAdd(p, longField(line, "size").getOrElse(0L),
            dataChange = !line.contains("\"dataChange\":false"),
            minValues = statBounds(line, "minValues"),
            maxValues = statBounds(line, "maxValues"),
            numRecords = DeltaStream.numRecords(line),
            dv = dvOf(line),
            baseRowId = longField(line, "baseRowId"),
            defaultRowCommitVersion = longField(line, "defaultRowCommitVersion"))
        } else if (line.contains("\"remove\"")) {
          strField(line, "path").foreach(live.remove)
        }
      }
      adds.result().foreach(a => live(a.path) = a)
    }
    live.values.toSeq
  }

  /** The spelling `_metadata.file_path` uses for an absolute path —
    * URI-ENCODED (space → %20 etc.) with the `file:` scheme stripped to
    * a leading `/`. Every driver-side path that equi-joins against the
    * scan's `__path` column MUST go through this: a literal-space
    * spelling silently mismatches on any partition value containing a
    * space (`4-NOT SPECIFIED`), dropping rows from inner joins or
    * no-op'ing anti-join masks. */
  private[sources] def scanSpelling(abs: java.nio.file.Path): String = {
    val raw = abs.toAbsolutePath.normalize.toUri.getRawPath
    if (raw.length > 1 && raw.endsWith("/")) raw.dropRight(1) else raw
  }

  /** Apply each file's deletion vector (if any) to the scan: decode the
    * KB-scale bitmaps into (file, row_index) pairs — payload bytes ship
    * to executors, positions never materialize on the driver — and
    * LEFT ANTI join against Spark's native parquet row positions, the
    * same shape as Iceberg position deletes. Files without a DV pass
    * through untouched; pushdown and pruning on the data side survive
    * because the scan itself stays the ordinary parquet read. */
  private def applyDvs(spark: SparkSession, base: String,
                       adds: Seq[DeltaAdd], data: DataFrame): DataFrame = {
    val withDv = adds.filter(_.dv.isDefined)
    if (withDv.isEmpty) return data
    import org.apache.spark.sql.functions.{broadcast, col, regexp_replace}
    // both join sides must normalize to the SAME absolute form: the
    // driver side resolves rel paths against the ABSOLUTE table root
    // (a relative `base` would otherwise never match and the DVs would
    // silently no-op — soft-deleted rows resurrected with no error)
    // while the scan side strips the scan's `file:` URI scheme
    val absBase = Paths.get(base).toAbsolutePath.normalize
    val payloads: Seq[(String, Array[Byte])] = withDv.map { a =>
      val abs = scanSpelling(absBase.resolve(a.path))
      val d = a.dv.get
      (abs, RoaringDv.loadPayload(base, d.storageType, d.pathOrInlineDv,
        d.offset, d.sizeInBytes))
    }
    // sanity-pin the convention with one O(1-row) probe: a direct scan
    // of the first DV-carrying file must yield exactly the driver-side
    // spelling, else the anti-join keys have drifted (path encoding,
    // scheme, symlinks) and masked rows would leak back silently.
    // The convention is a (session, filesystem) property, not a table
    // property — probe ONCE per session: re-probing on every DV-masked
    // read scheduled two jobs per read (17 of each in one measured
    // query), all confirming the same invariant
    if (!probedSessions.contains(spark)) {
      val probeKey = scanSpelling(absBase.resolve(withDv.head.path))
      val probed = spark.read
        .parquet(absBase.resolve(withDv.head.path).normalize.toString)
        .select(regexp_replace(col("_metadata.file_path"), "^file:/*", "/"))
        .head().getString(0)
      require(probed == probeKey,
        s"DV path-match convention broke: scan spells '$probed', driver '$probeKey'")
      probedSessions.add(spark)
    }
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.scalaLong)
    val dels = spark.createDataset(payloads)(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.BINARY))
      .flatMap { case (p, bytes) => RoaringDv.deserialize(bytes).map(pos => (p, pos)) }(enc)
      .toDF("__del_path", "__del_pos")
    val cols = data.columns.map(col)
    data
      .withColumn("__path", regexp_replace(col("_metadata.file_path"), "^file:/*", "/"))
      .withColumn("__pos", col("_metadata.row_index"))
      .join(broadcast(dels),
        col("__path") === col("__del_path") && col("__pos") === col("__del_pos"),
        "left_anti")
      .select(cols.toIndexedSeq: _*)
  }

  /** Read a SUBSET of a snapshot's files with their deletion vectors
    * applied (partition values recovered via basePath on partitioned
    * tables) — the writer's REORG/purge path reads exactly the
    * DV-carrying files this way. */
  private[sources] def readAddsWithDvs(spark: SparkSession, base: String,
                                       adds: Seq[DeltaAdd],
                                       pcols: Seq[String]): DataFrame = {
    val files = adds.map(a => Paths.get(base).resolve(a.path).toString)
    val data =
      if (pcols.isEmpty) spark.read.parquet(files: _*)
      else spark.read.option("basePath", base).parquet(files: _*)
    applyDvs(spark, base, adds, data)
  }

  /** DV anti-join that KEEPS every column of `stamped` (which must
    * already carry normalized `__path` + `__pos`) — the shared mask for
    * writer paths that need positions or materialized row ids to
    * survive the masking (DML scans, OPTIMIZE's rewrite read,
    * readRowIds). No-op when no add carries a DV. */
  private[sources] def dvMaskKeep(spark: SparkSession, base: String,
                                  adds: Seq[DeltaAdd], stamped: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import org.apache.spark.sql.Encoders
    val withDv = adds.filter(_.dv.isDefined)
    if (withDv.isEmpty) return stamped
    val absBase = Paths.get(base).toAbsolutePath.normalize
    val payloads: Seq[(String, Array[Byte])] = withDv.map { a =>
      val d = a.dv.get
      scanSpelling(absBase.resolve(a.path)) ->
        RoaringDv.loadPayload(base, d.storageType, d.pathOrInlineDv, d.offset, d.sizeInBytes)
    }
    val pairEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    val dels = spark.createDataset(payloads)(Encoders.tuple(
        Encoders.STRING, Encoders.BINARY))
      .flatMap { case (p, b) => RoaringDv.deserialize(b).map(pos => (p, pos)) }(pairEnc)
      .toDF("__del_path", "__del_pos")
    stamped.join(broadcast(dels),
      col("__path") === col("__del_path") && col("__pos") === col("__del_pos"),
      "left_anti")
  }

  /** ROW TRACKING's id high-water mark: the LAST
    * `domainMetadata(domain=delta.rowTracking)` action's
    * `rowIdHighWaterMark` at or before `version` — the highest row id
    * any commit has assigned (fresh ids start above it, and ids are
    * NEVER reused even after the carrying files are removed, which is
    * exactly why the mark lives in its own action rather than being
    * derived from live adds). Seeds from a checkpoint's folded
    * domainMetadata row when the early commits are expired. */
  def rowIdHighWaterMark(spark: Option[SparkSession], base: String,
                         version: Long): Option[Long] = {
    val vs = versions(base).filter(_ <= version)
    val hwmRe = """rowIdHighWaterMark\\?"\s*:\s*(-?\d+)""".r
    var found: Option[Long] =
      if (vs.headOption.contains(0L)) None
      else spark.flatMap { s =>
        checkpointAt(base, version).flatMap { cv =>
          val cdf = s.read.parquet(checkpointFile(base, cv).toString)
          if (!cdf.columns.contains("domainMetadata")) None
          else {
            import org.apache.spark.sql.functions.col
            cdf.filter(col("domainMetadata").isNotNull &&
                col("domainMetadata.domain") === "delta.rowTracking")
              .select(col("domainMetadata.configuration"))
              .collect().headOption
              .flatMap(r => hwmRe.findFirstMatchIn(r.getString(0)).map(_.group(1).toLong))
          }
        }
      }
    vs.foreach { v =>
      val f = logDir(base).resolve(f"$v%020d.json")
      if (Files.exists(f))
        Files.readAllLines(f, StandardCharsets.UTF_8).asScala.foreach { line =>
          if (line.contains("\"domainMetadata\"") && line.contains("delta.rowTracking"))
            found = hwmRe.findFirstMatchIn(line).map(_.group(1).toLong).orElse(found)
        }
    }
    found
  }

  /** LIQUID CLUSTERING columns: the LAST `delta.clustering` domain's
    * `clusteringColumns` at or before `version` (seeded from a
    * checkpoint's folded domain rows when the early commits are
    * expired). Empty when the table declares no clustering. */
  def clusteringColumns(spark: Option[SparkSession], base: String,
                        version: Long): Seq[String] = {
    val colRe = """\[\\?"([^"\\]+)\\?"\]""".r
    def parse(conf: String): Seq[String] =
      colRe.findAllMatchIn(conf).map(_.group(1)).toSeq
    val vs = versions(base).filter(_ <= version)
    var found: Seq[String] =
      if (vs.headOption.contains(0L)) Nil
      else spark.flatMap { s =>
        checkpointAt(base, version).flatMap { cv =>
          val cdf = s.read.parquet(checkpointFile(base, cv).toString)
          if (!cdf.columns.contains("domainMetadata")) None
          else {
            import org.apache.spark.sql.functions.col
            cdf.filter(col("domainMetadata").isNotNull &&
                col("domainMetadata.domain") === "delta.clustering")
              .select(col("domainMetadata.configuration"))
              .collect().headOption.map(r => parse(r.getString(0)))
          }
        }
      }.getOrElse(Nil)
    vs.foreach { v =>
      val f = logDir(base).resolve(f"$v%020d.json")
      if (Files.exists(f))
        Files.readAllLines(f, StandardCharsets.UTF_8).asScala.foreach { line =>
          if (line.contains("\"domainMetadata\"") && line.contains("delta.clustering")) {
            val got = parse(line)
            if (got.nonEmpty) found = got
          }
        }
    }
    found
  }

  /** ROW-TRACKING read: the snapshot's live rows plus `_row_id` and
    * `_row_commit_version` — each file's MATERIALIZED columns when
    * present (what OPTIMIZE writes so rewrites preserve ids), else
    * `baseRowId + position` / `defaultRowCommitVersion` from the add
    * action. Deletion vectors apply FIRST, so surviving rows keep
    * their ids. The per-file (baseRowId, commitVersion) pairs attach
    * via ONE broadcast join over a files-sized frame. */
  def readRowIds(spark: SparkSession, base: String, version: Long): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, regexp_replace}
    import org.apache.spark.sql.Encoders
    val conf = latestMetaConfig(Some(spark), base, version).map(_._2).getOrElse(Map.empty)
    require(conf.get("delta.enableRowTracking").contains("true"),
      s"$base does not enable row tracking")
    val matId = conf.getOrElse("delta.rowTracking.materializedRowIdColumnName",
      "_row_id_mat")
    val matVer = conf.getOrElse("delta.rowTracking.materializedRowCommitVersionColumnName",
      "_row_commit_mat")
    val adds = snapshotFiles(Some(spark), base, version)
    require(adds.nonEmpty, s"empty snapshot $version of $base")
    val absBase = Paths.get(base).toAbsolutePath.normalize
    def absOf(rel: String) = absBase.resolve(rel).normalize.toString
    def keyOf(rel: String) = scanSpelling(absBase.resolve(rel))
    val pcols = partitionColumns(Some(spark), base, version)
    val reader = spark.read.option("mergeSchema", "true")
    val raw =
      (if (pcols.isEmpty) reader else reader.option("basePath", base))
        .parquet(adds.map(a => absOf(a.path)): _*)
    val stamped = raw
      .withColumn("__path", regexp_replace(col("_metadata.file_path"), "^file:/*", "/"))
      .withColumn("__pos", col("_metadata.row_index"))
    // DVs apply with positions KEPT (payloads decode executor-side)
    val masked = dvMaskKeep(spark, base, adds, stamped)
    val meta = adds.map(a => (keyOf(a.path),
      a.baseRowId.map(java.lang.Long.valueOf).orNull,
      a.defaultRowCommitVersion.map(java.lang.Long.valueOf).orNull))
    val metaDf = spark.createDataFrame(meta).toDF("__rt_path", "__rt_base", "__rt_ver")
    def matCol(c: String) = if (raw.columns.contains(c)) col(c) else lit(null)
    // on a column-mapped table the files carry PHYSICAL names — surface
    // the logical spelling like read() does (mat columns stay physical;
    // they are config-named, not schema fields)
    val colMap = columnMappingSchema(Some(spark), base, version).map(_.fields.toSeq
      .map(f => f.metadata.getString("delta.columnMapping.physicalName") -> f.name))
    val userCols = raw.columns.filterNot(c => c == matId || c == matVer).map { c =>
      colMap.flatMap(_.collectFirst { case (p, l) if p == c => l }) match {
        case Some(l) => col(c).as(l)
        case None    => col(c)
      }
    }.toSeq
    masked.join(broadcast(metaDf), col("__path") === col("__rt_path"))
      .select(userCols ++ Seq(
        coalesce(matCol(matId), col("__rt_base") + col("__pos"))
          .cast("long").as("_row_id"),
        coalesce(matCol(matVer), col("__rt_ver"))
          .cast("long").as("_row_commit_version")): _*)
  }

  /** Table CHECK constraints at `version` — the last metaData's
    * `delta.constraints.<name>` configuration entries (the spec's
    * constraint storage; writers MUST validate every append against
    * them, which is why declaring one bumps minWriterVersion to 3). */
  def constraintsOf(base: String, version: Long): Map[String, String] =
    constraintsOf(None, base, version)

  def constraintsOf(spark: Option[SparkSession], base: String,
                    version: Long): Map[String, String] =
    latestMetaConfig(spark, base, version).map(_._2.collect {
      case (k, v) if k.startsWith("delta.constraints.") =>
        k.stripPrefix("delta.constraints.") -> v
    }).getOrElse(Map.empty)

  /** The table's LOGICAL schema at `version` — the last metaData's
    * schemaString (from the JSON tail, else the checkpoint's folded
    * metaData). None when the metaData carries no parseable schema
    * (hand-composed probe fixtures write "{}"). This is what makes the
    * log the source of truth over the parquet footers: files written
    * before an ADD COLUMN lack the column, and reading them under the
    * declared schema surfaces it as NULL — the spec's schema
    * evolution. */
  private[sources] def tableSchema(spark: Option[SparkSession], base: String,
                                   version: Long): Option[org.apache.spark.sql.types.StructType] = {
    var json: Option[String] = None
    val vs = versions(base).filter(_ <= version)
    vs.foreach { v =>
      Files.readAllLines(logDir(base).resolve(f"$v%020d.json"), StandardCharsets.UTF_8)
        .asScala.foreach { line =>
          if (line.contains("\"metaData\"")) json = strField(line, "schemaString")
        }
    }
    if (json.isEmpty && !vs.headOption.contains(0L))
      json = spark.flatMap(s => checkpointAt(base, version)
        .flatMap(cv => checkpointMeta(s, base, cv)).map(_._2))
    json.flatMap(j =>
      scala.util.Try(org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)
  }

  /** Snapshot read at an explicit version (time travel). The live list
    * goes straight to the parquet source: pushdown/pruning intact.
    *
    * Partitioned tables: Delta stores partition values in the log
    * (`add.partitionValues`), NOT in the data files. When every live
    * path is hive-style (`col=value/…` — what delta-spark writes), the
    * scan recovers the partition columns from the paths via `basePath`,
    * and partition pruning keeps working. A partitioned table with
    * non-hive paths would need per-file literal stitching — rejected
    * fast rather than silently dropping columns. */
  def read(spark: SparkSession, base: String, version: Long): DataFrame = {
    val adds = snapshotFiles(Some(spark), base, version)
    require(adds.nonEmpty, s"empty snapshot at version $version of $base")
    val files = adds.map(a => Paths.get(base).resolve(a.path).toString)
    val pcols = partitionColumns(Some(spark), base, version)
    columnMappingSchema(Some(spark), base, version).foreach { logical =>
      // mode=id: columns bind by the PARQUET FIELD ID each file embeds
      // — names are immaterial (the variant that survives engines that
      // rewrite physical names). Spark's own field-id resolution does
      // the matching: the requested schema carries parquet.field.id =
      // delta.columnMapping.id under the LOGICAL name, so no rename
      // pass is needed and a metaData-only RENAME just changes the
      // requested spelling. Files without embedded ids fail loudly
      // (ignoreMissing stays false) rather than mis-bind.
      if (columnMappingMode(Some(spark), base, version).contains("id")) {
        import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
        val readSchema = StructType(logical.fields.map(f =>
          StructField(f.name, f.dataType, f.nullable, new MetadataBuilder()
            .putLong("parquet.field.id", f.metadata.getLong("delta.columnMapping.id"))
            .build())))
        require(pcols.isEmpty,
          "mode=id column mapping on a partitioned table is beyond this minimal reader")
        // this V1 scan consults the SESSION conf at execution time (the
        // clip in ParquetReadSupport reads SQLConf, not the per-read
        // options — verified empirically; the DSv2 front door's scan
        // DOES honor the option form, see LakeBatchSources). The read
        // is lazy, so save/restore is impossible here; the flip is
        // one-way but only affects scans whose REQUESTED schema carries
        // parquet.field.id metadata — which only id-binding readers
        // deliberately attach. ignoreMissing makes post-ADD-COLUMN
        // reads surface the new field as NULL in files that predate it
        // (the spec's schema evolution); the loudness the default
        // provided against id-LESS foreign files moves into a sampled
        // footer check.
        assertEmbeddedIds(spark, files.head)
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        spark.conf.set("spark.sql.parquet.fieldId.read.ignoreMissing", "true")
        return applyDvs(spark, base, adds,
          spark.read.schema(readSchema).parquet(files: _*))
      }
      // column mapping mode=name: the parquet files carry PHYSICAL
      // names; rename to the version's logical schema (a metaData-only
      // rename commit changes what this returns with zero data movement
      // — the whole point of the feature). Pruning/pushdown still run
      // against the physical scan; the projection is a free alias. On a
      // PARTITIONED mapped table the hive dirs carry physical names too
      // (the spec's partitionValues are keyed physical); basePath
      // recovery surfaces them and the same rename applies.
      val physByLogical = logical.fields.map(f =>
        f.name -> f.metadata.getString("delta.columnMapping.physicalName")).toMap
      val physPcols = pcols.map(c => physByLogical.getOrElse(c, c))
      // the scan REQUESTS the physical schema at the LOGICAL types:
      // files that predate an ADD COLUMN surface the new physical
      // column as NULL (instead of footer-sampling roulette), and
      // files narrower than a WIDENED type upcast natively in the
      // parquet reader (int32→int64 etc.) — both halves of schema
      // evolution on a mapped table, with zero data movement
      val physSchema = org.apache.spark.sql.types.StructType(
        logical.fields.map(f => org.apache.spark.sql.types.StructField(
          physByLogical(f.name), f.dataType, nullable = true)))
      val physical =
        if (pcols.isEmpty)
          applyDvs(spark, base, adds, spark.read.schema(physSchema).parquet(files: _*))
        else {
          require(adds.forall(a => physPcols.forall(c => a.path.contains(c + "="))),
            s"partitioned column-mapped Delta table with non-hive data paths " +
              s"(need ${physPcols.mkString(",")} dirs)")
          applyDvs(spark, base, adds,
            spark.read.schema(physSchema)
              .option("basePath", base).parquet(files: _*))
        }
      val renames = logical.fields.map { f =>
        org.apache.spark.sql.functions.col(physByLogical(f.name)).as(f.name)
      }
      return physical.select(renames.toIndexedSeq: _*)
    }
    val data = if (pcols.isEmpty) {
      // enforce the LOG's schema over the footers (non-partitioned,
      // non-mapped tables): pre-ADD-COLUMN files surface the new
      // column as NULL instead of the scan schema depending on which
      // footer Spark sampled — the spec's schema evolution
      tableSchema(Some(spark), base, version) match {
        case Some(logical) => spark.read.schema(logical).parquet(files: _*)
        case None          => spark.read.parquet(files: _*)
      }
    } else {
      val hive = adds.forall(a => pcols.forall(c => a.path.contains(c + "=")))
      require(hive,
        s"partitioned Delta table (${pcols.mkString(",")}) with non-hive " +
          "data paths — partition values live only in the log; this " +
          "minimal reader supports hive-style layouts only")
      // enforce the LOG's schema here too: partition columns keep their
      // DECLARED types (no dir-name inference drift) and pre-ADD-COLUMN
      // files surface evolved columns as NULL
      val reader = spark.read.option("basePath", base)
      tableSchema(Some(spark), base, version) match {
        case Some(logical) => reader.schema(logical).parquet(files: _*)
        case None          => reader.parquet(files: _*)
      }
    }
    applyDvs(spark, base, adds, data)
  }

  /** Latest-snapshot read. */
  def read(spark: SparkSession, base: String): DataFrame =
    read(spark, base, latestVersion(base))

  /** The live files a `[lo, hi]` range read on `column` must open —
    * Delta data skipping: files whose `minValues`/`maxValues` for the
    * column miss the range never reach the parquet source. Files
    * without bounds for the column are KEPT (can't prune what isn't
    * tracked — also what makes checkpoint-seeded adds, which carry no
    * stats, safe). */
  def filesWhere(spark: SparkSession, base: String, version: Long,
                 column: String, lo: Long, hi: Long): Seq[DeltaAdd] = {
    require(lo <= hi, s"empty range [$lo, $hi]")
    // stats keys are PHYSICAL column names on a mapped table — accept
    // the logical spelling and translate
    val key = columnMappingSchema(Some(spark), base, version)
      .flatMap(_.fields.collectFirst { case f if f.name == column =>
        f.metadata.getString("delta.columnMapping.physicalName") })
      .getOrElse(column)
    snapshotFiles(Some(spark), base, version).filter { a =>
      (a.minValues.get(key), a.maxValues.get(key)) match {
        case (Some(mn), Some(mx)) => mn <= hi && mx >= lo
        case _                    => true
      }
    }
  }

  /** Stats-pruned range read ([[filesWhere]] + plain parquet scan);
    * the caller still applies its row predicate — the residual that
    * keeps the engine honest inside partially-overlapping files. */
  def readWhere(spark: SparkSession, base: String, version: Long,
                column: String, lo: Long, hi: Long): DataFrame = {
    val files = filesWhere(spark, base, version, column, lo, hi)
    require(files.nonEmpty, s"no file of $base@$version overlaps $column in [$lo, $hi]")
    val paths = files.map(a => Paths.get(base).resolve(a.path).toString)
    // enforce the LOG's schema like read() does: without it, a
    // row-tracked table's materialized physical columns
    // (_row_id_mat/_row_commit_mat) leak into results after OPTIMIZE
    // and mixed-schema file sets read inconsistently
    val pcols = partitionColumns(Some(spark), base, version)
    val reader = if (pcols.isEmpty) spark.read else spark.read.option("basePath", base)
    columnMappingSchema(Some(spark), base, version) match {
      case Some(logical) =>
        // mapped table: files carry PHYSICAL names — enforce the schema
        // under its physical spelling, then alias back to logical
        import org.apache.spark.sql.types.{StructField, StructType}
        val phys = StructType(logical.fields.map(f => StructField(
          f.metadata.getString("delta.columnMapping.physicalName"),
          f.dataType, f.nullable)))
        val data = applyDvs(spark, base, files, reader.schema(phys).parquet(paths: _*))
        data.select(logical.fields.map(f => org.apache.spark.sql.functions
          .col(f.metadata.getString("delta.columnMapping.physicalName"))
          .as(f.name)).toIndexedSeq: _*)
      case None =>
        val data = tableSchema(Some(spark), base, version) match {
          case Some(logical) => reader.schema(logical).parquet(paths: _*)
          case None          => reader.parquet(paths: _*)
        }
        applyDvs(spark, base, files, data)
    }
  }

  /** Highest `txn` (SetTransaction) version recorded for `appId` — the
    * spec's idempotent-writer watermark. A streaming sink consults it
    * to skip redelivered micro-batches ([[DeltaLogWriter.appendIfAbsent]]).
    * Scans the KB-scale commit JSON; on a vacuumed table the
    * checkpoint's folded txn rows supply the watermark the expired
    * commits carried (pass a SparkSession to read them), so an
    * expireLog never re-opens the exactly-once window. */
  def lastTxnVersion(base: String, appId: String): Option[Long] =
    lastTxnVersion(None, base, appId)

  def lastTxnVersion(spark: Option[SparkSession], base: String, appId: String): Option[Long] = {
    val quoted = "\"appId\":\"" + appId + "\""
    val fromCkpt = spark.flatMap { s =>
      checkpointAt(base, Long.MaxValue).flatMap(cv => checkpointTxn(s, base, cv, appId))
    }
    val fromJson = versions(base).flatMap { v =>
      Files.readAllLines(logDir(base).resolve(f"$v%020d.json"), StandardCharsets.UTF_8)
        .asScala.collect {
          case line if line.contains("\"txn\"") && line.contains(quoted) =>
            longField(line, "version").getOrElse(
              throw new IllegalStateException(s"txn action without version: $line"))
        }
    }.maxOption
    (fromCkpt.toSeq ++ fromJson.toSeq).maxOption
  }

  /** The checkpoint's folded txn watermark for `appId`, if present. */
  private def checkpointTxn(spark: SparkSession, base: String,
                            cv: Long, appId: String): Option[Long] = {
    import org.apache.spark.sql.functions.col
    val cp = checkpointFileOpt(base, cv).getOrElse(return None)
    val cdf = spark.read.parquet(cp.toString)
    if (!cdf.columns.contains("txn")) return None
    cdf.filter(col("txn").isNotNull && col("txn.appId") === appId)
      .select(col("txn.version")).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
  }

  /** Every folded (appId, version) txn watermark in the checkpoint —
    * the writer re-folds them when it takes the NEXT checkpoint. */
  private[sources] def checkpointTxns(spark: SparkSession, base: String,
                                      cv: Long): Map[String, Long] = {
    import org.apache.spark.sql.functions.col
    val cp = checkpointFileOpt(base, cv).getOrElse(return Map.empty)
    val cdf = spark.read.parquet(cp.toString)
    if (!cdf.columns.contains("txn")) return Map.empty
    cdf.filter(col("txn").isNotNull)
      .select(col("txn.appId"), col("txn.version")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Change Data Feed over versions [fromVersion, toVersion] — the
    * spec's batch CDF contract:
    *
    *   - a commit carrying `cdc` actions is represented by THOSE files
    *     alone (they live under `_change_data/` and carry the
    *     `_change_type` column — update_preimage/update_postimage/...);
    *     its add/remove actions exist for snapshot readers and must NOT
    *     double-count here;
    *   - otherwise `add` actions with `dataChange=true` surface their
    *     rows as inserts, and `remove` actions with `dataChange=true`
    *     surface the removed file's rows as deletes (the pre-image is
    *     the file itself — still on disk until VACUUM);
    *   - `dataChange=false` commits (OPTIMIZE) change nothing and emit
    *     nothing — the property that makes CDF cheaper than diffing
    *     snapshots.
    *
    * Every result row is stamped with `_change_type` and
    * `_commit_version`; the data path is ordinary parquet scans of just
    * the referenced files, so pushdown and pruning stay intact. */
  def readChanges(spark: SparkSession, base: String,
                  fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(fromVersion <= toVersion, s"empty CDF range [$fromVersion, $toVersion]")
    val parts = (fromVersion to toVersion).flatMap { v =>
      val f = logDir(base).resolve(f"$v%020d.json")
      require(Files.exists(f), s"missing Delta commit $v under $base")
      val lines = Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
      lines.filter(_.contains("\"protocol\"")).foreach(assertReadable)
      // cdc actions are declared with dataChange=false by the spec (the
      // data change is what they DESCRIBE) — the no-change exclusion
      // applies only to add/remove
      def paths(kind: String, skipNoChange: Boolean): Seq[String] = lines.collect {
        case l if l.contains("\"" + kind + "\"") &&
          !(skipNoChange && l.contains("\"dataChange\":false")) =>
          strField(l, "path").getOrElse(
            throw new IllegalStateException(s"$kind action without path: $l"))
      }
      val cdc = paths("cdc", skipNoChange = false)
      val reads: Seq[(Seq[String], Option[String])] =
        if (cdc.nonEmpty) Seq((cdc, None)) // cdc files carry _change_type themselves
        else Seq((paths("add", skipNoChange = true), Some("insert")),
          (paths("remove", skipNoChange = true), Some("delete")))
      // mapped tables: data and _change_data files carry PHYSICAL
      // names — surface each commit's rows under ITS version's logical
      // schema (a rename commit changes the spelling going forward)
      val colMap = columnMappingSchema(Some(spark), base, v).map(_.fields.toSeq
        .map(f => f.metadata.getString("delta.columnMapping.physicalName") -> f.name))
      reads.collect { case (files, tag) if files.nonEmpty =>
        val abs = files.map(p => Paths.get(base).resolve(p).toString)
        // derived DELETE pre-images from removed files must be read
        // UNDER their deletion-vector masks as of the PRIOR version —
        // an unmasked read would over-report already-soft-deleted rows
        // as this commit's deletes (the overwrite × CDF × DV corner)
        val df0 =
          if (tag.contains("delete")) {
            val fileSet = files.toSet
            val removedAdds = snapshotFiles(Some(spark), base, v - 1)
              .filter(a => fileSet.contains(a.path))
            if (removedAdds.exists(_.dv.nonEmpty)) {
              import org.apache.spark.sql.functions.regexp_replace
              val stamped = spark.read.parquet(abs: _*)
                .withColumn("__path",
                  regexp_replace(col("_metadata.file_path"), "^file:/*", "/"))
                .withColumn("__pos", col("_metadata.row_index"))
              dvMaskKeep(spark, base, removedAdds, stamped).drop("__path", "__pos")
            } else spark.read.parquet(abs: _*)
          } else spark.read.parquet(abs: _*)
        val df = colMap.fold(df0)(_.foldLeft(df0) { case (d, (p, l)) =>
          if (p != l && d.columns.contains(p)) d.withColumnRenamed(p, l) else d })
        tag.fold(df)(t => df.withColumn("_change_type", lit(t)))
          .withColumn("_commit_version", lit(v))
      }
    }
    require(parts.nonEmpty, s"no data-changing commits in [$fromVersion, $toVersion] of $base")
    val cols = parts.head.columns.filterNot(
      c => c == "_change_type" || c == "_commit_version").toSeq :+ "_change_type" :+ "_commit_version"
    parts.map(_.select(cols.map(col): _*)).reduce(_ unionAll _)
  }
}
