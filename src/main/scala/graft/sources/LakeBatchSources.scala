package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.{DataSourceRegister, InsertableRelation}
import org.apache.spark.sql.connector.catalog.TableProvider
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** BATCH DSv2 front doors for the three lakehouse formats — the
  * `spark.read.format(...)` / `CREATE [TEMPORARY] VIEW ... USING`
  * surface catalogs and BI tools need (the Scala readers and the SQL
  * TVFs exist, but a config-less tool can only speak `format(...)`):
  *
  * {{{
  *   spark.read.format("graft-delta").option("path", base).load()
  *   spark.read.format("graft-iceberg").option("path", base).load()
  *   spark.read.format("graft-hudi").option("path", base).load()
  * }}}
  *
  * Each provider runs the format's KB-scale metadata planning ONCE at
  * table resolution and hands the LIVE FILE LIST to Spark's own
  * [[ParquetTable]] — so the scan is the ordinary DSv2 parquet scan:
  * vectorized reading, predicate pushdown, column pruning, and
  * whole-stage codegen all intact (a custom row-by-row
  * PartitionReader here would silently lose all four). Time travel
  * rides an option (`versionAsOf` / `snapshotAsOf` / `asOfInstant`).
  *
  * Row-level masks CANNOT ride a raw file scan, so tables whose
  * current snapshot carries deletion vectors / delete files are
  * REFUSED with a pointer at the full readers
  * ([[DeltaLogReader.read]], [[IcebergReader.read]]) — never silently
  * mis-read. COLUMN-MAPPED Delta tables (either mode) DO ride the
  * front door: the requested schema carries `parquet.field.id` =
  * `delta.columnMapping.id` under the LOGICAL names and Spark's own
  * field-id resolution binds the physical columns (this engine's
  * mapped files always embed ids, the spec's writer requirement);
  * files without ids fail loudly rather than mis-bind. Short names
  * resolve through the standard `DataSourceRegister` service file.
  *
  * WRITES ride the V1-fallback DSv2 write surface
  * (`TableCapability.V1_BATCH_WRITE` + [[InsertableRelation]]):
  * `df.write.format("graft-delta").mode("append"/"overwrite").save()`
  * and pure-SQL `INSERT INTO <view created with USING>` route into
  * [[DeltaLogWriter.append]]/[[DeltaLogWriter.overwrite]] — the full
  * writer, so CHECK constraints, generated columns, column mapping,
  * and row tracking all hold on this path too. `graft-iceberg`
  * supports append ([[IcebergWriter.append]]); `graft-hudi` stays
  * read-only (an upsert needs the record-key/bucket spec — use
  * [[HudiWriter]]).
  */
private[sources] object LakeBatchSources {

  def pathOf(options: CaseInsensitiveStringMap, who: String): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      s"$who needs .option(\"path\", <table base>) / OPTIONS (path '<table base>')"))

  def parquetTable(name: String, paths: Seq[String],
                   schema: Option[StructType],
                   extraOpts: Map[String, String]): ParquetTable = {
    val spark = SparkSession.active
    ParquetTable(name, spark,
      new CaseInsensitiveStringMap(extraOpts.asJava),
      paths, schema, classOf[ParquetFileFormat])
  }

  /** A DSv2 table that SCANS through the delegate's ordinary parquet
    * scan (pushdown/pruning/codegen intact) and WRITES through the
    * format's full log writer via the V1-fallback write surface. */
  private final class GraftLakeTable(delegate: ParquetTable, tname: String,
                                     doInsert: Option[(DataFrame, Boolean) => Unit])
    extends Table with SupportsRead with SupportsWrite {
    override def name(): String = tname
    override def schema(): StructType = delegate.schema
    override def capabilities(): util.Set[TableCapability] =
      (Set(TableCapability.BATCH_READ) ++
        // BATCH_WRITE is what DataFrameWriter.save gates its v2 path on;
        // the planner then dispatches our V1Write to AppendDataExecV1 /
        // OverwriteByExpressionExecV1 (the sanctioned V1-fallback write)
        doInsert.map(_ => Set(TableCapability.BATCH_WRITE,
          TableCapability.V1_BATCH_WRITE,
          TableCapability.TRUNCATE)).getOrElse(Set.empty)).asJava
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      delegate.newScanBuilder(options)
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
      val fn = doInsert.getOrElse(throw new UnsupportedOperationException(
        s"$tname is read-only through the front door"))
      // SupportsTruncate on the BUILDER is what V2Writes demands of
      // mode("overwrite") — and the V1 fallback exec ALWAYS calls
      // insert(_, overwrite=false), so the truncate intent must be
      // captured here, not read from the insert flag
      new WriteBuilder with SupportsTruncate {
        private var truncated = false
        override def truncate(): WriteBuilder = { truncated = true; this }
        override def build(): Write = {
          val ow = truncated
          new V1Write {
            override def toInsertableRelation: InsertableRelation =
              new InsertableRelation {
                override def insert(data: DataFrame, overwrite: Boolean): Unit =
                  fn(data, ow || overwrite)
              }
          }
        }
      }
    }
  }

  def deltaTable(options: CaseInsensitiveStringMap): Table = {
    val spark = SparkSession.active
    val base = pathOf(options, "graft-delta")
    val version = Option(options.get("versionAsOf")).map(_.toLong)
      .getOrElse(DeltaLogReader.latestVersion(base))
    val adds = DeltaLogReader.snapshotFiles(Some(spark), base, version)
    // an EMPTY snapshot is legal when the log declares a schema — the
    // catalog's freshly-created table before its first append (CTAS
    // loads the empty table to write into it)
    require(adds.nonEmpty ||
      DeltaLogReader.tableSchema(Some(spark), base, version).isDefined,
      s"empty snapshot $version of $base with no declared schema")
    require(adds.forall(_.dv.isEmpty),
      "graft-delta front door over deletion vectors would resurrect masked " +
        "rows — use DeltaLogReader.read or the delta_scan TVF")
    val pcols = DeltaLogReader.partitionColumns(Some(spark), base, version)
    val paths = adds.map(a =>
      java.nio.file.Paths.get(base).resolve(a.path).toString)
    // column-mapped tables (either mode) bind by PARQUET FIELD ID: the
    // requested schema carries parquet.field.id = delta.columnMapping.id
    // under the LOGICAL names, so the delegate's scan surfaces logical
    // names with zero rename pass — and a foreign file without embedded
    // ids fails loudly (ignoreMissing stays false), never mis-binds
    val schema = DeltaLogReader.columnMappingSchema(Some(spark), base, version) match {
      case Some(logical) =>
        require(pcols.isEmpty,
          "graft-delta front door over a column-mapped PARTITIONED table — " +
            "hive dirs carry physical names; use DeltaLogReader.read")
        import org.apache.spark.sql.types.{MetadataBuilder, StructField}
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        Some(StructType(logical.fields.map(f =>
          StructField(f.name, f.dataType, f.nullable, new MetadataBuilder()
            .putLong("parquet.field.id", f.metadata.getLong("delta.columnMapping.id"))
            .build()))))
      case None => DeltaLogReader.tableSchema(Some(spark), base, version)
    }
    val delegate = parquetTable(s"graft_delta($base@$version)", paths, schema,
      if (pcols.isEmpty) Map.empty else Map("basePath" -> base))
    // writes always land on the LATEST version — a time-travel write
    // would fork history, which the log cannot represent (the callback
    // refuses rather than dropping the capability: a capability-less
    // table would detour into Spark's V1 CTAS fallback and die with an
    // unrelated message)
    val writable = !options.containsKey("versionAsOf")
    new GraftLakeTable(delegate, delegate.name,
      Some((data, ow) => {
        require(writable,
          s"graft-delta at versionAsOf is read-only — a write would fork $base's history")
        if (ow) DeltaLogWriter.overwrite(SparkSession.active, data, base)
        else DeltaLogWriter.append(SparkSession.active, data, base)
      }))
  }

  def icebergTable(options: CaseInsensitiveStringMap): Table = {
    val spark = SparkSession.active
    val base = pathOf(options, "graft-iceberg")
    val snap = Option(options.get("snapshotAsOf")).map(_.toLong)
      .getOrElse(IcebergReader.currentSnapshotId(base,
        IcebergReader.currentMetadataVersion(base)))
    val scan = IcebergReader.planSnapshot(spark, base, snap)
    require(scan.dataFiles.nonEmpty, s"empty snapshot $snap of $base")
    require(scan.posDeleteFiles.isEmpty && scan.eqDeleteFiles.isEmpty && scan.dvs.isEmpty,
      "graft-iceberg front door over live delete files would resurrect " +
        "deleted rows — use IcebergReader.read or the iceberg_scan TVF")
    // identity/transform-partitioned tables keep the source column IN
    // the data files (this writer's layout), so no dir recovery needed
    val delegate = parquetTable(
      s"graft_iceberg($base@$snap)", scan.dataFiles.map(_._1), None, Map.empty)
    val writable = !options.containsKey("snapshotAsOf")
    new GraftLakeTable(delegate, delegate.name,
      Some((data, ow) => {
        require(writable,
          s"graft-iceberg at snapshotAsOf is read-only — a write would fork $base's history")
        require(!ow, "graft-iceberg front door supports append only — " +
          "mode(\"overwrite\") would need a delete-all snapshot; use IcebergWriter")
        IcebergWriter.append(SparkSession.active, data, base)
      }))
  }

  def hudiTable(options: CaseInsensitiveStringMap): Table = {
    val base = pathOf(options, "graft-hudi")
    HudiReader.assertReadable(base)
    require(HudiReader.tableType(base) != "MERGE_ON_READ",
      "graft-hudi front door over a MOR table would skip its log files — " +
        "use HudiReader.readMor or the hudi_scan TVF")
    val asOf = Option(options.get("asOfInstant"))
      .getOrElse(HudiReader.completedCommits(base).last)
    val paths = HudiReader.liveSlices(base, asOf).map(_.path)
    require(paths.nonEmpty, s"no live slices at instant $asOf of $base")
    parquetTable(s"graft_hudi($base@$asOf)", paths, None, Map.empty)
  }
}

class GraftDeltaSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-delta"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LakeBatchSources.deltaTable(options).columns
      .foldLeft(new StructType())((s, c) => s.add(c.name, c.dataType, c.nullable))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    LakeBatchSources.deltaTable(new CaseInsensitiveStringMap(properties))
}

class GraftIcebergSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-iceberg"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LakeBatchSources.icebergTable(options).columns
      .foldLeft(new StructType())((s, c) => s.add(c.name, c.dataType, c.nullable))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    LakeBatchSources.icebergTable(new CaseInsensitiveStringMap(properties))
}

class GraftHudiSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-hudi"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LakeBatchSources.hudiTable(options).columns
      .foldLeft(new StructType())((s, c) => s.add(c.name, c.dataType, c.nullable))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    LakeBatchSources.hudiTable(new CaseInsensitiveStringMap(properties))
}
