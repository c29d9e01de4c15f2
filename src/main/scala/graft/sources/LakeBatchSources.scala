package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
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
  * current snapshot carries deletion vectors / delete files, and
  * column-mapped Delta tables, are REFUSED with a pointer at the full
  * readers ([[DeltaLogReader.read]], [[IcebergReader.read]]) — never
  * silently mis-read. Short names resolve through the standard
  * `DataSourceRegister` service file.
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

  def deltaTable(options: CaseInsensitiveStringMap): Table = {
    val spark = SparkSession.active
    val base = pathOf(options, "graft-delta")
    val version = Option(options.get("versionAsOf")).map(_.toLong)
      .getOrElse(DeltaLogReader.latestVersion(base))
    val adds = DeltaLogReader.snapshotFiles(Some(spark), base, version)
    require(adds.nonEmpty, s"empty snapshot $version of $base")
    require(adds.forall(_.dv.isEmpty),
      "graft-delta front door over deletion vectors would resurrect masked " +
        "rows — use DeltaLogReader.read or the delta_scan TVF")
    require(DeltaLogReader.columnMappingSchema(Some(spark), base, version).isEmpty,
      "graft-delta front door over a column-mapped table would surface " +
        "physical names — use DeltaLogReader.read or the delta_scan TVF")
    val pcols = DeltaLogReader.partitionColumns(Some(spark), base, version)
    val paths = adds.map(a =>
      java.nio.file.Paths.get(base).resolve(a.path).toString)
    val schema = DeltaLogReader.tableSchema(Some(spark), base, version)
    parquetTable(s"graft_delta($base@$version)", paths, schema,
      if (pcols.isEmpty) Map.empty else Map("basePath" -> base))
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
    parquetTable(s"graft_iceberg($base@$snap)", scan.dataFiles.map(_._1), None, Map.empty)
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
