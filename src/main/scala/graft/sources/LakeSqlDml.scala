package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsDelete, SupportsMetadataColumns, SupportsRowLevelOperations}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{BaseRelation, Filter, TableScan}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Pure-SQL row-level DML for the catalog's Delta tables — the DSv2
  * `SupportsRowLevelOperations` surface, DELTA-based (`SupportsDelta`):
  *
  * {{{
  *   DELETE FROM lakecat.ns.t WHERE pred        -- metadata-only DVs
  *   UPDATE lakecat.ns.t SET x = e WHERE pred   -- DVs + changed rows
  *   MERGE INTO lakecat.ns.t USING src ON ...   -- all clause kinds
  * }}}
  *
  * The 100 TB shape is the point of choosing DELTA mode over
  * group-based: Spark's rewrite hands this connector only the CHANGED
  * rows (per-row delete/update/insert callbacks with a row identity),
  * so executors write new-row files sized to the DML, deleted
  * positions become per-file deletion-vector bitmaps, and NOT ONE
  * untouched row is rewritten — the same economics as
  * [[DeltaLogWriter.deleteWhereDv]]. Group-based ReplaceData would
  * rewrite every candidate file wholesale.
  *
  * Moving parts:
  *   - row identity = (`__path`, `__pos`) metadata columns (Spark's
  *     `rowId()` contract, the Iceberg `_file`/`_pos` pattern) served
  *     by [[DeltaLogWriter.sqlDmlScan]] — the DV-masked live scan, so
  *     a row deleted by a previous DV can never match again;
  *   - `__pre` metadata struct carries the OLD row into the writer
  *     callbacks — CDF pre-images and delete change rows come from it
  *     (preserved-on-update per MetadataColumn defaults);
  *   - executors persist inserted/updated rows + CDF rows through
  *     Spark's own parquet OutputWriterFactory
  *     ([[org.apache.spark.sql.GraftWriteBridge.parquetSink]]) — the
  *     staged files are byte-identical to DataFrame writes;
  *   - [[DeltaLogWriter.commitRowDelta]] assembles ONE commit: merged
  *     DVs per touched file, adds for staged files, cdc actions.
  *
  * Simple `DELETE FROM ... WHERE <translatable>` never reaches this
  * machinery: [[DeltaSqlDml.deleteWhere]] (SupportsDelete) lets
  * Spark's OptimizeMetadataOnlyDeleteFromTable route it straight into
  * [[DeltaLogWriter.deleteWhereDv]] with zero scan-rewrite.
  *
  * Feature-composed tables (hive partitioning, column mapping, row
  * tracking, identity) refuse loudly with a pointer at the Scala DML
  * entry points ([[DeltaLogWriter.sqlDmlGuards]]) — their staging
  * conventions are not wired through the executor writers yet.
  */
private[sources] object LakeSqlDml {

  /** Metadata columns every DML-capable Delta table exposes. */
  def metadataColumnsFor(dataSchema: StructType): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name: String = "__path"
      override def dataType: DataType = StringType
      override def isNullable: Boolean = false
      override def comment: String = "data file holding the row (row identity)"
    },
    new MetadataColumn {
      override def name: String = "__pos"
      override def dataType: DataType = LongType
      override def isNullable: Boolean = false
      override def comment: String = "row position within its file (row identity)"
    },
    new MetadataColumn {
      override def name: String = "__pre"
      override def dataType: DataType = dataSchema
      override def isNullable: Boolean = false
      override def comment: String = "the full old row (CDF pre-images)"
    })

  /** The delta-based row-level operation over one Delta table, pinned
    * to the version observed at rewrite time. */
  final class DeltaRowLevelOperation(base: String, cmd: Command)
    extends RowLevelOperation with org.apache.spark.sql.connector.write.SupportsDelta {

    // guards run LAZILY (first scan/write build), not at construction:
    // RewriteDeleteFromTable builds the operation table eagerly even
    // for simple DELETEs that OptimizeMetadataOnlyDeleteFromTable will
    // replace with the filter-based path — a constructor-time refusal
    // would block exactly the deletes deleteWhereDv CAN serve on
    // composed tables
    private lazy val guarded: Unit =
      DeltaLogWriter.sqlDmlGuards(SparkSession.active, base)
    private val expectVersion = DeltaLogReader.latestVersion(base)

    override def command: Command = cmd
    override def description: String = s"graft-delta row-level $cmd on $base"

    override def rowId(): Array[NamedReference] =
      Array(Expressions.column("__path"), Expressions.column("__pos"))

    override def requiredMetadataAttributes(): Array[NamedReference] =
      Array(Expressions.column("__pre"))

    // the scan: V1-read fallback over the DV-masked live scan with the
    // row-identity and pre-image columns attached; pushed filters are
    // re-stated on the inner plan (parquet pushdown through the mask
    // anti-joins) and ALL stay residual upstream, so a translation gap
    // can never change which rows the DML matches
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
        guarded
        private val fullSchema =
          DeltaLogWriter.sqlDmlScan(SparkSession.active, base).schema
        private var pushed: Array[Filter] = Array.empty
        private var required: StructType = fullSchema
        override def pushFilters(filters: Array[Filter]): Array[Filter] = {
          pushed = filters.filter(LakeBatchSources.translateFilter(_).isDefined)
          filters
        }
        override def pushedFilters(): Array[Filter] = pushed
        override def pruneColumns(requiredSchema: StructType): Unit =
          required = requiredSchema
        override def build(): Scan = new V1Scan {
          private val (pf, req) = (pushed, required)
          override def readSchema(): StructType = req
          override def toV1TableScan[T <: BaseRelation with TableScan](
              ctx: SQLContext): T =
            (new BaseRelation with TableScan {
              override def sqlContext: SQLContext = ctx
              override def schema: StructType = req
              override def needConversion: Boolean = false
              override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
                val s = SparkSession.active
                require(DeltaLogReader.latestVersion(base) == expectVersion,
                  s"$base changed under the DML — re-run the statement")
                var df = DeltaLogWriter.sqlDmlScan(s, base)
                pf.flatMap(LakeBatchSources.translateFilter).foreach(c => df = df.filter(c))
                df = df.select(req.fieldNames.toIndexedSeq.map(col): _*)
                org.apache.spark.sql.GraftPlanBridge.internalRdd(df)
                  .asInstanceOf[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
              }
            }).asInstanceOf[T]
        }
      }

    override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
      new DeltaWriteBuilder {
        override def build(): DeltaWrite = {
          guarded
          new GraftDeltaWrite(base, expectVersion, cmd.toString, info)
        }
      }
  }

  /** One WriteDelta batch: builds the executor sinks driver-side, then
    * commits DVs + staged adds + CDF in one Delta commit. */
  private final class GraftDeltaWrite(base: String, expectVersion: Long,
                                      opName: String, info: LogicalWriteInfo)
    extends DeltaWrite {
    override def description: String = s"graft-delta $opName -> $base"
    override def toBatch: DeltaBatchWrite = {
      val spark = SparkSession.active
      val dataSchema = info.schema
      val cdfOn = DeltaLogWriter.cdfEnabled(spark, base)
      val cdcSchema = StructType(dataSchema.fields :+
        StructField("_change_type", StringType, nullable = false))
      if (cdfOn)
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(base, "_change_data"))
      val writeId = java.util.UUID.randomUUID.toString.take(8)
      val factory = new GraftDmlWriterFactory(base, writeId,
        org.apache.spark.sql.GraftWriteBridge.parquetSink(spark, dataSchema),
        if (cdfOn) Some(org.apache.spark.sql.GraftWriteBridge.parquetSink(spark, cdcSchema))
        else None,
        dataSchema.fields.map(_.dataType))

      new DeltaBatchWrite {
        override def createBatchWriterFactory(i: PhysicalWriteInfo): DeltaWriterFactory =
          factory
        override def commit(messages: Array[WriterCommitMessage]): Unit = {
          val ms = messages.toSeq.collect { case m: SqlDmlMessage => m }
          val delPos: Map[String, Seq[Long]] = ms.flatMap(_.delPos)
            .groupBy(_._1).view.mapValues(_.flatMap(_._2).toSeq).toMap
          DeltaLogWriter.commitRowDelta(SparkSession.active, base, expectVersion,
            delPos, ms.flatMap(_.dataRel), ms.flatMap(_.cdcRel), opName)
        }
        override def abort(messages: Array[WriterCommitMessage]): Unit =
          messages.toSeq.collect { case m: SqlDmlMessage => m }.foreach { m =>
            (m.dataRel ++ m.cdcRel).foreach(rel =>
              java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(base, rel)))
          }
      }
    }
  }

  /** What one task hands back: its staged file(s) + per-file deleted
    * positions. Rel paths are table-relative (Delta add convention). */
  private final case class SqlDmlMessage(dataRel: Option[String], cdcRel: Option[String],
                                         delPos: Seq[(String, Seq[Long])])
    extends WriterCommitMessage

  private final class GraftDmlWriterFactory(
      base: String, writeId: String,
      dataSink: org.apache.spark.sql.GraftParquetSink,
      cdcSink: Option[org.apache.spark.sql.GraftParquetSink],
      dataTypes: Array[DataType]) extends DeltaWriterFactory {

    override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
      new DeltaWriter[InternalRow] {
        private val n = dataTypes.length
        private val dataRel = s"dml-$writeId-p$partitionId-t$taskId.parquet"
        private val cdcRel = s"_change_data/cdc-$writeId-p$partitionId-t$taskId.parquet"
        private var dataOut: org.apache.spark.sql.GraftParquetSink.Opened = _
        private var cdcOut: org.apache.spark.sql.GraftParquetSink.Opened = _
        private val delPos = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Long]]

        private def dataWriter(): org.apache.spark.sql.GraftParquetSink.Opened = {
          if (dataOut == null)
            dataOut = dataSink.open(s"$base/$dataRel", partitionId, taskId)
          dataOut
        }
        private def cdc(src: InternalRow, change: String): Unit =
          cdcSink.foreach { sink =>
            if (cdcOut == null)
              cdcOut = sink.open(s"$base/$cdcRel", partitionId, taskId)
            val vals = new Array[Any](n + 1)
            var i = 0
            while (i < n) { vals(i) = src.get(i, dataTypes(i)); i += 1 }
            vals(n) = UTF8String.fromString(change)
            cdcOut.write(new GenericInternalRow(vals))
          }
        private def recordDelete(id: InternalRow): Unit = {
          val path = id.getUTF8String(0).toString
          delPos.getOrElseUpdate(path, mutable.ArrayBuffer.empty) += id.getLong(1)
        }

        // meta = (__pre struct); id = (__path, __pos); row = new values
        override def delete(meta: InternalRow, id: InternalRow): Unit = {
          recordDelete(id)
          cdc(meta.getStruct(0, n), "delete")
        }
        override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
          recordDelete(id)
          cdc(meta.getStruct(0, n), "update_preimage")
          dataWriter().write(row)
          cdc(row, "update_postimage")
        }
        override def insert(row: InternalRow): Unit = {
          dataWriter().write(row)
          cdc(row, "insert")
        }

        override def commit(): WriterCommitMessage = {
          if (dataOut != null) dataOut.close()
          if (cdcOut != null) cdcOut.close()
          SqlDmlMessage(
            Option(dataOut).map(_ => dataRel),
            Option(cdcOut).map(_ => cdcRel),
            delPos.toSeq.map { case (p, b) => (p, b.toSeq) })
        }
        override def abort(): Unit = {
          if (dataOut != null) { dataOut.close()
            java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(base, dataRel)) }
          if (cdcOut != null) { cdcOut.close()
            java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(base, cdcRel)) }
        }
        override def close(): Unit = ()
      }
  }
}

/** Mixed into the front-door Delta tables: pure-SQL DML capability.
  * Simple DELETEs go metadata-only through [[SupportsDelete]]; UPDATE,
  * MERGE, and non-translatable DELETEs go through the delta-based
  * row-level operation ([[LakeSqlDml.DeltaRowLevelOperation]]). */
private[sources] trait DeltaSqlDml extends SupportsRowLevelOperations
  with SupportsDelete with SupportsMetadataColumns {

  /** The Delta table base path. */
  def dmlBase: String

  override def metadataColumns(): Array[MetadataColumn] =
    LakeSqlDml.metadataColumnsFor(
      DeltaLogWriter.sqlDmlSchema(SparkSession.active, dmlBase))

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(LakeBatchSources.translateFilter(_).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val spark = SparkSession.active
    val cond = filters.toSeq.flatMap(LakeBatchSources.translateFilter)
      .reduceOption(_ && _).getOrElse(lit(true))
    if (DeltaLogReader.snapshotFiles(Some(spark), dmlBase,
        DeltaLogReader.latestVersion(dmlBase)).nonEmpty)
      DeltaLogWriter.deleteWhereDv(spark, dmlBase, cond)
  }

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        new LakeSqlDml.DeltaRowLevelOperation(dmlBase, info.command)
    }
}
