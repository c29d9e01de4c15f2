package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Streaming change source over a PUBLIC-spec Apache Iceberg table —
  * the third leg of the lakehouse streaming triad next to the native
  * TxnLog stream and the Delta-log stream:
  *
  * {{{
  *   spark.readStream.format("graft.sources.IcebergStreamProvider")
  *     .option("path", base).load()
  * }}}
  *
  * Offsets ARE snapshot ids (totally ordered in the metadata; gaps
  * after an expiry are fine — batches plan over the DECLARED ids in
  * range). Each batch emits one row per manifest entry the snapshot
  * itself CHANGED: status=1 ADDED → `add`, status=2 DELETED →
  * `remove` (carried EXISTING entries are not changes). Iceberg
  * manifests carry each entry's `record_count` even on the DELETED
  * side, so — unlike the Delta stream — no live-set replay is needed
  * for the retraction pre-image; `content` distinguishes data files
  * from position/equality delete files, so a v2/v3 DML commit streams
  * as its delete-file additions. Metadata-scale end to end: a 100 TB
  * table's change stream is KB per snapshot, and a downstream
  * `foreachBatch` decides which referenced files to open.
  *
  * Exactly-once: snapshots are immutable and ordered; offset replay
  * re-plans byte-identical batches. Actions ride INSIDE each
  * InputPartition (metadata-sized), so executors never touch the
  * table's filesystem.
  */
object IcebergStream {
  val SCHEMA: StructType = StructType(Seq(
    StructField("snapshot_id", LongType, nullable = false),
    StructField("action", StringType, nullable = false),
    StructField("file_path", StringType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("content", IntegerType, nullable = false)))

  /** One snapshot's changed entries: (action, path, records, content). */
  def actionRows(spark: SparkSession, base: String,
                 snapshotId: Long): Seq[(String, String, Long, Int)] = {
    val entries = IcebergReader.manifestEntries(spark, base, snapshotId)
    val hasContent = entries.schema("data_file").dataType
      .asInstanceOf[StructType].fieldNames.contains("content")
    val contentCol =
      if (hasContent) col("data_file.content")
      else org.apache.spark.sql.functions.lit(0)
    entries.filter(col("status").isin(1, 2))
      .select(col("status"), col("data_file.file_path"),
        col("data_file.record_count"), contentCol.cast("int"))
      .collect().map { r =>
        (if (r.getInt(0) == 1) "add" else "remove",
          r.getString(1), r.getLong(2), r.getInt(3))
      }.toSeq
  }
}

/** `format("graft.sources.IcebergStreamProvider")` entry point. */
class IcebergStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IcebergStream.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val base = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "IcebergStreamProvider needs .option(\"path\", <table base>)"))
    new IcebergStreamTable(base)
  }
}

final class IcebergStreamTable(base: String) extends Table with SupportsRead {
  override def name(): String = s"iceberg_stream($base)"
  override def schema(): StructType = IcebergStream.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = IcebergStream.SCHEMA
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new IcebergMicroBatchStream(base)
    }
}

final case class SnapshotIdOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

final class IcebergMicroBatchStream(base: String) extends MicroBatchStream {
  override def initialOffset(): Offset = SnapshotIdOffset(0L)
  override def latestOffset(): Offset = SnapshotIdOffset(
    IcebergReader.currentSnapshotId(base, IcebergReader.currentMetadataVersion(base)))
  override def deserializeOffset(json: String): Offset =
    SnapshotIdOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotIdOffset].v
    val e = end.asInstanceOf[SnapshotIdOffset].v
    if (e <= s) return Array.empty
    val spark = SparkSession.active
    // snapshot ids can be non-contiguous after an expiry — plan over
    // the metadata's DECLARED ids in (s, e]
    val ids = IcebergReader.snapshots(base, IcebergReader.currentMetadataVersion(base))
      .map(_.id).filter(id => id > s && id <= e).sorted
    ids.map { id =>
      IcebergActionsPartition(id, IcebergStream.actionRows(spark, base, id).toArray)
        : InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    IcebergActionsReaderFactory
}

/** Actions ride inside the partition — executors never read metadata/. */
final case class IcebergActionsPartition(
    snapshotId: Long, actions: Array[(String, String, Long, Int)]) extends InputPartition

object IcebergActionsReaderFactory extends PartitionReaderFactory {
  import org.apache.spark.unsafe.types.UTF8String
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[IcebergActionsPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.actions.length }
      override def get(): InternalRow = {
        val (action, path, records, content) = p.actions(i)
        new GenericInternalRow(Array[Any](p.snapshotId,
          UTF8String.fromString(action), UTF8String.fromString(path),
          records, content))
      }
      override def close(): Unit = ()
    }
  }
}
