package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Streaming CDC source over the TxnLog commit log — a real DataSourceV2
  * `MicroBatchStream` (the public connector API Delta's own streaming
  * source implements against):
  *
  * {{{
  *   spark.readStream.format("graft.sources.TxnLogStreamProvider")
  *     .option("path", base).load()
  * }}}
  *
  * Offsets ARE log versions: `latestOffset` polls the manifest
  * directory; a batch over (start, end] emits one row per manifest
  * action of each version in the range, with every `remove` resolved
  * against the v−1 live set so its row-count/stats ride along (the
  * retraction pre-image — same algebra as `TxnLog.changes`). The stream
  * is therefore METADATA-scale end to end: a 100 TB table's commit
  * stream is a few KB per version regardless of data volume, and a
  * downstream `foreachBatch` decides which referenced data files (if
  * any) to open — the incremental-consumer economics the commit log
  * exists for.
  *
  * Exactly-once: versions are immutable and totally ordered, so offset
  * replay after a restart re-plans byte-identical batches; the engine's
  * offset log (checkpoint) + this determinism give end-to-end
  * exactly-once with any idempotent sink (see `commitIfAbsent`).
  *
  * Partitioning: one InputPartition per version, actions serialized
  * INTO the partition (metadata-sized, the same trick Delta uses for
  * file actions) — readers never touch the log directory, so executors
  * need no filesystem view of `_txnlog/`.
  */
object TxnLogStream {
  val SCHEMA: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("action", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("file_rows", LongType, nullable = false),
    StructField("stat_min", LongType, nullable = false),
    StructField("stat_max", LongType, nullable = false)))

  /** (action, path, rows, statMin, statMax) rows for every version in
    * [from, to], removes resolved against the evolving live set. ONE
    * forward replay of manifests 0..to — the live map threads through
    * the range (each version's remove resolution reads the map, then
    * the map absorbs that version's own adds/removes), so a batch
    * costs one linear log replay instead of one replay PER VERSION
    * (O(length²) for a batch spanning the whole log). */
  def actionRowsRange(base: String, from: Int, to: Int)
  : Map[Int, Seq[(String, String, Long, Long, Long)]] = {
    val live = scala.collection.mutable.LinkedHashMap.empty[String, TxnLog.AddFile]
    val out = Map.newBuilder[Int, Seq[(String, String, Long, Long, Long)]]
    (0 to to).foreach { v =>
      val m = TxnLog.mainManifest(base, v)
      if (v >= from) {
        out += v -> (m.adds.map(a => ("add", a.path, a.rows, a.statMin, a.statMax)) ++
          m.removes.map { p =>
            val f = live.getOrElse(p, throw new IllegalStateException(
              s"version $v removes unknown file $p"))
            ("remove", f.path, f.rows, f.statMin, f.statMax)
          })
      }
      m.removes.foreach(live.remove)
      m.adds.foreach(a => live(a.path) = a)
    }
    out.result()
  }

  /** Single-version convenience (tests / ad-hoc inspection). */
  def actionRows(base: String, v: Int): Seq[(String, String, Long, Long, Long)] =
    actionRowsRange(base, v, v)(v)
}

/** `format("graft.sources.TxnLogStreamProvider")` entry point. */
class TxnLogStreamProvider extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister
  with org.apache.spark.sql.sources.StreamSinkProvider {
  override def shortName(): String = "graft-txnlog-stream"

  /** `writeStream.format("graft-txnlog-stream")` — the exactly-once
    * TxnLog sink: each micro-batch commits via
    * [[TxnLog.commitIfAbsent]]'s manifest txn markers (the TABLE is
    * the source of truth; redelivered batches absorb). */
  override def createSink(sqlContext: org.apache.spark.sql.SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
  : org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "graft-txnlog-stream sink does not partition")
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft-txnlog-stream sink is append-only, got $outputMode")
    val base = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-txnlog-stream sink needs .option(\"path\", <table base>)"))
    new org.apache.spark.sql.GraftTxnLogStreamSink(base,
      parameters.getOrElse("appId", "graft-txnlog-sink"))
  }
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TxnLogStream.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val base = properties.get("path")
    require(base != null, "TxnLogStreamProvider requires .option(\"path\", <table base>)")
    new TxnLogStreamTable(base)
  }
}

final class TxnLogStreamTable(base: String) extends Table with SupportsRead {
  override def name(): String = s"txnlog_stream($base)"
  override def schema(): StructType = TxnLogStream.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = TxnLogStream.SCHEMA
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new TxnLogMicroBatchStream(base)
    }
}

/** Offset = committed log version (self-describing json). */
final case class VersionOffset(v: Int) extends Offset {
  override def json(): String = v.toString
}

final class TxnLogMicroBatchStream(base: String) extends MicroBatchStream {
  override def initialOffset(): Offset = VersionOffset(-1)
  override def latestOffset(): Offset = VersionOffset(TxnLog.latestMainVersion(base))
  override def deserializeOffset(json: String): Offset = VersionOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].v
    val e = end.asInstanceOf[VersionOffset].v
    if (e <= s) return Array.empty
    val byVersion = TxnLogStream.actionRowsRange(base, s + 1, e)
    ((s + 1) to e).map { v =>
      TxnLogActionsPartition(v, byVersion(v).toArray)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TxnLogActionsReaderFactory
}

/** Actions ride inside the partition — executors never read `_txnlog/`. */
final case class TxnLogActionsPartition(
    version: Int, actions: Array[(String, String, Long, Long, Long)])
  extends InputPartition

object TxnLogActionsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TxnLogActionsPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.actions.length }
      override def get(): InternalRow = {
        val (action, path, rows, lo, hi) = p.actions(i)
        new GenericInternalRow(Array[Any](p.version.toLong,
          UTF8String.fromString(action), UTF8String.fromString(path),
          rows, lo, hi))
      }
      override def close(): Unit = ()
    }
  }
}
