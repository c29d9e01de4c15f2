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

  /** One add action per new part file, stats included. */
  private def addActions(spark: SparkSession, base: String, relPaths: Seq[String]): Seq[String] = {
    val counts = spark.read.parquet(relPaths.map(r => s"$base/$r"): _*)
      .groupBy(col("_metadata.file_name").as("f"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    relPaths.map { rel =>
      val name = rel.split('/').last
      val n = counts.getOrElse(name, 0L)
      val sz = Files.size(Paths.get(base, rel))
      s"""{"add":{"path":"$rel","partitionValues":{},"size":$sz,"modificationTime":0,""" +
        s""""dataChange":true,"stats":"{\\"numRecords\\":$n}"}}"""
    }
  }

  /** Stage-write `df` as parquet and move the part files under the
    * table base with a version prefix; returns their relative paths. */
  private def writeData(df: DataFrame, base: String, version: Long): Seq[String] = {
    val tmp = s"$base/.stage-v$version"
    TxnLog.rmrf(tmp)
    df.write.parquet(tmp)
    Files.createDirectories(Paths.get(base))
    val moved = Files.list(Paths.get(tmp)).iterator.asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val rel = s"v$version-${p.getFileName}"
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

  /** Create a new Delta table at `base` (version 0). */
  def create(spark: SparkSession, df: DataFrame, base: String, tableId: String): Unit = {
    TxnLog.rmrf(base)
    val rels = writeData(df, base, 0L)
    commit(base, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"${esc(tableId)}","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${esc(df.schema.json)}","partitionColumns":[],""" +
        s""""configuration":{},"createdTime":0}}""") ++ addActions(spark, base, rels))
  }

  /** Append-only commit: the table's next version adds `df`'s rows. */
  def append(spark: SparkSession, df: DataFrame, base: String): Unit = {
    val version = DeltaLogReader.latestVersion(base) + 1
    val rels = writeData(df, base, version)
    commit(base, version,
      s"""{"commitInfo":{"operation":"WRITE","timestamp":0}}""" +: addActions(spark, base, rels))
  }
}
