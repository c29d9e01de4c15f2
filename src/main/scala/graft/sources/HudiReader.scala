package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Read-only interop with the PUBLIC Apache Hudi copy-on-write table
  * layout — the THIRD foreign format, and a third distinct shape:
  * Delta is a log replayed forward, Iceberg a metadata tree walked
  * down, Hudi a TIMELINE joined against file NAMES. State lives in two
  * places that must agree:
  *
  * {{{
  *   .hoodie/hoodie.properties        → table type (COW vs MOR)
  *   .hoodie/<instant>.commit         → completed instants (the timeline)
  *   .hoodie/<instant>.inflight       → started, NOT readable
  *   <fileId>_<writeToken>_<instant>.parquet   → base files; the name
  *                                      carries the file group AND the
  *                                      instant that wrote it
  * }}}
  *
  * A snapshot read at instant t = for every file group (fileId), the
  * base file with the LARGEST commit instant ≤ t **whose instant is a
  * completed commit** — files written by inflight/failed instants sit
  * in the same directory and must be invisible (that filter is the
  * whole point of the timeline). Upserts rewrite a file group wholesale
  * (copy-on-write), so picking the latest committed slice per group is
  * the entire merge.
  *
  * Scope: COPY_ON_WRITE snapshot + time-travel reads. MERGE_ON_READ
  * (log files to compact) is rejected fast via `hoodie.properties`.
  * Partition values ride inside the data files (Hudi writes them), so
  * the driver-side walk only lists names — data stays on the ordinary
  * pushdown-friendly parquet scan, metadata stays KB-scale.
  */
object HudiReader {

  final case class BaseFile(fileId: String, instant: String, path: String)

  private def hoodieDir(base: String): Path = Paths.get(base, ".hoodie")

  private def props(base: String): Map[String, String] = {
    val p = hoodieDir(base).resolve("hoodie.properties")
    require(Files.exists(p), s"no .hoodie/hoodie.properties under $base")
    Files.readAllLines(p).asScala
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _           => None
        }
      }.toMap
  }

  def assertReadable(base: String): Unit = {
    val t = props(base).getOrElse("hoodie.table.type", "COPY_ON_WRITE")
    require(t == "COPY_ON_WRITE", s"hoodie.table.type=$t — only COPY_ON_WRITE is readable here")
  }

  /** Completed commit instants, ascending. Inflight/requested markers
    * are not completions and are ignored. */
  def completedCommits(base: String): Seq[String] = {
    val d = hoodieDir(base)
    require(Files.isDirectory(d), s"no .hoodie timeline under $base")
    val commit = "^([0-9]+)\\.commit$".r
    Files.list(d).iterator.asScala
      .map(_.getFileName.toString)
      .collect { case commit(t) => t }
      .toSeq.sorted
  }

  /** All base files under the table (driver-side name walk, `.hoodie`
    * excluded), committed or not — the timeline decides visibility. */
  def baseFiles(base: String): Seq[BaseFile] = {
    // non-greedy fileId + a well-formed write token: a retried write
    // changes the token, and a greedy fileId would absorb part of it
    // and split one file group into two
    val name = "^(.+?)_([0-9]+-[0-9]+-[0-9]+)_([0-9]+)\\.parquet$".r
    Files.walk(Paths.get(base)).iterator.asScala
      .filter(p => Files.isRegularFile(p) && !p.startsWith(hoodieDir(base)))
      .flatMap { p =>
        p.getFileName.toString match {
          case name(fileId, _, instant) => Some(BaseFile(fileId, instant, p.toString))
          case _                        => None
        }
      }.toSeq
  }

  /** The live file slice per file group as of `asOf`: max committed
    * instant ≤ asOf. Groups created after `asOf` drop out. */
  def sliceFiles(base: String, asOf: String): Seq[String] = {
    assertReadable(base)
    val committed = completedCommits(base).filter(_ <= asOf).toSet
    require(committed.nonEmpty, s"no completed commit at or before $asOf under $base")
    baseFiles(base)
      .filter(f => committed.contains(f.instant))
      .groupBy(_.fileId).values
      .map(_.maxBy(_.instant).path)
      .toSeq.sorted
  }

  /** The file slices an incremental read in (from, to] must open:
    * latest committed slice per group as of `to`, RESTRICTED to groups
    * whose latest instant falls in the range — untouched file groups
    * are pruned from the scan entirely (Hudi's incremental candidate
    * pruning; at scale this is what keeps a CDC poll from re-reading
    * the table). */
  def incrementalFiles(base: String, fromTime: String, toTime: String): Seq[String] = {
    assertReadable(base)
    val committed = completedCommits(base).filter(_ <= toTime).toSet
    baseFiles(base)
      .filter(f => committed.contains(f.instant))
      .groupBy(_.fileId).values
      .map(_.maxBy(_.instant))
      .filter(_.instant > fromTime)
      .map(_.path).toSeq.sorted
  }

  /** Hudi incremental query: the rows commits in (from, to] wrote.
    * A copy-on-write rewrite copies unchanged rows forward with their
    * ORIGINAL `_hoodie_commit_time`, so filtering the pruned slices on
    * that meta column surfaces exactly the upserted rows — deletes, by
    * design, surface as absence, not rows. */
  def readIncremental(spark: SparkSession, base: String,
                      fromTime: String, toTime: String): DataFrame = {
    val files = incrementalFiles(base, fromTime, toTime)
    require(files.nonEmpty, s"no commits in ($fromTime, $toTime] under $base")
    val df = spark.read.parquet(files: _*)
    require(df.columns.contains("_hoodie_commit_time"),
      s"$base carries no _hoodie_commit_time meta column — not incremental-readable")
    df.filter(org.apache.spark.sql.functions.col("_hoodie_commit_time") > fromTime &&
      org.apache.spark.sql.functions.col("_hoodie_commit_time") <= toTime)
  }

  /** Time-travel snapshot read. */
  def readAsOf(spark: SparkSession, base: String, asOf: String): DataFrame = {
    val files = sliceFiles(base, asOf)
    require(files.nonEmpty, s"empty snapshot at $asOf of $base")
    spark.read.parquet(files: _*)
  }

  /** Latest-committed snapshot read. */
  def read(spark: SparkSession, base: String): DataFrame = {
    val commits = completedCommits(base)
    require(commits.nonEmpty, s"no completed commits under $base")
    readAsOf(spark, base, commits.last)
  }
}
