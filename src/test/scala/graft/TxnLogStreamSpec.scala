package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{TxnLog, VersionOffset}

/** The DataSourceV2 MicroBatchStream over the commit log
  * (graft.sources.TxnLogStreamProvider): offset algebra, restart
  * resumption (exactly-once planning off the engine's offset log), and
  * remove-action stat resolution. */
class TxnLogStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(tag: String): String = {
    val p = s"/tmp/graft_txnstream_$tag"
    TxnLog.rmrf(p); p
  }

  private def drainTo(base: String, ck: String,
                      sink: scala.collection.mutable.Buffer[(Long, String, Long)]): Unit = {
    val q = spark.readStream
      .format("graft.sources.TxnLogStreamProvider")
      .option("path", base).load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink.synchronized {
          sink ++= batch.select("version", "action", "file_rows").collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        }
        ()
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("restart resumes at the committed offset: only new versions replay") {
    val base = freshBase("resume")
    val ck = java.nio.file.Files.createTempDirectory("graft_stream_ck_").toString
    val log = new TxnLog(spark, base, statCol = Some("k"))
    log.init()
    log.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)) // v0
    log.append(Seq((3L, "c")).toDF("k", "v").coalesce(1))            // v1
    val got = scala.collection.mutable.Buffer.empty[(Long, String, Long)]
    drainTo(base, ck, got)
    assert(got.map(_._1).toSet == Set(0L, 1L), s"first drain saw $got")
    assert(got.forall(_._2 == "add"))
    val firstCount = got.size
    // new commits land while the stream is down
    log.deleteWhere(col("k") <= 2L)                                  // v2
    log.append(Seq((4L, "d")).toDF("k", "v").coalesce(1))            // v3
    drainTo(base, ck, got)
    val second = got.drop(firstCount)
    assert(second.map(_._1).toSet == Set(2L, 3L),
      s"resume must deliver ONLY versions 2..3, got $second")
    // the COW delete's removes carry resolved row counts (retraction
    // pre-image), never placeholders
    val removes = second.filter(_._2 == "remove")
    assert(removes.nonEmpty && removes.forall(_._3 > 0L),
      s"removes must resolve prior stats: $removes")
    // and an idle restart delivers nothing
    val before = got.size
    drainTo(base, ck, got)
    assert(got.size == before, "no new versions => empty batch")
  }

  test("offset json round-trip") {
    val s = new graft.sources.TxnLogMicroBatchStream("/tmp/nonexistent")
    assert(s.deserializeOffset(VersionOffset(7).json()) == VersionOffset(7))
    assert(s.initialOffset() == VersionOffset(-1))
    assert(s.latestOffset() == VersionOffset(-1), "empty log => offset -1")
  }

  test("q_pref_bradley_terry: win/game masses reconcile with a direct census") {
    val r = graft.queries.EventQueries.queries("q_pref_bradley_terry")(spark, sf001)
      .collect()
    assert(r.length == 5)
    val totalWins = r.map(_.getLong(2)).sum
    val totalGames = r.map(_.getLong(1)).sum
    // every comparison contributes 1 win and 2 game-entries (one per side)
    assert(totalGames == 2 * totalWins,
      s"game mass $totalGames != 2x win mass $totalWins")
    assert(r.forall(_.getLong(3) > 0L), "ratings must stay positive")
    // direct comparison count over the corpus
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val direct = Tables.events(spark, sf001)
      .withColumn("pt", lag(col("event_type"), 1).over(w))
      .filter(col("pt").isNotNull && col("pt") =!= col("event_type"))
      .count()
    assert(totalWins == direct, s"wins $totalWins != comparisons $direct")
  }

  test("writeStream.format(graft-txnlog-stream): exactly-once sink via txn markers") {
    import org.apache.spark.sql.functions._
    val base = freshBase("sink_fmt")
    val srcDir = "/tmp/graft_txnstream_sink_src"
    TxnLog.rmrf(srcDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    spark.range(0, 30).select(col("id"), (col("id") % 4).as("g"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    def drain(ck: String): Unit = {
      val q = spark.readStream.schema("id BIGINT, g BIGINT").parquet(srcDir)
        .writeStream.format("graft-txnlog-stream")
        .option("path", base).option("appId", "txn-sink-fmt")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val ck1 = java.nio.file.Files.createTempDirectory("graft_txnsink_ck_").toString
    drain(ck1)
    val log = new TxnLog(spark, base)
    assert(log.read().count() == 30L)
    // fresh checkpoint = full redelivery; the manifest txn marker absorbs
    val ck2 = java.nio.file.Files.createTempDirectory("graft_txnsink_ck_").toString
    drain(ck2)
    assert(log.read().count() == 30L)
  }
}
