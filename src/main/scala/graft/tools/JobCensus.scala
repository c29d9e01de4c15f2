package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: census the Spark JOBS a declared query schedules — the
  * fixture-commit-bound queries' cost is job count × per-job overhead,
  * not bytes, so the first profiling question is "how many jobs, how
  * many tasks each".
  *
  *   sbt "runMain graft.tools.JobCensus <sfDir> <q1,q2,...> [confK=V;confK=V]"
  *
  * Prints per-query totals (jobs, stages, tasks, wall seconds) and the
  * per-job task counts so 32-way task storms over KB data stand out.
  */
object JobCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val extra: Seq[(String, String)] =
      if (args.length > 2)
        args(2).split(";").toSeq.map(_.split("=", 2)).collect {
          case Array(k, v) => (k, v)
        }
      else Seq.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    val perJobTasks = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val perJobName = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        perJobTasks.add(j.stageInfos.map(_.numTasks).sum)
        // the final stage's callsite names the action that scheduled it
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        perJobName.add(s"${j.stageInfos.map(_.numTasks).sum}t:$site")
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    // warmup (untimed, uncounted after reset)
    try graft.SparkEntry.queries(names.head)(spark, sfDir).count()
    catch { case _: Throwable => }
    try graft.Hygiene.sweep(spark) catch { case _: Throwable => () }
    val verbose = sys.env.get("GRAFT_JOBCENSUS_VERBOSE").contains("1")
    names.foreach { name =>
      jobs.set(0); stages.set(0); tasks.set(0L); perJobTasks.clear(); perJobName.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      Thread.sleep(300) // let the listener bus drain
      val sec = (System.nanoTime() - t0) / 1e9
      val perJob = {
        import scala.jdk.CollectionConverters._
        perJobTasks.iterator.asScala.toSeq
      }
      println(f"[jobcensus] $name%-28s rows=$n%-6d jobs=${jobs.get}%-4d " +
        f"stages=${stages.get}%-4d tasks=${tasks.get}%-6d $sec%.2f s")
      println(s"[jobcensus]   tasks/job: ${perJob.mkString(",")}")
      if (verbose) {
        import scala.jdk.CollectionConverters._
        perJobName.iterator.asScala.zipWithIndex.foreach { case (n, i) =>
          println(f"[jobcensus]   job$i%-3d $n")
        }
      }
      try graft.Hygiene.sweep(spark) catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
