package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries under varying shuffle-partition counts.
  *
  *   sbt "runMain graft.tools.PerfProbe <sfDir> <q1,q2> <parts1,parts2>"
  *
  * Streaming drains are particularly partition-sensitive (state-store
  * instances = shuffle partitions), so this is the quick way to pick a
  * drain parallelism before pinning it in a query body.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val partsList = args(2).split(",").toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the table cache + engine
    graft.SparkEntry.queries(names.head)(spark, sfDir).count()
    for (parts <- partsList; name <- names) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[perfprobe] parts=$parts%-4s $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
