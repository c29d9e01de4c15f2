package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: time (and optionally explain) individual declared queries.
  *   sbt "runMain graft.tools.Profile <sfDir> <query> [explain]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val doExplain = args.length > 2 && args(2) == "explain"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      if (doExplain) SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      // time fn() + count together — some queries (iterative ones) do
      // eager work inside fn, exactly as Bench measures them
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[profile] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // second run (warm)
      val t1 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[profile] $name (warm): ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
