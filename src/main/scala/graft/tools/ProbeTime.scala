package graft.tools

import org.apache.spark.sql.SparkSession

// throwaway probe: time named queries at a given sf dir
object ProbeTime {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_sim_knn")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    for (_ <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"TIMED $n ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
    }
    spark.stop()
  }
}
