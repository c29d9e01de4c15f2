package graft

import org.scalatest.funsuite.AnyFunSuite

/** Proves the engine survives a REAL executor boundary: a child JVM runs
  * ClusterSmoke's representative slice under `local-cluster[2,4,4096]` (two
  * separate executor JVMs, real serialization of broadcast kernels,
  * custom aggregator buffers, checkpoint blocks and codec state), and
  * every result must equal the same query on the shared local[4]
  * session row-for-row. A serialization bug in any custom operator —
  * invisible under local[*], fatal on a 1000-executor cluster — fails
  * this spec.
  *
  * The child process is unavoidable: one SparkContext per JVM, and this
  * test JVM already owns the local[4] session every other suite shares.
  */
class LocalClusterSpec extends SparkSpec {

  test("ClusterSmoke.smokeSet under local-cluster[2,4,4096] matches local[4] row-for-row") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_cluster_smoke_").toString
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx4g", "-cp", sys.props("java.class.path"),
      "graft.tools.ClusterSmoke", outDir, sf0001)
    val pb = new ProcessBuilder(cmd: _*)
    // the in-process Worker builds the executor launch command through the
    // launcher library, whose scala-version probe needs this hint when the
    // distro's bin/load-spark-env.sh hasn't run in this JVM's environment
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val log = new StringBuilder
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = reader.readLine()
    while (line != null) {
      if (line.contains("[cluster-smoke]") || line.contains("Exception")) log.append(line).append('\n')
      line = reader.readLine()
    }
    val exit = proc.waitFor()
    assert(exit == 0 && log.toString.contains("[cluster-smoke] OK"),
      s"cluster smoke child failed (exit $exit):\n$log")

    graft.tools.ClusterSmoke.smokeSet.foreach { name =>
      val clusterRows = spark.read.parquet(s"$outDir/$name")
      val localRows = SparkEntry.queries(name)(spark, sf0001)
      assert(clusterRows.schema.map(f => (f.name, f.dataType))
        == localRows.schema.map(f => (f.name, f.dataType)), s"$name: schema drift")
      val extra = clusterRows.exceptAll(localRows).count()
      val missing = localRows.exceptAll(clusterRows).count()
      assert(extra == 0 && missing == 0,
        s"$name: cluster result diverges from local[4] (extra=$extra missing=$missing)")
    }
  }
}
