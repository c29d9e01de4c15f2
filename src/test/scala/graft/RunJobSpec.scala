package graft

import org.scalatest.funsuite.AnyFunSuite

/** The orchestrator entry point (graft.tools.RunJob): registered-query
  * and ad-hoc-SQL modes both write readable output with a _SUCCESS
  * commit marker, and unknown queries fail loudly (exit-code contract
  * is what an external DAG engine keys off). */
class RunJobSpec extends SparkSpec {

  test("registered-query mode writes parquet with a commit marker") {
    val out = java.nio.file.Files.createTempDirectory("graft_runjob_").toString + "/q"
    val rows = graft.tools.RunJob.run("q_agg_pricing", sf0001, out, "parquet", spark)
    assert(rows > 0)
    assert(new java.io.File(s"$out/_SUCCESS").exists, "atomic-commit marker missing")
    assert(spark.read.parquet(out).count() == rows)
  }

  test("ad-hoc SQL mode runs over the registered corpus views (events normalized)") {
    val out = java.nio.file.Files.createTempDirectory("graft_runjob_").toString + "/sql"
    val rows = graft.tools.RunJob.run(
      "sql:SELECT source, count(*) AS n FROM documents GROUP BY source", sf0001, out, "csv", spark)
    assert(rows == 20, s"expected 20 sources, got $rows")
    val rows2 = graft.tools.RunJob.run(
      "sql:SELECT count(*) AS n FROM events WHERE ts IS NOT NULL", sf0001,
      out + "2", "jsonl", spark)
    assert(rows2 == 1)
  }

  test("unknown query names fail loudly") {
    intercept[IllegalArgumentException] {
      graft.tools.RunJob.run("q_nope", sf0001, "/tmp/never", "parquet", spark)
    }
  }
}
