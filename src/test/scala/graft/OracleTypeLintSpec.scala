package graft

import java.nio.file.Files

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Oracle result-TYPE tripwire — the round-7 regression class.
  *
  * The driver's correctness hash is type-sensitive: DuckDB types an
  * un-CAST integer `sum()` as HUGEINT (INT128), which hashes differently
  * from the BIGINT Spark writes even when every cell value is equal. 23
  * round-6/7 oracles shipped red exactly this way (VERDICT.md round 7).
  * This spec types every `SparkEntry.oracleSql` result relation via
  * DuckDB `LIMIT 0` (scripts/oracle_typecheck.py) and fails the build on
  * any HUGEINT/UHUGEINT/DECIMAL(38,0) column — before a Verify round can
  * ship it.
  *
  * Skipped (assume) when python3+duckdb aren't on PATH, so the suite
  * stays runnable in a JVM-only environment.
  */
class OracleTypeLintSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def duckdbAvailable: Boolean =
    try Seq("python3", "-c", "import duckdb").!(ProcessLogger(_ => ())) == 0
    catch { case _: Throwable => false }

  test("no oracle query's DuckDB result relation contains a driver-hash-unsafe type") {
    assume(duckdbAvailable, "python3+duckdb not available; lint runs via scripts/oracle_typecheck.py in the verify loop")
    assume(new java.io.File(s"$sfDir/orders.parquet").exists, s"$sfDir testdata not present")
    // Same JSON escaping contract as Verify.scala's dump.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val tmp = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(tmp, json)
    val out = new StringBuilder
    val code = Seq("python3", "scripts/oracle_typecheck.py", sfDir, tmp.toString)
      .!(ProcessLogger(l => out.append(l).append('\n')))
    Files.deleteIfExists(tmp)
    assert(code == 0, s"oracle type lint failed:\n$out")
  }
}
