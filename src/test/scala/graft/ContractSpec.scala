package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the SURVEY §2 contract shape itself: every declared query is
  * present, oracle coverage is exactly as declared, and no query was
  * silently dropped (round-1 ADVICE flagged a 54/55 contract). */
class ContractSpec extends AnyFunSuite {

  // Derived from RegenGolden.NoOracle — the ONE declaration of the
  // NO-ORACLE set. GoldenSpec generates its pins from the same list, so a
  // query can't be declared oracle-free here while silently getting no
  // golden verification there (the two lists can't drift).
  private val noOracle: Set[String] = graft.tools.RegenGolden.NoOracle.toSet

  test("all 391 declared queries are present") {
    assert(SparkEntry.queries.size == 391,
      s"expected 391 queries, got ${SparkEntry.queries.size}: ${SparkEntry.queries.keys.toSeq.sorted}")
  }

  test("oracle coverage is exactly queries minus the declared NO-ORACLE set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle SQL for undeclared queries: ${o -- q}")
    assert((q -- o) == noOracle, s"NO-ORACLE drift: got ${q -- o}, declared $noOracle")
  }

  test("oracle SQL strings are single-line and reference parquet-view tables only") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("\n"), s"$name oracle SQL contains a newline")
      assert(!sql.contains("/root/"), s"$name oracle SQL hardcodes a path")
    }
  }
}
