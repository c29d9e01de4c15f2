package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the SURVEY §2 contract shape itself: every declared query is
  * present, oracle coverage is exactly as declared, and no query was
  * silently dropped (round-1 ADVICE flagged a 54/55 contract). */
class ContractSpec extends AnyFunSuite {

  private val noOracle = Set(
    "q_approx_distinct", // HLL is approximate — property-tested in HllSpec
    "q_approx_percentile", // sketch-based — property-tested vs exact percentile
    "q_dedup_near",      // MinHash mixing not portably SQL-expressible
    "q_dedup_simhash",   // same
    "q_ann_lsh",         // sign bits of float dots not portable
    "q_ann_knn",         // LSH-bucketed search — same reason
    "q_ann_ivf",         // argmax assignment not portable
    "q_dedup_embed_lsh", // LSH candidates — same; confirm-subset pinned vs q_dedup_embed
    "q_hll_merge",       // DataSketches HLL estimate — not reproducible in DuckDB; union==direct pinned
    "q_sketch_overlap",  // Theta intersection estimate — custom aggregate, pinned vs exact overlap
  )

  test("all 121 declared queries are present") {
    assert(SparkEntry.queries.size == 121,
      s"expected 121 queries, got ${SparkEntry.queries.size}: ${SparkEntry.queries.keys.toSeq.sorted}")
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
