package graft

import graft.typed.TypedOps
import org.apache.spark.sql.functions._

/** The typed Dataset surface agrees with its untyped equivalents. */
class TypedOpsSpec extends SparkSpec {

  test("typed langStats equals untyped groupBy aggregation") {
    val ds = TypedOps.docs(spark, sf0001)
    val typed = TypedOps.langStats(ds, 100L).collect()
      .map(s => s.lang -> (s.n_docs, s.total_chars, s.longest)).toMap
    val untyped = Tables.documents(spark, sf0001)
      .filter(col("n_chars") >= 100)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("t"), max("n_chars").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(typed == untyped)
  }

  test("typed representatives: one deterministic doc per (lang, source)") {
    val ds = TypedOps.docs(spark, sf0001)
    val reps = TypedOps.representatives(ds).collect()
    val groups = ds.collect().groupBy(d => (d.lang, d.source))
    assert(reps.length == groups.size)
    reps.foreach { r =>
      val g = groups((r.lang, r.source))
      val best = g.maxBy(d => (d.n_chars, -d.doc_id))
      assert(r.doc_id == best.doc_id, s"(${r.lang},${r.source})")
    }
  }

  test("encoder round-trip preserves the case class") {
    val ds = TypedOps.docs(spark, sf0001)
    val first = ds.orderBy("doc_id").head()
    assert(first.doc_id == 0L && first.text.nonEmpty && first.n_chars > 0)
  }
}
