package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Proves the round-8 scale-shaped kNN edge artifact
  * (AnnQueries.blockedKnn: 2-D blocked all-pairs equi-join, per-task
  * k-bounded prune) emits EXACTLY the brute all-pairs top-3 edge set on
  * both graded corpora — the consumers (q_graph_jaccard, q_graph_lpa)
  * are oracle-hash-gated against brute-force DuckDB SQL, so recall < 1.0
  * here would ship driver-red. (The approximate generators were measured
  * first: nn-descent at k=8/3 rounds plateaus at ~75% of brute top-3 on
  * this weakly-clustered corpus — that is why the exact blocked form is
  * the artifact.) */
class GraphEdgesSpec extends SparkSpec {

  /** Reference: brute all-pairs top-3 cosine edges, (u<v) distinct —
    * the exact semantics the DuckDB oracles replay. */
  private def bruteEdges(d: String): DataFrame = {
    graft.functions.ArrayCosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val a = e.select(col("vec_id").as("id1"), col("v").as("va"))
    val b = e.select(col("vec_id").as("id2"), col("v").as("vb"))
    val pairs = a.crossJoin(b).filter(col("id1") =!= col("id2"))
      .select(col("id1"), col("id2"),
        (floor(expr("graft_cosine(va, vb)") * 1000.0 + 0.5) / 1000.0).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id1").orderBy(col("cos_sim").desc, col("id2"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(least(col("id1"), col("id2")).as("u"),
        greatest(col("id1"), col("id2")).as("v")).distinct()
  }

  private def asSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  for (d <- Seq(sf0001, sf001)) {
    test(s"blocked-kNN edge artifact equals brute top-3 edges on $d") {
      val got = asSet(queries.DedupQueries.knnEdges(spark, d))
      val want = asSet(bruteEdges(d))
      assert((want -- got).isEmpty, s"missing edges: ${(want -- got).take(10)}")
      assert((got -- want).isEmpty, s"extra edges: ${(got -- want).take(10)}")
    }
  }
}
