package graft

import org.apache.spark.sql.functions._

/** CosineJoinStrategy: the declarative cross-join + graft_cosine filter
  * must plan as the broadcast kernel (CosineJoinExec) and return exactly
  * the rows the naive plan returns — same pairs, same bits. */
class CosineJoinSpec extends SparkSpec {

  private def vecs = {
    graft.functions.ArrayCosineSimilarity.register(spark)
    Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
  }

  private def declarative = {
    val a = vecs.select(col("vec_id").as("id1"), col("v").as("v1"))
    val b = vecs.select(col("vec_id").as("id2"), col("v").as("v2"))
    a.crossJoin(b).filter(expr("graft_cosine(v1, v2) >= 0.4 AND id1 < id2"))
      .select("id1", "id2")
  }

  test("declarative cosine theta-join plans as the broadcast kernel") {
    graft.plans.CosineJoinStrategy.enable(spark)
    val p = declarative.queryExecution.executedPlan.toString
    assert(p.contains("CosineJoin"), s"strategy did not fire:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair-expansion join remains:\n$p")
  }

  test("kernel results equal the naive plan, pair for pair") {
    graft.plans.CosineJoinStrategy.enable(spark)
    val withKernel = declarative.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    // same query with the strategy removed -> Spark's built-in BNLJ path
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ == graft.plans.CosineJoinStrategy)
    try {
      val naive = declarative.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(withKernel == naive,
        s"kernel=${withKernel.take(5)}... naive=${naive.take(5)}...")
      assert(withKernel.nonEmpty, "no pairs above threshold — test has no signal")
    } finally graft.plans.CosineJoinStrategy.enable(spark)
  }

  test("residual conjuncts are applied (id1 < id2 halves the pair set)") {
    graft.plans.CosineJoinStrategy.enable(spark)
    val a = vecs.select(col("vec_id").as("id1"), col("v").as("v1"))
    val b = vecs.select(col("vec_id").as("id2"), col("v").as("v2"))
    val all = a.crossJoin(b).filter(expr("graft_cosine(v1, v2) >= 0.4 AND id1 != id2")).count()
    val half = declarative.count()
    assert(all == 2 * half, s"all=$all half=$half")
  }
}
