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

  test("equi-join conjunct makes the strategy decline — hash join wins") {
    graft.plans.CosineJoinStrategy.enable(spark)
    val a = vecs.select(col("vec_id").as("id1"), col("v").as("v1"))
    val b = vecs.select(col("vec_id").as("id2"), col("v").as("v2"))
    val q = a.crossJoin(b).filter(expr("graft_cosine(v1, v2) >= 0.4 AND id1 = id2"))
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("CosineJoin"),
      s"strategy demoted an equi-join to the O(n·m) kernel:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"expected a hash join on the equi key:\n$p")
  }

  test("build side over the broadcast cap is not claimed by the strategy") {
    graft.plans.CosineJoinStrategy.enable(spark)
    spark.conf.set(graft.plans.CosineJoinStrategy.MAX_BROADCAST_KEY, "1")
    try {
      val p = declarative.queryExecution.executedPlan.toString
      assert(!p.contains("CosineJoin"), s"strategy ignored the size cap:\n$p")
    } finally spark.conf.unset(graft.plans.CosineJoinStrategy.MAX_BROADCAST_KEY)
  }

  test("unequal-length vectors: kernel matches the expression form bit for bit") {
    graft.plans.CosineJoinStrategy.enable(spark)
    graft.functions.ArrayCosineSimilarity.register(spark)
    import spark.implicits._
    val va = Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(0.5, -1.0)),
      (3L, Seq(2.0, 2.0, 2.0, 2.0))).toDF("id1", "v1")
    val vb = Seq((10L, Seq(1.0, 1.0)), (11L, Seq(3.0, -2.0, 1.0)),
      (12L, Seq(0.25, 0.5, 0.75, 1.0, 1.25))).toDF("id2", "v2")
    def q = va.crossJoin(vb)
      .filter(expr("graft_cosine(v1, v2) >= -1.0"))
      .select(col("id1"), col("id2"), expr("graft_cosine(v1, v2)").as("cos"))
    assert(q.queryExecution.executedPlan.toString.contains("CosineJoin"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2)).toSeq
    val kernel = rows(q)
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ == graft.plans.CosineJoinStrategy)
    try {
      val naive = rows(q)
      assert(kernel == naive, s"kernel=$kernel\nnaive=$naive")
      assert(kernel.size == 9, "every pair should clear the -1 threshold")
    } finally graft.plans.CosineJoinStrategy.enable(spark)
  }

  test("q_sim_knn through the kernel equals the driver-side reference topK") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaPlan = rows(graft.queries.TextQueries.queries("q_sim_knn")(spark, sf0001))
    val reference = rows(graft.functions.CosineKernel.topK(
      spark, Tables.embeddings(spark, sf0001), 5))
    assert(viaPlan == reference)
    assert(viaPlan.nonEmpty)
  }

  test("fused window top-k with duplicate left keys still yields exact per-key top-k") {
    // the kernel's fused limit is per left ROW; with a repeated partition
    // key that is a SUPERSET of the per-key top-k, and the Window + Filter
    // above must trim it to the exact answer — same contract Partial-mode
    // WindowGroupLimit relies on
    import spark.implicits._
    graft.plans.CosineJoinStrategy.enable(spark)
    graft.functions.ArrayCosineSimilarity.register(spark)
    val a = Seq((1L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)), (2L, Seq(1.0, 1.0)))
      .toDF("gid", "v1") // key 1 appears twice with DIFFERENT vectors
    val b = (1 to 10).map(i => (i.toLong + 100, Seq(math.cos(i * 0.3), math.sin(i * 0.3))))
      .toDF("id2", "v2")
    // DSL r3 form (floor on DOUBLE literals) — the SQL-string form would
    // type its literals DECIMAL and the strategy rightly declines
    def r3(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000.0) + lit(0.5)) / lit(1000.0)
    def q = {
      val pairs = a.crossJoin(b)
        .filter(r3(expr("graft_cosine(v1, v2)")) >= lit(-1.0))
        .select(col("gid"), col("id2"), r3(expr("graft_cosine(v1, v2)")).as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("gid").orderBy(col("cos").desc, col("id2"))
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("gid", "id2", "cos")
    }
    assert(q.queryExecution.executedPlan.toString.contains("CosineJoin"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(p => (p._1, p._2)).toSeq
    val fused = rows(q)
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ == graft.plans.CosineJoinStrategy)
    try {
      val naive = rows(q)
      assert(fused == naive, s"fused=$fused\nnaive=$naive")
      assert(fused.count(_._1 == 1L) == 3 && fused.count(_._1 == 2L) == 3,
        s"expected exactly 3 rows per key: $fused")
    } finally graft.plans.CosineJoinStrategy.enable(spark)
  }

  test("fusion declines when the window orders by a different cosine than the filter") {
    // filter on the ROUNDED cosine but window ordered by the UNROUNDED
    // one: pruning inside the kernel by the rounded score could evict a
    // row the raw-score window ranks in the top-k, so the strategy must
    // NOT fuse — the physical WindowGroupLimit does the trim instead
    import spark.implicits._
    graft.plans.CosineJoinStrategy.enable(spark)
    graft.functions.ArrayCosineSimilarity.register(spark)
    val a = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("gid", "v1")
    val b = (1 to 8).map(i => (i.toLong + 100, Seq(math.cos(i * 0.4), math.sin(i * 0.4))))
      .toDF("id2", "v2")
    def r3(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000.0) + lit(0.5)) / lit(1000.0)
    def q = {
      val pairs = a.crossJoin(b)
        .filter(r3(expr("graft_cosine(v1, v2)")) >= lit(-1.0))
        .select(col("gid"), col("id2"), expr("graft_cosine(v1, v2)").as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("gid").orderBy(col("cos").desc, col("id2"))
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("gid", "id2", "cos")
    }
    def findExec(p: org.apache.spark.sql.execution.SparkPlan): Option[graft.plans.CosineJoinExec] =
      p.collectFirst { case c: graft.plans.CosineJoinExec => c }.orElse(
        p.collectFirst {
          case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => ad
        }.flatMap(ad => findExec(ad.executedPlan)))
    val exec = findExec(q.queryExecution.executedPlan)
    assert(exec.forall(_.topK.isEmpty),
      s"top-k fused over a MISMATCHED sort score: ${exec.map(_.topK)}")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(p => (p._1, p._2)).toSeq
    val planned = rows(q)
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ == graft.plans.CosineJoinStrategy)
    try assert(planned == rows(q))
    finally graft.plans.CosineJoinStrategy.enable(spark)
  }

  test("fused top-k ranks NULL tiebreaks like the window's NULLS FIRST") {
    // negative ids make the bug visible: a null tie coerced to 0 would
    // sort AFTER -5/-3, while ASC NULLS FIRST ranks the null row first
    import spark.implicits._
    graft.plans.CosineJoinStrategy.enable(spark)
    graft.functions.ArrayCosineSimilarity.register(spark)
    val a = Seq((1L, Seq(1.0, 0.0))).toDF("gid", "v1")
    val b = Seq((Option(-5L), Seq(1.0, 0.0)), (Option(-3L), Seq(1.0, 0.0)),
      (Option.empty[Long], Seq(1.0, 0.0)), (Option(7L), Seq(0.5, 0.5)))
      .toDF("id2", "v2")
    def r3(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000.0) + lit(0.5)) / lit(1000.0)
    def q = {
      val pairs = a.crossJoin(b)
        .filter(r3(expr("graft_cosine(v1, v2)")) >= lit(-1.0))
        .select(col("gid"), col("id2"), r3(expr("graft_cosine(v1, v2)")).as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("gid").orderBy(col("cos").desc, col("id2"))
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .select("gid", "id2")
    }
    assert(q.queryExecution.executedPlan.toString.contains("CosineJoin"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .sortBy(_._2.getOrElse(Long.MinValue)).toSeq
    val fused = rows(q)
    assert(fused.map(_._2) == Seq(None, Some(-5L)),
      s"NULLS FIRST tie not honored in fused top-k: $fused")
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ == graft.plans.CosineJoinStrategy)
    try assert(fused == rows(q))
    finally graft.plans.CosineJoinStrategy.enable(spark)
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
