package graft

import graft.queries.AnnQueries
import org.apache.spark.sql.functions._

/** Property tests for the NO-ORACLE ANN operators: partition/bucket
  * invariants plus the locality property that justifies them as kNN
  * scale paths (same-bucket pairs are more similar than average). */
class AnnSpec extends SparkSpec {

  test("IVF assigns every vector to exactly one centroid") {
    val hist = AnnQueries.queries("q_ann_ivf")(spark, sf001).collect()
    val total = Tables.embeddings(spark, sf001).count()
    assert(hist.map(_.getLong(1)).sum == total)
    assert(hist.length == 16, s"expected 16 centroids, got ${hist.length}")
  }

  test("LSH bucket histogram accounts for every vector") {
    val hist = AnnQueries.queries("q_ann_lsh")(spark, sf001).collect()
    val total = Tables.embeddings(spark, sf001).count()
    assert(hist.map(r => r.getLong(0) * r.getLong(1)).sum == total)
  }

  test("LSH locality: same-bucket pairs are more similar than random pairs") {
    val e = Tables.embeddings(spark, sf001)
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
    // recompute the q_sim_knn cosine for all pairs, tagged by bucket equality
    val sig = {
      // same deterministic hyperplanes as AnnQueries (private — recompute)
      def hp(j: Int): Array[Double] = Array.tabulate(64) { i =>
        val x = (1103515245L * (j * 64 + i + 1) + 12345L) & 0x7FFFFFFFL
        ((x % 65536L) - 32768L).toDouble
      }
      (0 until 16).map(j =>
        when(aggregate(zip_with(col("v"), array(hp(j).map(lit): _*), (x, y) => x * y),
          lit(0.0), (a, x) => a + x) >= 0.0, 1L << j).otherwise(0L)).reduce(_ + _)
    }
    val tagged = e.withColumn("bucket", sig)
      .select(col("vec_id"), col("v"), col("nrm"), col("bucket"))
    val a = tagged.select(col("vec_id").as("id1"), col("v").as("v1"), col("nrm").as("n1"), col("bucket").as("b1"))
    val b = tagged.select(col("vec_id").as("id2"), col("v").as("v2"), col("nrm").as("n2"), col("bucket").as("b2"))
    val stats = a.join(b, col("id1") < col("id2"))
      .withColumn("cos",
        aggregate(zip_with(col("v1"), col("v2"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
          / (col("n1") * col("n2")))
      .groupBy(col("b1") === col("b2")).agg(avg("cos").as("avg_cos"), count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(stats.contains(true) && stats.contains(false), s"missing bucket class: $stats")
    assert(stats(true)._1 > stats(false)._1,
      s"no locality: same-bucket avg cos ${stats(true)._1} <= cross-bucket ${stats(false)._1}")
  }

  test("LSH-bucketed kNN: scores agree with the exact kernel, no self-pairs") {
    val ann = AnnQueries.queries("q_ann_knn")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ann.nonEmpty)
    assert(ann.keys.forall { case (a, b) => a != b }, "self-pair leaked")
    // exact rounded cosine for the same pairs, from the oracle-verified
    // brute-force kernel (covers both orientations)
    val exact = graft.functions.CosineKernel
      .pairsAbove(spark, Tables.embeddings(spark, sf0001), -1.0)
      .collect().flatMap(r => Seq(
        (r.getLong(0), r.getLong(1)) -> r.getDouble(2),
        (r.getLong(1), r.getLong(0)) -> r.getDouble(2))).toMap
    ann.foreach { case (pair, c) =>
      assert(exact(pair) == c, s"pair $pair: ann $c vs exact ${exact(pair)}")
    }
  }

  test("LSH kNN: planted near neighbor recalled in top-3 for >= 80% of probes") {
    import spark.implicits._
    val base = Tables.embeddings(spark, sf0001).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val planted = base.map { case (id, v) =>
      (id + 1000000L,
        v.zipWithIndex.map { case (x, i) => x * (1.0 + 0.05 * math.sin(id * 31.0 + i)) })
    }
    val all = (base ++ planted).map { case (id, v) => (id, v.toSeq) }
      .toSeq.toDF("vec_id", "v")
    val knn = graft.queries.AnnQueries.lshKnn(all, 3).collect()
    val byProbe = knn.filter(_.getLong(0) >= 1000000L)
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val hits = base.count { case (id, _) =>
      byProbe.getOrElse(id + 1000000L, Set.empty[Long]).contains(id) }
    assert(hits.toDouble >= 0.8 * base.length, s"recall $hits/${base.length}")
  }

  test("LSH-bucketed kNN is deterministic across runs") {
    def run() = AnnQueries.queries("q_ann_knn")(spark, sf0001).collect().toSeq
    assert(run() == run())
  }

  test("NN-descent: scores agree with the exact kernel, no self-pairs, <= k per vertex") {
    val g = AnnQueries.queries("q_ann_nndescent")(spark, sf0001).collect()
    assert(g.nonEmpty)
    assert(g.forall(r => r.getLong(0) != r.getLong(1)), "self-pair leaked")
    assert(g.groupBy(_.getLong(0)).forall(_._2.length <= 3), "more than k neighbors")
    val exact = graft.functions.CosineKernel
      .pairsAbove(spark, Tables.embeddings(spark, sf0001), -1.0)
      .collect().flatMap(r => Seq(
        (r.getLong(0), r.getLong(1)) -> r.getDouble(2),
        (r.getLong(1), r.getLong(0)) -> r.getDouble(2))).toMap
    g.foreach { r =>
      val pair = (r.getLong(0), r.getLong(1))
      assert(exact(pair) == r.getDouble(2), s"pair $pair: ${r.getDouble(2)} vs ${exact(pair)}")
    }
  }

  test("NN-descent refinement never loses ground: per-vertex best >= LSH-seed best") {
    val e = Tables.embeddings(spark, sf0001)
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      .select("vec_id", "v")
    def bestBy(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(2)).max).toMap
    val seed = bestBy(AnnQueries.lshKnn(e, 3).collect())
    val refined = bestBy(AnnQueries.nnDescent(e, 3, 2).collect())
    seed.foreach { case (src, best) =>
      assert(refined.getOrElse(src, Double.MinValue) >= best,
        s"vertex $src regressed: seed $best, refined ${refined.get(src)}")
    }
    // and the refinement must actually find something better somewhere
    val improved = seed.count { case (src, best) => refined.getOrElse(src, best) > best }
    assert(improved > 0, "two NN-descent rounds improved no vertex at all")
  }

  test("NN-descent: planted near neighbor recalled in top-3 for >= 80% of probes") {
    import spark.implicits._
    val base = Tables.embeddings(spark, sf0001).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val planted = base.map { case (id, v) =>
      (id + 1000000L,
        v.zipWithIndex.map { case (x, i) => x * (1.0 + 0.05 * math.sin(id * 31.0 + i)) })
    }
    val all = (base ++ planted).map { case (id, v) => (id, v.toSeq) }
      .toSeq.toDF("vec_id", "v")
    val knn = AnnQueries.nnDescent(all, 3, 2).collect()
    val byProbe = knn.filter(_.getLong(0) >= 1000000L)
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val hits = base.count { case (id, _) =>
      byProbe.getOrElse(id + 1000000L, Set.empty[Long]).contains(id) }
    assert(hits.toDouble >= 0.8 * base.length, s"recall $hits/${base.length}")
  }

  test("NN-descent is deterministic across runs") {
    def run() = AnnQueries.queries("q_ann_nndescent")(spark, sf0001).collect().toSeq
    assert(run() == run())
  }

  test("brute-force kNN invariants: 5 neighbors per non-terminal vector, no self-pairs") {
    val knn = graft.queries.TextQueries.queries("q_sim_knn")(spark, sf0001).collect()
    assert(knn.forall(r => r.getLong(0) < r.getLong(1)), "pair ordering violated")
    assert(knn.forall(r => math.abs(r.getDouble(2)) <= 1.0001), "cosine out of range")
  }
}
