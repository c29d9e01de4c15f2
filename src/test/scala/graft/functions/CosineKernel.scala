package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** TEST-ONLY exact reference implementation of brute-force all-pairs
  * cosine (AnnSpec scores the ANN paths against it). The production path
  * is the declarative cross-join + graft_cosine form planned by
  * CosineJoinStrategy (q_sim_knn / q_dedup_embed) — that kernel gets its
  * build side via executeBroadcast with no driver hop; this one collects
  * to the driver, which is fine for a test oracle and nothing else.
  *
  * Bit-parity contract (the DuckDB oracle hash-compares results): the
  * arithmetic reproduces the declarative form EXACTLY —
  *   dot  = left-to-right double accumulation of v1(i)*v2(i)
  *   nrm  = sqrt(left-to-right accumulation of x*x)
  *   cos  = dot / (n1 * n2)
  *   cosr = floor(cos * 1000.0 + 0.5) / 1000.0     (QueryGroup.r3)
  * Each step is one IEEE-754 op in the same order as the HOF/oracle form,
  * so outputs are bit-identical.
  *
  * 100 TB note: this is the "broadcast the small side" pattern — valid
  * while the vector set fits an executor (~10⁷ × 64 dims). Past that, the
  * scale path is LSH/IVF candidate pruning (AnnQueries) in front of this
  * same kernel per bucket.
  */
object CosineKernel {

  private def r3(x: Double): Double = math.floor(x * 1000.0 + 0.5) / 1000.0

  /** (vec_id sorted asc, doubles, norm) for every vector */
  private def gather(s: SparkSession, e: DataFrame): Array[(Long, Array[Double], Double)] =
    e.select(col("vec_id"), col("embedding"))
      .collect()
      .map { r =>
        val v = r.getSeq[Float](1).toArray.map(_.toDouble)
        var acc = 0.0
        var i = 0
        while (i < v.length) { acc += v(i) * v(i); i += 1 }
        (r.getLong(0), v, math.sqrt(acc))
      }
      .sortBy(_._1)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** top-k neighbors per vector over pairs id1 < id2, ranked by
    * (rounded cos desc, id2 asc); returns (vec_id, v2, cos_sim). */
  def topK(s: SparkSession, embeddings: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    val all = gather(s, embeddings)
    val bc = s.sparkContext.broadcast(all)
    val n = all.length
    val par = math.min(s.sparkContext.defaultParallelism, math.max(1, n / 16))
    s.sparkContext.parallelize(all.indices, par)
      .flatMap { i =>
        val vs = bc.value
        val (id1, v1, n1) = vs(i)
        // top-k by (cosr desc, id2 asc): iterate ascending id2, insert-sort
        val top = new ArrayBuffer[(Double, Long)](k + 1)
        var j = i + 1
        while (j < vs.length) {
          val (id2, v2, n2) = vs(j)
          val cosr = r3(dot(v1, v2) / (n1 * n2))
          if (top.size < k || cosr > top.last._1) {
            var pos = top.size
            while (pos > 0 && top(pos - 1)._1 < cosr) pos -= 1
            top.insert(pos, (cosr, id2))
            if (top.size > k) top.remove(k)
          }
          j += 1
        }
        top.map { case (c, id2) => (id1, id2, c) }
      }
      .toDF("vec_id", "v2", "cos_sim")
      .orderBy("vec_id", "v2")
  }

  /** all pairs id1 < id2 with rounded cosine >= threshold */
  def pairsAbove(s: SparkSession, embeddings: DataFrame, threshold: Double): DataFrame = {
    import s.implicits._
    val all = gather(s, embeddings)
    val bc = s.sparkContext.broadcast(all)
    val n = all.length
    val par = math.min(s.sparkContext.defaultParallelism, math.max(1, n / 16))
    s.sparkContext.parallelize(all.indices, par)
      .flatMap { i =>
        val vs = bc.value
        val (id1, v1, n1) = vs(i)
        (i + 1 until vs.length).iterator.flatMap { j =>
          val (id2, v2, n2) = vs(j)
          val cosr = r3(dot(v1, v2) / (n1 * n2))
          if (cosr >= threshold) Some((id1, id2, cosr)) else None
        }
      }
      .toDF("id1", "id2", "cos_sim")
      .orderBy("id1", "id2")
  }
}
