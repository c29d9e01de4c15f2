package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.12 — approximate nearest-neighbor search over the embedding
  * column: the two standard scale paths past brute-force O(n²) cosine
  * (q_sim_knn is the exact baseline).
  *
  *   - q_ann_lsh  random-hyperplane (sign) LSH: 16-bit signatures from
  *                fixed integer hyperplanes; vectors sharing a bucket are
  *                candidates. Output: bucket-size histogram (exact ints).
  *   - q_ann_ivf  IVF-style coarse quantizer: NPART deterministic seed
  *                centroids (lowest vec_ids), every vector assigned to
  *                its nearest centroid by rounded cosine. Output:
  *                per-centroid inventory.
  *
  * Both are NO-ORACLE (sign bits / argmax of floats aren't portably
  * SQL-expressible); AnnSpec property-tests recall against the exact
  * brute-force top-k.
  *
  * Scale design (100 TB): signatures/assignments are row-local projections
  * (one pass, no shuffle); the only shuffle is the final small groupBy.
  * At query time candidates come from one bucket (LSH) or nprobe
  * partitions (IVF) — replacing the O(n²) pair join with O(n·bucket).
  * Centroids are a broadcast (NPART × dim doubles), exactly the pattern
  * a 1000-executor cluster needs.
  */
object AnnQueries extends QueryGroup {

  private val NBITS = 16
  private val NPART = 16
  private val DIM = 64

  /** Deterministic integer hyperplanes (LCG sequence, values in
    * [-2^15, 2^15)) — exactly representable as doubles, identical
    * everywhere, no RNG dependency. */
  private def hp(j: Int): Array[Double] =
    Array.tabulate(DIM) { i =>
      val x = (1103515245L * (j * DIM + i + 1) + 12345L) & 0x7FFFFFFFL
      ((x % 65536L) - 32768L).toDouble
    }

  private def vecD(c: Column): Column = transform(c, x => x.cast("double"))

  private def dot(v: Column, w: Array[Double]): Column =
    aggregate(zip_with(v, array(w.map(lit): _*), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  val queries: Map[String, QFn] = Map(
    // ---- sign-LSH bucketing --------------------------------------------
    "q_ann_lsh" -> ((s, d) => {
      val e = Tables.embeddings(s, d).withColumn("v", vecD(col("embedding")))
      val sig = (0 until NBITS)
        .map(j => when(dot(col("v"), hp(j)) >= 0.0, 1L << j).otherwise(0L))
        .reduce(_ + _)
      e.withColumn("bucket", sig)
        .groupBy("bucket").agg(count(lit(1)).as("bucket_size"))
        .groupBy("bucket_size").agg(count(lit(1)).as("n_buckets"))
        .orderBy("bucket_size")
    }),

    // ---- IVF coarse quantization ---------------------------------------
    "q_ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d).withColumn("v", vecD(col("embedding")))
        .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
      val cents = broadcast(
        e.filter(col("vec_id") < NPART)
          .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn")))
      e.crossJoin(cents)
        .withColumn("cos", r3(
          aggregate(zip_with(col("v"), col("cv"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
            / (col("nrm") * col("cn"))))
        // nearest centroid: max rounded cos, centroid id tiebreak
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
            .orderBy(col("cos").desc, col("cid"))))
        .filter(col("rn") === 1)
        .groupBy("cid").agg(count(lit(1)).as("n_assigned"))
        .orderBy("cid")
    }),
  )

  val oracleSql: Map[String, String] = Map.empty
}
