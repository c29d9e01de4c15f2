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

    // ---- LSH-bucketed kNN search: the actual scale path -----------------
    // 4 independent 8-bit sign-LSH tables; candidates = vectors sharing a
    // bucket in ANY table; exact rounded cosine scored on candidates only;
    // top-3 per vector by (cosr desc, id2). On 100 TB this replaces the
    // O(n²) pair join with O(n · bucket) — candidate generation is one
    // explode + one short-key shuffle. (This corpus is isotropic random —
    // no true near neighbors — so recall@exact is inherently low here;
    // AnnSpec verifies candidate scoring correctness, locality, and
    // determinism instead, and the output is golden-pinned.)
    "q_ann_knn" -> ((s, d) => {
      graft.functions.ArrayCosineSimilarity.register(s)
      val e = Tables.embeddings(s, d).withColumn("v", vecD(col("embedding")))
      val nTables = 4
      val bitsPerTable = 8
      def bkey(tbl: Int): Column =
        (0 until bitsPerTable)
          .map(b => when(dot(col("v"), hp(tbl * bitsPerTable + b)) >= 0.0, 1L << b).otherwise(0L))
          .reduce(_ + _) + lit(tbl.toLong * 65536L)
      val banded = e.select(col("vec_id"), col("v"),
        explode(array((0 until nTables).map(bkey): _*)).as("bkey"))
      // bucket-size cap via a count + semi-join (no collect_list state),
      // then a bucket-keyed self-join scored by the CODEGEN'd cosine —
      // the whole candidate pipeline stays in whole-stage codegen, vs the
      // earlier nested-transform pair expansion whose per-pair HOF dot
      // product ran interpreted. graft_cosine accumulates dot/na/nb
      // left-to-right exactly like CosineKernel, so scores stay
      // bit-identical to the exact path (AnnSpec pins this).
      val okBuckets = banded.groupBy("bkey")
        .agg(count(lit(1)).as("n")).filter(col("n").between(2, 256))
        .select("bkey")
      val m1 = banded.join(okBuckets, "bkey")
        .select(col("bkey"), col("vec_id").as("id1"), col("v").as("v1"))
      val m2 = banded.join(okBuckets, "bkey")
        .select(col("bkey"), col("vec_id").as("id2"), col("v").as("v2"))
      val cand = m1.join(m2, Seq("bkey"))
        .filter(col("id1") =!= col("id2"))
        .select(col("id1").as("vec_id"), col("id2").as("v2"),
          r3(expr("graft_cosine(v1, v2)")).as("cos_sim"))
        .groupBy("vec_id", "v2").agg(first("cos_sim").as("cos_sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("cos_sim").desc, col("v2"))
      cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("vec_id", "v2", "cos_sim")
        .orderBy("vec_id", "v2")
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
