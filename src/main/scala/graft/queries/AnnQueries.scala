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

  private def vecD(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sign-LSH signature over hyperplanes [firstPlane, firstPlane+nBits)
    * via the codegen'd [[graft.functions.LshSignature]] kernel — one
    * fused loop per vector instead of an interpreted HOF fold per bit
    * (the planes come from the shared [[graft.functions.Hyperplanes]]
    * definition, so the bits are provably the same). */
  private def lshSig(v: Column, firstPlane: Int, nBits: Int): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.LshSignature(
        org.apache.spark.sql.GraftPlanBridge.expression(v), firstPlane, nBits))

  val queries: Map[String, QFn] = Map(
    // ---- sign-LSH bucketing --------------------------------------------
    "q_ann_lsh" -> ((s, d) => {
      val e = Tables.embeddings(s, d).withColumn("v", vecD(col("embedding")))
      e.withColumn("bucket", lshSig(col("v"), 0, NBITS))
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
    // AnnSpec verifies candidate scoring correctness, locality,
    // determinism, AND recall >= 0.8 on a planted-near-neighbor fixture,
    // and the output is golden-pinned.)
    "q_ann_knn" -> ((s, d) => {
      val e = Tables.embeddings(s, d).withColumn("v", vecD(col("embedding")))
      lshKnn(e.select(col("vec_id"), col("v")), 3)
    }),

    // ---- NN-descent graph refinement: the graph-ANN family --------------
    // The HNSW-class recall/latency trade on Spark's terms: instead of a
    // driver-side navigable graph (pointer-chasing, hostile to a BSP
    // engine), run NN-descent (Dong et al., WWW'11): seed a kNN graph
    // from the LSH candidates, then refine by the observation that a
    // neighbor's neighbor is likely a neighbor — each round self-joins
    // the (undirected) graph on the shared vertex, scores the NEW
    // candidate pairs with the exact codegen'd cosine, and keeps the
    // best k per vertex. Every round is two hash joins on ids + one
    // id-keyed shuffle (vectors ride in only for the scoring
    // projection); candidates per round are bounded by n·(2k)², never
    // O(n²). Two rounds recover most of what single-table LSH misses —
    // AnnSpec proves per-vertex monotone improvement over the seed and
    // planted-recall; NO-ORACLE (golden-pinned).
    "q_ann_nndescent" -> ((s, d) => {
      val e = Tables.embeddings(s, d).withColumn("v", vecD(col("embedding")))
      nnDescent(e.select(col("vec_id"), col("v")), k = 3, rounds = 2)
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

  /** 4×8-bit sign-LSH candidate generation over (vec_id, v) rows:
    * vectors sharing a bucket in ANY table are candidates, bucket size
    * capped to [2, 256] via a count + semi-join (no collect_list state —
    * the whole pipeline stays in whole-stage codegen). Emits
    * (bkey, id1, v1, id2, v2) rows with id1 != id2; a pair that shares
    * several buckets appears once per shared bucket (consumers dedup). */
  private def lshCandidates(e: DataFrame): DataFrame = {
    val nTables = 4
    val bitsPerTable = 8
    def bkey(tbl: Int): Column =
      lshSig(col("v"), tbl * bitsPerTable, bitsPerTable) + lit(tbl.toLong * 65536L)
    // MATERIALIZE the banded signatures once: three consumers (bucket
    // census + both join sides) would otherwise each re-run the codegen'd
    // signature kernel over every vector — the same CollapseProject
    // re-inlining trap as the shingle index (§7.3.11).
    // LAZY checkpoint (not eager): plan-only consumers — PlanSweepSpec,
    // explain — stay free; the first real action materializes and every
    // later job reads the cached blocks. At scale this artifact is the
    // LSH index a pipeline persists.
    val banded = e.select(col("vec_id"), col("v"),
      explode(array((0 until nTables).map(bkey): _*)).as("bkey"))
      .localCheckpoint(eager = false)
    // the bucket census is ≤ nTables·2^bits rows — broadcast it so the
    // size-cap prune is map-side on both join branches instead of two
    // extra shuffles of vector-carrying rows
    val okBuckets = banded.groupBy("bkey")
      .agg(count(lit(1)).as("n")).filter(col("n").between(2, 256))
      .select("bkey")
    val m1 = banded.join(broadcast(okBuckets), "bkey")
      .select(col("bkey"), col("vec_id").as("id1"), col("v").as("v1"))
    val m2 = banded.join(broadcast(okBuckets), "bkey")
      .select(col("bkey"), col("vec_id").as("id2"), col("v").as("v2"))
    m1.join(m2, Seq("bkey")).filter(col("id1") =!= col("id2"))
  }

  /** LSH-bucketed top-k neighbors per vector: candidates scored by the
    * CODEGEN'd graft_cosine (dot/na/nb left-to-right, bit-identical to
    * the exact kernel — AnnSpec pins this), rounded to 3dp, top-k by
    * (cosr desc, id2). */
  private[graft] def lshKnn(e: DataFrame, k: Int): DataFrame = {
    val cand = lshCandidates(e)
      .select(col("id1").as("vec_id"), col("id2").as("v2"),
        r3(expr("graft_cosine(v1, v2)")).as("cos_sim"))
      .groupBy("vec_id", "v2").agg(first("cos_sim").as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cos_sim").desc, col("v2"))
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("vec_id", "v2", "cos_sim")
      .orderBy("vec_id", "v2")
  }

  /** EXACT top-k cosine kNN in the blocked all-pairs shape — the form a
    * 1000-executor cluster runs when the answer must be exact (the
    * approximate twins lshKnn/nnDescent are the sub-quadratic paths, but
    * on weakly-clustered embeddings their recall is < 1 — measured at
    * ~75% for nn-descent and ≤0.85 for 16-table multi-probe LSH at 60%
    * candidate density on this corpus — and exact kNN has no
    * sub-quadratic algorithm in general).
    *
    * Shape: 2-D blocking + a per-cell KERNEL. Queries hash to nb
    * row-blocks, data to nb column-blocks; each side replicates
    * nb-fold and lands in its (bq, bd) cell — O(n·nb) rows shuffled,
    * no broadcast of a full side, no driver participation. Inside each
    * cell a mapPartitions kernel scores the |q|·|d| pairs in one tight
    * primitive-array loop and keeps only k rows per query — the
    * justified `mapPartitions` exception: the round-8 declarative form
    * (equi-join on the cell key + WindowGroupLimit prune) was plan-
    * optimal but MATERIALIZED every scored pair as a joined row, and
    * measured 3.6 s at sf0.1 (~1M pairs/s — UnsafeRow array access per
    * pair) where this kernel computes the identical 4M dots in ~0.2 s.
    * Only nb·k rows per query reach the final window merge. nb is
    * sized from ROWS (≥1024 per block, the fixed-overhead floor) and
    * capped at √P (the replication bound) — not blindly √P, which at
    * fixture scale made 36 tiny tasks.
    *
    * Determinism: scores at 3dp (the same floor(x·1000+0.5)/1000
    * rounding as r3, applied to the same fused dot/na/nb accumulation
    * as graft_cosine — GraphEdgesSpec pins edge-set equality against
    * the all-pairs declarative reference), ties broken by ascending
    * neighbor id — a total order, so the result is
    * partitioning-independent and hash-gateable. */
  private[graft] def blockedKnn(e: DataFrame, k: Int): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val cells = s.conf.get("spark.sql.shuffle.partitions").toInt
    // size blocks from PLAN STATISTICS, not a driver count() — the
    // count burned one whole extra job before any real work. rowCount
    // when the optimizer knows it, else sizeInBytes over an avg
    // serialized embedding row (~id + 64 doubles). Misestimation only
    // moves nb inside [1, √cells] — a performance knob, never
    // correctness: the per-cell top-k merge is exact at ANY nb
    // (GraphEdgesSpec pins edge-set equality against the declarative
    // all-pairs reference).
    val (rowCount, sizeInBytes) = org.apache.spark.sql.GraftPlanBridge.planStats(e)
    val n: Long = rowCount.map(_.min(BigInt(Long.MaxValue)).toLong).getOrElse {
      math.max(1L, sizeInBytes.min(BigInt(Long.MaxValue)).toLong / 600L)
    }
    val nbMax = math.max(2, math.ceil(math.sqrt(cells.toDouble)).toInt)
    val nb = math.max(1, math.min(nbMax, math.ceil(n / 1024.0).toInt))
    val blockIds = array((0 until nb).map(lit): _*)
    val withB = e.select(pmod(hash(col("vec_id")), lit(nb)).as("b"),
      col("vec_id"), col("v"))
    val q = withB.select(col("b").as("bq"), explode(blockIds).as("bd"),
      lit(0).as("side"), col("vec_id"), col("v"))
    val dat = withB.select(explode(blockIds).as("bq"), col("b").as("bd"),
      lit(1).as("side"), col("vec_id"), col("v"))
    val parts = q.unionAll(dat)
      .repartition(nb * nb, col("bq"), col("bd"))
      .as[(Int, Int, Int, Long, Array[Double])]
    val scored = parts.mapPartitions { it =>
      // a partition may hold several cells (hash collisions on the
      // cell key) — pairs must never cross cells or they'd duplicate
      val byCell = scala.collection.mutable.LinkedHashMap
        .empty[(Int, Int), (scala.collection.mutable.ArrayBuffer[(Long, Array[Double])],
                            scala.collection.mutable.ArrayBuffer[(Long, Array[Double])])]
      it.foreach { case (bq, bd, side, id, v) =>
        val cell = byCell.getOrElseUpdate((bq, bd),
          (scala.collection.mutable.ArrayBuffer.empty, scala.collection.mutable.ArrayBuffer.empty))
        (if (side == 0) cell._1 else cell._2) += ((id, v))
      }
      def r3k(x: Double): Double = math.floor(x * 1000.0 + 0.5) / 1000.0
      byCell.iterator.flatMap { case (_, (qs, ds)) =>
        val m = ds.length
        val dIds = new Array[Long](m)
        val dVecs = new Array[Array[Double]](m)
        var j = 0
        while (j < m) { dIds(j) = ds(j)._1; dVecs(j) = ds(j)._2; j += 1 }
        qs.iterator.flatMap { case (qid, qv) =>
          // per-query top-k by (rounded cos desc, id asc): k is tiny
          // (3), so a sorted insertion buffer beats a heap
          val bc = new Array[Double](k)
          val bi = new Array[Long](k)
          var used = 0
          var jj = 0
          while (jj < m) {
            val id2 = dIds(jj)
            if (id2 != qid) {
              val dv = dVecs(jj)
              val len = math.min(qv.length, dv.length)
              var dot = 0.0; var na = 0.0; var nbv = 0.0
              var i = 0
              while (i < len) {
                val x = qv(i); val y = dv(i)
                dot += x * y; na += x * x; nbv += y * y
                i += 1
              }
              val c = r3k(dot / (math.sqrt(na) * math.sqrt(nbv)))
              // insert if it beats the current worst
              if (used < k || c > bc(used - 1) || (c == bc(used - 1) && id2 < bi(used - 1))) {
                var pos = if (used < k) used else k - 1
                while (pos > 0 && (c > bc(pos - 1) || (c == bc(pos - 1) && id2 < bi(pos - 1)))) {
                  bc(pos) = bc(pos - 1); bi(pos) = bi(pos - 1); pos -= 1
                }
                bc(pos) = c; bi(pos) = id2
                if (used < k) used += 1
              }
            }
            jj += 1
          }
          (0 until used).map(p => (qid, bi(p), bc(p)))
        }
      }
    }.toDF("id1", "id2", "cos_sim")
    // merge the per-cell winners: nb·k rows per query, same total order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id1").orderBy(col("cos_sim").desc, col("id2"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("id1").as("vec_id"), col("id2").as("nbr_id"), col("cos_sim"))
  }

  /** NN-descent refinement of the LSH-seeded kNN graph over (vec_id, v)
    * rows. Each round: make the graph undirected (reverse neighbors are
    * candidates too — the half NN-descent's convergence depends on),
    * self-join on the shared vertex for neighbor-of-neighbor pairs,
    * dedup BEFORE scoring (a pair reachable through several shared
    * vertices is scored once), score with the exact codegen'd
    * graft_cosine at 3dp, merge with the current edges, keep top-k per
    * vertex by (cos desc, id). The merge key (cos, dst) is total, so
    * the result is deterministic at any partitioning. */
  private[graft] def nnDescent(e: DataFrame, k: Int, rounds: Int): DataFrame = {
    val vecs1 = e.select(col("vec_id").as("src"), col("v").as("sv"))
    val vecs2 = e.select(col("vec_id").as("dst"), col("v").as("dv"))
    def topK(g: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("src").orderBy(col("cos_sim").desc, col("dst"))
      g.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("src", "dst", "cos_sim")
    }
    val seed = lshKnn(e, k)
      .select(col("vec_id").as("src"), col("v2").as("dst"), col("cos_sim"))
    var graph = seed
    for (_ <- 1 to rounds) {
      val undirected = graph.select("src", "dst")
        .unionAll(graph.select(col("dst").as("src"), col("src").as("dst")))
      val cand = undirected.as("g1")
        .join(undirected.as("g2"), col("g1.dst") === col("g2.src"))
        .select(col("g1.src").as("src"), col("g2.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val scored = cand
        .join(vecs1, "src").join(vecs2, "dst")
        .select(col("src"), col("dst"),
          r3(expr("graft_cosine(sv, dv)")).as("cos_sim"))
      graph = topK(graph.unionAll(scored)
        .groupBy("src", "dst").agg(first("cos_sim").as("cos_sim")))
        .localCheckpoint(eager = false)
    }
    graph.select(col("src").as("vec_id"), col("dst").as("nbr_id"), col("cos_sim"))
      .orderBy("vec_id", "nbr_id")
  }

  /** Embedding-cosine near-dup pairs THROUGH the LSH candidate path —
    * the 100 TB shape of q_dedup_embed: O(n·bucket) candidates instead
    * of an O(n²) broadcast loop, then the EXACT rounded-cosine confirm
    * at the caller's threshold. Every emitted pair is therefore a true
    * q_dedup_embed pair with an identical score (precision 1.0 by
    * construction — DedupSpec pins it); recall is the LSH collision
    * probability, property-tested on planted near-duplicates. */
  private[graft] def cosineLshPairs(e: DataFrame, threshold: Double): DataFrame = {
    lshCandidates(e).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), r3(expr("graft_cosine(v1, v2)")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .groupBy("id1", "id2").agg(first("cos_sim").as("cos_sim"))
      .orderBy("id1", "id2")
  }

  val oracleSql: Map[String, String] = Map.empty
}
