package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** SURVEY §2.12 — multimodal-column plumbing: media as opaque BINARY
  * columns plus typed metadata, the storage pattern a 100 TB multimodal
  * training pipeline uses (media bytes inline or as object-store keys;
  * Spark only moves/filters/fingerprints them, decode happens in a
  * vectorized batch stage — see graft.multimodal.MediaPipeline for the
  * decode plumbing with a stubbed codec).
  *
  * The testdata ships no real media, so the BINARY column is derived
  * (utf-8 bytes of `text`) — the *operators* are the real thing: byte
  * length, content hash, magic-byte sniffing, per-group dedup stats.
  *
  * ORACLE: DuckDB's md5(VARCHAR) hashes the same UTF-8 bytes Spark's
  * md5(binary) sees; octet_length(encode(text)) matches length(binary).
  */
object MultimodalQueries extends QueryGroup {

  val queries: Map[String, QFn] = Map(
    "q_multimodal_bin" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("media", encode(col("text"), "UTF-8"))
        .withColumn("media_meta", struct(
          col("doc_id").as("id"),
          length(col("media")).cast("long").as("n_bytes"),
          md5(col("media")).as("content_md5"),
          // magic-byte sniff (real pipelines: 0x89PNG, 0xFFD8 JPEG, ...).
          // The blob here derives from text, and DuckDB cannot slice a
          // BLOB — so both engines slice the first 3 CHARACTERS and
          // encode, which is byte-identical for any UTF-8 corpus (a raw
          // byte slice would diverge from the oracle on non-ASCII text).
          substring(base64(encode(substring(col("text"), 1, 3), "UTF-8")), 1, 4).as("magic_b64")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_media"),
          sum(col("media_meta.n_bytes")).as("total_bytes"),
          countDistinct(col("media_meta.content_md5")).as("n_distinct"),
          min(col("media_meta.magic_b64")).as("min_magic"))
        .orderBy("source")),

    // runs the ACTUAL MediaPipeline decode path (typed mapPartitions,
    // per-partition codec init, stub codec deriving deterministic
    // dimensions/frame counts from the content digest) in a graded
    // query, then the frame-sampling step a video training pipeline
    // takes: every 8th frame. The oracle reproduces the stub's
    // digest-derived frame count from md5 hex — so the whole decode
    // plumbing, not just the stub, is hash-verified against DuckDB.
    "q_frame_sample" -> ((s, d) => {
      val decoded = graft.multimodal.MediaPipeline.pipeline(Tables.documents(s, d))
      decoded
        .select(col("kind"), col("n_frames"),
          (floor((col("n_frames") - 1) / 8) + 1).cast("long").as("n_sampled"))
        .groupBy("kind")
        .agg(count(lit(1)).as("n_media"),
          sum(col("n_frames")).cast("long").as("total_frames"),
          sum(col("n_sampled")).as("total_sampled"))
        .orderBy("kind")
    }),

    // ---- resize stage (ORACLE) ------------------------------------------
    // decode -> fit-into-64×64 resize, the normalization step between
    // decode and feature extraction. Pixel work is the stub; the
    // DIMENSION arithmetic (w·64 div max(w,h), aspect preserved) is the
    // real thing, pure integer, and hash-verified: the oracle reproduces
    // the stub's digest-derived dimensions from md5 hex and applies the
    // same integer scaling.
    "q_media_resize" -> ((s, d) => {
      val decoded = graft.multimodal.MediaPipeline.pipelineTyped(Tables.documents(s, d))
      graft.multimodal.MediaPipeline.resize(decoded, 64).toDF()
        .groupBy("kind")
        .agg(count(lit(1)).as("n_media"),
          sum(when(col("resized"), 1L).otherwise(0L)).as("n_resized"),
          sum(col("out_w").cast("long")).as("sum_w"),
          sum(col("out_h").cast("long")).as("sum_h"))
        .orderBy("kind")
    }),

    // ---- feature extraction feeding a ranking (ORACLE) ------------------
    // the decode stub's 8-dim feature vector used downstream: top-3 media
    // per kind by integer feature mass. Features are digest-byte/255
    // floats; round(f·255) recovers the exact byte numerators, so the
    // ranking is integer-decided and the oracle rebuilds it from md5 hex.
    "q_media_features" -> ((s, d) => {
      val decoded = graft.multimodal.MediaPipeline.pipeline(Tables.documents(s, d))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("kind").orderBy(col("mass").desc, col("id"))
      decoded
        .withColumn("mass",
          expr("aggregate(transform(feature, f -> CAST(round(f * 255.0) AS BIGINT)), 0L, (a, v) -> a + v)"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("kind"), col("id"), col("mass"))
        .orderBy("kind", "id")
    }),

    // ---- perceptual-hash media near-dup (ORACLE) ------------------------
    // The media face of dedup: an 8-bit aHash over the decoded feature
    // vector (bit i set iff feature i is above the vector's mean —
    // integer cross-multiply 8·bᵢ > Σb, no float threshold), then
    // near-dup candidates at Hamming ≤ 1 via the MULTI-PROBE trick: each
    // asset emits its hash plus all 8 single-bit flips as probe keys,
    // and a plain equi-join on (kind, probe) finds every exact and
    // Hamming-1 pair — 9 keys per asset instead of an O(n²) comparison,
    // the same index-expansion q_dedup_simhash uses at 64 bits. Both
    // orientations of every pair match, so id1 < id2 keeps exactly one.
    // Per-kind census: assets, distinct hashes, exact-hash pairs,
    // Hamming-1 pairs. The oracle brute-forces the pair space
    // declaratively (xor + bit_count) — equality proves the probe
    // expansion finds the identical pair set.
    "q_media_phash" -> ((s, d) => {
      val decoded = graft.multimodal.MediaPipeline.pipeline(Tables.documents(s, d))
      val withHash = decoded
        .withColumn("b", expr("transform(feature, f -> CAST(round(f * 255.0) AS BIGINT))"))
        .withColumn("tot", expr("aggregate(b, 0L, (a, v) -> a + v)"))
        .withColumn("phash", (0 until 8).map(i =>
          when(expr(s"b[$i] * 8 > tot"), lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _))
        .select(col("kind"), col("id"), col("phash"))
      val probes = withHash.select(col("kind"), col("id").as("id1"),
          col("phash").as("h1"),
          explode(array(col("phash") +:
            (0 until 8).map(i => col("phash").bitwiseXOR(lit(1L << i))): _*)).as("probe"))
      val pairs = probes.join(
          withHash.select(col("kind"), col("id").as("id2"),
            col("phash").as("h2"), col("phash").as("probe")),
          Seq("kind", "probe"))
        .filter(col("id1") < col("id2"))
        .withColumn("dist", expr("bit_count(h1 ^ h2)"))
      val pairCensus = pairs.groupBy("kind").agg(
        sum(when(col("dist") === 0, 1L).otherwise(0L)).as("n_exact_pairs"),
        sum(when(col("dist") === 1, 1L).otherwise(0L)).as("n_h1_pairs"))
      withHash.groupBy("kind")
        .agg(count(lit(1)).as("n_media"),
          count_distinct(col("phash")).as("n_hashes"))
        .join(pairCensus, Seq("kind"), "left")
        .select(col("kind"), col("n_media"), col("n_hashes"),
          coalesce(col("n_exact_pairs"), lit(0L)).as("n_exact_pairs"),
          coalesce(col("n_h1_pairs"), lit(0L)).as("n_h1_pairs"))
        .orderBy("kind")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_bin" ->
      ("WITH m AS (SELECT source, octet_length(encode(text)) AS n_bytes, md5(text) AS content_md5, " +
        "substr(to_base64(encode(substr(text, 1, 3))), 1, 4) AS magic_b64 FROM documents) " +
        "SELECT source, count(*) AS n_media, CAST(sum(n_bytes) AS BIGINT) AS total_bytes, " +
        "count(DISTINCT content_md5) AS n_distinct, min(magic_b64) AS min_magic " +
        "FROM m GROUP BY source ORDER BY source"),
    "q_frame_sample" ->
      ("WITH m AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'image' " +
        "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, md5(text) AS hex FROM documents), " +
        "f AS (SELECT kind, CASE WHEN kind = 'video' " +
        "THEN 1 + (CAST(('0x' || substr(hex, 5, 2)) AS INT) & 63) ELSE 1 END AS n_frames FROM m) " +
        "SELECT kind, count(*) AS n_media, CAST(sum(n_frames) AS BIGINT) AS total_frames, " +
        "CAST(sum(CAST(floor((n_frames - 1) / 8) AS BIGINT) + 1) AS BIGINT) AS total_sampled " +
        "FROM f GROUP BY kind ORDER BY kind"),
    "q_media_resize" ->
      ("WITH m AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'image' " +
        "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, md5(text) AS hex FROM documents), " +
        "d AS (SELECT kind, 16 + (CAST(('0x' || substr(hex, 1, 2)) AS INT) & 127) AS w, " +
        "16 + (CAST(('0x' || substr(hex, 3, 2)) AS INT) & 127) AS h FROM m), " +
        "r AS (SELECT kind, w, h, greatest(w, h) AS big FROM d), " +
        "o AS (SELECT kind, CASE WHEN big <= 64 THEN 0 ELSE 1 END AS resized, " +
        "CASE WHEN big <= 64 THEN w ELSE greatest(1, (w * 64) // big) END AS ow, " +
        "CASE WHEN big <= 64 THEN h ELSE greatest(1, (h * 64) // big) END AS oh FROM r) " +
        "SELECT kind, count(*) AS n_media, CAST(sum(resized) AS BIGINT) AS n_resized, " +
        "CAST(sum(ow) AS BIGINT) AS sum_w, CAST(sum(oh) AS BIGINT) AS sum_h " +
        "FROM o GROUP BY kind ORDER BY kind"),
    "q_media_phash" -> {
      val bytes = (0 until 8).map(i =>
        s"CAST(('0x' || substr(hex, ${2 * i + 1}, 2)) AS BIGINT)").mkString("[", ", ", "]")
      val phash = (0 until 8).map(i =>
        s"(CASE WHEN b[${i + 1}]*8 > tot THEN ${1L << i} ELSE 0 END)").mkString(" + ")
      "WITH m AS (SELECT doc_id AS id, CASE WHEN doc_id % 3 = 0 THEN 'image' " +
        "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, md5(text) AS hex FROM documents), " +
        s"bts AS (SELECT id, kind, $bytes AS b FROM m), " +
        "h AS (SELECT id, kind, b, b[1]+b[2]+b[3]+b[4]+b[5]+b[6]+b[7]+b[8] AS tot FROM bts), " +
        s"ph AS (SELECT id, kind, $phash AS phash FROM h), " +
        "pairs AS (SELECT a.kind AS kind, bit_count(xor(a.phash, b.phash)) AS dist FROM ph a JOIN ph b ON a.kind = b.kind AND a.id < b.id), " +
        "pc AS (SELECT kind, CAST(sum(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_pairs, " +
        "CAST(sum(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_h1_pairs FROM pairs GROUP BY kind), " +
        "base AS (SELECT kind, count(*) AS n_media, count(DISTINCT phash) AS n_hashes FROM ph GROUP BY kind) " +
        "SELECT base.kind AS kind, n_media, n_hashes, coalesce(n_exact_pairs, 0) AS n_exact_pairs, " +
        "coalesce(n_h1_pairs, 0) AS n_h1_pairs FROM base LEFT JOIN pc ON base.kind = pc.kind ORDER BY kind"
    },
    "q_media_features" ->
      ("WITH m AS (SELECT doc_id AS id, CASE WHEN doc_id % 3 = 0 THEN 'image' " +
        "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, md5(text) AS hex FROM documents), " +
        "f AS (SELECT kind, id, " +
        (0 until 8).map(k => s"CAST(('0x' || substr(hex, ${2 * k + 1}, 2)) AS BIGINT)").mkString(" + ") +
        " AS mass FROM m), " +
        "r AS (SELECT kind, id, mass, row_number() OVER (PARTITION BY kind ORDER BY mass DESC, id) AS rn FROM f) " +
        "SELECT kind, id, mass FROM r WHERE rn <= 3 ORDER BY kind, id"),
  )
}
