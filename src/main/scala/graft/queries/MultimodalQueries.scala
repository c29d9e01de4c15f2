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
