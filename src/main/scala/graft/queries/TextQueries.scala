package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.9 — LLM-data-pipeline operators over documents/embeddings:
  * exact dedup, tokenization, text stats, tf-idf, cosine kNN, multimodal
  * join. (Near-dup MinHash/LSH lives in DedupQueries — custom machinery,
  * NO-ORACLE.)
  *
  * Scale notes (100 TB): exact dedup is a hash-groupBy (shuffle on the
  * content hash — embarrassingly scalable); tf-idf is two hash
  * aggregations plus a broadcast of the single-row doc count; the kNN
  * here is the O(n^2) brute-force baseline with norms precomputed before
  * the join (the LSH-bucketed scale path is DedupQueries/AnnQueries).
  * Cosine is computed in DOUBLE on both engines (floats widened first)
  * so the dot product is bit-identical: same products, same left-to-right
  * accumulation order.
  */
object TextQueries extends QueryGroup {

  val queries: Map[String, QFn] = Map(
    // content-hash dedup; representative = min(doc_id) per hash (never
    // dropDuplicates — row-pick order is nondeterministic).
    "q_dedup_exact" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val rep = docs
        .select(sha2(lower(trim(col("text"))), 256).as("h"), col("doc_id"))
        .groupBy("h").agg(min("doc_id").as("doc_id"))
      rep.join(docs, "doc_id")
        .groupBy("lang").agg(count(lit(1)).as("n_survivors"))
        .orderBy("lang")
    }),

    "q_tokenize_top20" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(lower(col("text")), wsRegex)).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(20)),

    "q_text_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          r2(avg(col("n_chars"))).as("avg_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("lang", "source")),

    // tf-idf: score(term) = totalTf(term) * ln(N / df(term)); top 15.
    "q_tfidf_top" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"), explode(split(lower(col("text")), wsRegex)).as("term"))
        .filter(col("term") =!= "")
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val byTerm = tf.groupBy("term").agg(sum("tf").as("ttf"), count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_total"))
      byTerm.crossJoin(broadcast(n))
        .select(col("term"),
          round(col("ttf") * log(col("n_total") / col("df")), 3).as("score"))
        .orderBy(col("score").desc, col("term"))
        .limit(15)
    }),

    // brute-force cosine top-5 per vector over pairs vec_id < v2, ranked
    // on the ROUNDED cosine (3dp) with id2 tiebreak: a 1-ulp Spark-vs-
    // DuckDB dot-product difference can reorder near-tied unrounded
    // neighbors but almost never flips the rounded value. Executed by the
    // broadcast + partition-local kernel (graft.functions.CosineKernel) —
    // bit-identical arithmetic to the declarative theta-join form, zero
    // shuffle instead of an O(n²) pair join.
    "q_sim_knn" -> ((s, d) =>
      graft.functions.CosineKernel.topK(s, Tables.embeddings(s, d), 5)),

    // "multimodal" star join: text metadata x vector label.
    "q_multimodal_join" -> ((s, d) =>
      Tables.documents(s, d)
        .join(Tables.embeddings(s, d), col("doc_id") === col("vec_id"))
        .groupBy("lang", "label")
        .agg(count(lit(1)).as("n"), r2(avg(col("n_chars"))).as("avg_chars"))
        .orderBy("lang", "label")),
  )

  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      ("WITH rep AS (SELECT min(doc_id) AS doc_id FROM " +
        "(SELECT sha256(lower(trim(text))) AS h, doc_id FROM documents) t GROUP BY h) " +
        "SELECT d.lang, count(*) AS n_survivors FROM rep JOIN documents d USING (doc_id) " +
        "GROUP BY d.lang ORDER BY lang"),
    "q_tokenize_top20" ->
      ("SELECT word, count(*) AS n FROM (SELECT unnest(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+')) AS word " +
        "FROM documents) t WHERE word <> '' GROUP BY word ORDER BY n DESC, word LIMIT 20"),
    "q_text_stats" ->
      ("SELECT lang, source, count(*) AS n_docs, floor(avg(n_chars) * 100.0 + 0.5) / 100.0 AS avg_chars, " +
        "min(n_chars) AS min_chars, max(n_chars) AS max_chars " +
        "FROM documents GROUP BY lang, source ORDER BY lang, source"),
    "q_tfidf_top" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+')) AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY doc_id, term), " +
        "byterm AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ttf, count(*) AS df FROM tf GROUP BY term), " +
        "n AS (SELECT count(*) AS n_total FROM documents) " +
        "SELECT term, round(ttf * ln(n_total / df), 3) AS score FROM byterm, n " +
        "ORDER BY score DESC, term LIMIT 15"),
    "q_sim_knn" ->
      ("WITH p AS (SELECT a.vec_id AS id1, b.vec_id AS id2, " +
        "floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 1000.0 + 0.5) / 1000.0 AS cosr " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id), " +
        "r AS (SELECT id1, id2, cosr, row_number() OVER (PARTITION BY id1 ORDER BY cosr DESC, id2) AS rn FROM p) " +
        "SELECT id1 AS vec_id, id2 AS v2, cosr AS cos_sim FROM r WHERE rn <= 5 ORDER BY vec_id, v2"),
    "q_multimodal_join" ->
      ("SELECT lang, label, count(*) AS n, floor(avg(n_chars) * 100.0 + 0.5) / 100.0 AS avg_chars " +
        "FROM documents JOIN embeddings ON doc_id = vec_id GROUP BY lang, label ORDER BY lang, label"),
  )
}
