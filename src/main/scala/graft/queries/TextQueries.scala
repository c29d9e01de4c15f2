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

  val queries: Map[String, QFn] = extraQueries ++ Map(
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

    // ---- count-min-sketch heavy hitters with exact confirm ---------------
    // The sketch sibling of q_dedup_bloom: find every token whose
    // frequency exceeds 0.2% of the corpus. A CMS (built distributed —
    // df.stat.countMinSketch is treeAggregate under the hood) is
    // broadcast and prunes the token stream BEFORE the shuffle: CMS never
    // underestimates, so every true heavy hitter survives the prune, and
    // only plausible candidates enter the groupBy. The exact count then
    // removes the sketch's false positives, so the result is exact and
    // oracle-checkable. At 100 TB the groupBy over ALL distinct tokens is
    // the dominant shuffle; the prune cuts it to the candidate set.
    "q_cms_heavy" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(split(lower(col("text")), wsRegex)).as("tok"))
        .filter(col("tok") =!= "")
      val cms = toks.stat.countMinSketch("tok", 0.0001, 0.99, 42)
      // total token count rides along in the sketch — no separate count job
      val thresh = cms.totalCount() / 500L + 1L // frequency > 0.2%
      // native codegen'd probe (round-8): the CMS rides the expression —
      // the prune stays inside the fused token-stream stage, no UDF
      // interpreter boundary
      val mightBeHeavy = org.apache.spark.sql.GraftPlanBridge.column(
        graft.functions.CmsAtLeast(
          org.apache.spark.sql.GraftPlanBridge.expression(col("tok")), cms, thresh))
      toks.filter(mightBeHeavy)
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .filter(col("n") >= thresh)
        .orderBy("tok")
    }),

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

    // BM25 document ranking for a fixed 3-term query — the standard
    // retrieval scorer a corpus-curation pipeline runs for query-based
    // filtering. score(d) = Σ_t idf(t)·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)),
    // idf = ln(1 + (N−df+0.5)/(df+0.5)) (Lucene form), k1=1.2 b=0.75.
    // Cross-engine discipline: every ln/division input is derived from
    // exact integers (so identical bits — ln agreement proven by
    // q_tfidf_top across 3 SFs); the per-term contributions are summed in
    // a FIXED order (c1+c2+c3 after pivoting to columns), never by a
    // groupBy sum whose accumulation order is engine-dependent.
    // Scale: two hash aggregations + one broadcast of 3 term stats.
    "q_bm25_top" -> ((s, d) => {
      val qTerms = Seq("spark", "window", "stream")
      val k1 = 1.2; val b = 0.75
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"),
        explode(split(lower(col("text")), wsRegex)).as("term"))
        .filter(col("term") =!= "")
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val tf = toks.filter(col("term").isin(qTerms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_total"),
        lit(1).as("one")) // join key for the single global row
      val totDl = dl.agg(sum(col("dl")).as("sum_dl"), lit(1).as("one"))
      val global = broadcast(n.join(totDl, "one")
        .select(col("n_total"), (col("sum_dl").cast("double") / col("n_total")).as("avgdl")))
      val contrib = tf.join(dl, "doc_id").crossJoin(global)
        .join(broadcast(df), "term")
        // Lucene's +1 inside the log keeps idf positive even for terms in
        // more than half the corpus (true here — small shared vocabulary)
        .withColumn("idf",
          log(lit(1.0) + (col("n_total") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
        .withColumn("c", col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
      // fixed-order sum: pivot the (at most 3) per-term contributions
      val perDoc = contrib.groupBy("doc_id").agg(
        max(when(col("term") === qTerms(0), col("c"))).as("c0"),
        max(when(col("term") === qTerms(1), col("c"))).as("c1"),
        max(when(col("term") === qTerms(2), col("c"))).as("c2"))
      perDoc.select(col("doc_id"),
        r3(coalesce(col("c0"), lit(0.0)) + coalesce(col("c1"), lit(0.0))
          + coalesce(col("c2"), lit(0.0))).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(10)
    }),

    // brute-force cosine top-5 per vector over pairs vec_id < v2, ranked
    // on the ROUNDED cosine (3dp) with id2 tiebreak: a 1-ulp Spark-vs-
    // DuckDB dot-product difference can reorder near-tied unrounded
    // neighbors but almost never flips the rounded value. Written
    // DECLARATIVELY (cross-join + rounded-cosine >= -1, i.e. every pair,
    // + top-k window); CosineJoinStrategy plans the broadcast kernel
    // (executeBroadcast — no driver-side collect), emits the score as a
    // kernel output column, and prunes the pair rows to (id, id, score)
    // before the window's small shuffle. Plan shape pinned in
    // PlanAuditSpec; bit parity with the oracle proven by the hash-match.
    "q_sim_knn" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      val a = e.select(col("vec_id").as("id1"), col("v").as("va"))
      val b = e.select(col("vec_id").as("id2"), col("v").as("vb"))
      val pairs = a.crossJoin(b)
        .filter(r3(expr("graft_cosine(va, vb)")) >= lit(-1.0) && col("id1") < col("id2"))
        .select(col("id1").as("vec_id"), col("id2").as("v2"),
          r3(expr("graft_cosine(va, vb)")).as("cos_sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("cos_sim").desc, col("v2"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("vec_id", "v2", "cos_sim")
        .orderBy("vec_id", "v2")
    }),

    // "multimodal" star join: text metadata x vector label.
    "q_multimodal_join" -> ((s, d) =>
      Tables.documents(s, d)
        .join(Tables.embeddings(s, d), col("doc_id") === col("vec_id"))
        .groupBy("lang", "label")
        .agg(count(lit(1)).as("n"), r2(avg(col("n_chars"))).as("avg_chars"))
        .orderBy("lang", "label")),
  )

  lazy val extraQueries: Map[String, QFn] = Map(
    // ---- per-document keyword extraction (ORACLE) -----------------------
    // Each doc's keyword = its max-tf-idf token; report the per-lang
    // keyword histogram (top 15). The ranking key is EXACT: tf is an
    // integer count and idf is snapped to a 1e9 nano-grid (floor of the
    // shared ln), so score = tf · idf_nano is a BIGINT — the argmax can
    // never flip on a last-ulp libm divergence, unlike ranking on the
    // raw double product (§7.3). One (doc, tok) aggregate, a broadcast
    // df join, one per-doc window top-1, one k-group count.
    "q_keywords" -> ((s, d) => {
      val toksCol = filter(split(lower(col("text")), wsRegex), t => t =!= "")
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(toksCol).as("tok"))
      val tf = tok.groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("tf"))
      val df = tok.select("doc_id", "tok").distinct()
        .groupBy("tok").agg(count(lit(1)).as("df"))
      val n = Tables.documents(s, d)
        .filter(size(toksCol) > 0).agg(count(lit(1)).as("nd"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
      tf.join(broadcast(df), "tok").crossJoin(broadcast(n))
        .withColumn("idf_nano",
          floor(log(col("nd").cast("double") / col("df").cast("double")) * lit(1000000000.0)).cast("long"))
        .withColumn("score", col("tf") * col("idf_nano"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("lang"), col("tok").as("keyword"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("n_docs").desc, col("lang"), col("keyword")).limit(15)
    }),

    // ---- vocabulary coverage curve (ORACLE) -----------------------------
    // What share of the token mass do the top-10/100/1000 types cover?
    // The tokenizer-budget question asked before every BPE training run.
    // The global token census shuffles once (distributed); the cumulative
    // share is then computed over ONLY the top-1000 rows (distributed
    // TakeOrderedAndProject → a ≤1000-row window — never a corpus-scale
    // single-partition sort). Counts are exact integers; each share is
    // one r3 division of exact sums.
    "q_vocab_coverage" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .select(explode(filter(split(lower(col("text")), wsRegex), t => t =!= "")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
      val total = counts.agg(sum(col("n")).as("total"), count(lit(1)).as("n_types"))
      val top = counts.orderBy(col("n").desc, col("tok")).limit(1000)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("tok")) // ≤1000 rows post-limit — driver-safe
      top
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cum", sum(col("n")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
        .filter(col("rn").isin(10L, 100L, 1000L))
        .crossJoin(broadcast(total))
        .select(col("rn").as("top_k"), col("cum").as("cum_tokens"), col("total").as("total_tokens"),
          col("n_types"), r3(col("cum").cast("double") / col("total").cast("double")).as("coverage"))
        .orderBy("top_k")
    }),
  )

  lazy val extraOracleSql: Map[String, String] = Map(
    "q_keywords" ->
      ("WITH t AS (SELECT doc_id, lang, unnest(list_filter(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+'), x -> x <> '')) AS tok FROM documents), " +
        "tf AS (SELECT doc_id, lang, tok, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2, 3), " +
        "dfr AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM t GROUP BY tok), " +
        "nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM t), " +
        "sc AS (SELECT tf.doc_id, tf.lang, tf.tok, " +
        "tf.tf * CAST(floor(ln(CAST(nd AS DOUBLE) / CAST(df AS DOUBLE)) * 1000000000.0) AS BIGINT) AS score " +
        "FROM tf JOIN dfr ON tf.tok = dfr.tok CROSS JOIN nn), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rn FROM sc) " +
        "SELECT lang, tok AS keyword, count(*) AS n_docs FROM r WHERE rn = 1 " +
        "GROUP BY 1, 2 ORDER BY n_docs DESC, lang, keyword LIMIT 15"),
    "q_vocab_coverage" ->
      ("WITH t AS (SELECT unnest(list_filter(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+'), x -> x <> '')) AS tok FROM documents), " +
        "c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY tok), " +
        "tt AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_types FROM c), " +
        "top AS (SELECT tok, n FROM c ORDER BY n DESC, tok LIMIT 1000), " +
        "r AS (SELECT CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rn, " +
        "CAST(sum(n) OVER (ORDER BY n DESC, tok ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum " +
        "FROM top) " +
        "SELECT rn AS top_k, cum AS cum_tokens, total AS total_tokens, n_types, " +
        "floor((CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS coverage " +
        "FROM r, tt WHERE rn IN (10, 100, 1000) ORDER BY top_k"),
  )

  val oracleSql: Map[String, String] = extraOracleSql ++ Map(
    "q_cms_heavy" ->
      ("WITH e AS (SELECT unnest(list_filter(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+'), x -> x <> '')) AS tok FROM documents), " +
        "t AS (SELECT count(*) // 500 + 1 AS thr FROM e) " +
        "SELECT tok, count(*) AS n FROM e GROUP BY tok " +
        "HAVING count(*) >= (SELECT thr FROM t) ORDER BY tok"),
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
    "q_bm25_top" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+')) AS term FROM documents), " +
        "tk AS (SELECT doc_id, term FROM toks WHERE term <> ''), " +
        "dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM tk WHERE term IN ('spark', 'window', 'stream') GROUP BY doc_id, term), " +
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), " +
        "g AS (SELECT (SELECT count(*) FROM documents) AS n_total, " +
        "(SELECT CAST(sum(dl) AS DOUBLE) FROM dl) / (SELECT count(*) FROM documents) AS avgdl), " +
        "c AS (SELECT tf.doc_id, tf.term, " +
        "ln(1.0 + (g.n_total - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * (1.2 + 1.0)) / " +
        "(tf.tf + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / g.avgdl)) AS c " +
        "FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN g), " +
        "p AS (SELECT doc_id, max(CASE WHEN term = 'spark' THEN c END) AS c0, " +
        "max(CASE WHEN term = 'window' THEN c END) AS c1, " +
        "max(CASE WHEN term = 'stream' THEN c END) AS c2 FROM c GROUP BY doc_id) " +
        "SELECT doc_id, floor((coalesce(c0, 0.0) + coalesce(c1, 0.0) + coalesce(c2, 0.0)) * 1000.0 + 0.5) / 1000.0 AS bm25 " +
        "FROM p ORDER BY bm25 DESC, doc_id LIMIT 10"),
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
