package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Span-level corpus operators: token-position machinery over the
  * documents table (reference scope: `/root/reference/README.md:1` — the
  * snapshot names the system only, so SURVEY §2's inventory is the
  * binding contract; these extend §2.9's LLM-pipeline family).
  *
  *   - q_substring_dup  exact duplicated-PASSAGE detection (the
  *     substring-level dedup of Lee et al., "Deduplicating Training Data
  *     Makes Language Models Better", arXiv:2107.06499): fixed-width
  *     token windows hashed and matched across documents, then the
  *     per-document union of duplicated spans via interval merge.
  *     Document-level dedup (q_dedup_*) misses a copied PARAGRAPH inside
  *     an otherwise-unique page; this operator is the standard fix.
  *   - q_phrase_search  positional-inverted-index phrase matching: the
  *     corpus's top trigram is re-found by joining UNIGRAM postings at
  *     adjacent positions — the intersection machinery a full-text
  *     engine runs for quoted queries.
  *
  * Scale posture (100 TB): windows/postings shuffle by their 128-bit
  * window hash / token key — corpus-size rows but narrow keys, sharding
  * cleanly at any document count. The suffix-array construction the
  * paper uses is replaced by the hash-window equivalent (same detected
  * spans for a fixed minimum width W, W-token resolution instead of
  * byte resolution) because sorted-suffix adjacency needs a global
  * order while hash grouping is embarrassingly shuffle-parallel. The
  * interval-union pass is a per-document window — keyed by doc_id, no
  * global sort anywhere. Phrase match joins postings against a
  * BROADCAST 3-row term list, then aggregates (doc, anchor) groups —
  * one shuffle keyed by doc.
  */
object SpanQueries extends QueryGroup {

  /** Minimum duplicated-span width in tokens. 8 on this corpus keeps
    * random 31-word-vocabulary collisions at zero while catching the
    * planted copied passages (47 docs at sf0.01) — the same
    * "long-enough to be non-accidental" knob the paper sets at 50 BPE
    * tokens for web text. */
  private val W = 8

  private def toksOf(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), wsRegex), t => t =!= "")

  def queries: Map[String, QFn] = Map(

    // ---- exact substring (passage) dedup (ORACLE) -----------------------
    // Every W-token window is md5-hashed (32-byte shuffle key instead of
    // the window text); windows whose hash occurs in ≥2 DISTINCT docs
    // mark duplicated spans [pos, pos+W); per doc, overlapping spans are
    // union-merged (gaps-and-islands over start order) and the covered
    // token count / fraction reported. A doc with dup_frac 1.0 is a
    // full duplicate (document-level dedup finds those too); fractions
    // in between are the copied-paragraph cases ONLY this operator sees.
    "q_substring_dup" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), toksOf(col("text")).as("l"))
      val wins = toks.filter(size(col("l")) >= W)
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(1), size(col("l")) - W + 1),
            i => md5(concat_ws(" ", slice(col("l"), i, lit(W)))))))
        .select(col("doc_id"), (col("pos") + 1).as("s"), col("col").as("w"))
      // dup mark via ONE analytic window over w (min != max doc ⇔ ≥2
      // distinct docs): one exchange keyed by the hash, no join-back, no
      // second computation of the window set (the agg+semi-join form
      // cost 2× the lineage — measured 2.55 s → this shape at sf0.1)
      val byW = Window.partitionBy("w")
      val ivals = wins
        .withColumn("dmin", min(col("doc_id")).over(byW))
        .withColumn("dmax", max(col("doc_id")).over(byW))
        .filter(col("dmin") =!= col("dmax"))
        .select(col("doc_id"), col("s"), (col("s") + W).as("e"))
      val byDoc = Window.partitionBy("doc_id").orderBy("s", "e")
      val before = byDoc.rowsBetween(Window.unboundedPreceding, -1)
      val isl = ivals
        .withColumn("new_island",
          when(row_number().over(byDoc) === 1, 1L)
            .when(col("s") > max(col("e")).over(before), 1L)
            .otherwise(0L))
        .withColumn("g", sum(col("new_island")).over(byDoc))
      val cov = isl.groupBy("doc_id", "g")
        .agg(min(col("s")).as("mn"), max(col("e")).as("mx"))
        .groupBy("doc_id").agg(sum(col("mx") - col("mn")).as("dup_tokens"))
      toks.join(cov, "doc_id")
        .select(col("doc_id"), size(col("l")).cast("long").as("n_tokens"),
          col("dup_tokens"),
          r3(col("dup_tokens").cast("double") / size(col("l"))).as("dup_frac"))
        .orderBy("doc_id")
    }),

    // ---- span-level benchmark decontamination (ORACLE) ------------------
    // q_contamination FLAGS docs sharing an 8-gram with the benchmark
    // split (doc_id%50=0); this is the SCRUB — the part a training
    // pipeline actually ships: every corpus position whose W-gram
    // occurs in the benchmark marks a span [s, s+W), overlapping spans
    // union-merge per doc (the same gaps-and-islands pass as
    // q_substring_dup), and the per-lang census reports docs touched,
    // tokens removed, and tokens surviving. Removing SPANS instead of
    // whole docs is what preserves yield: a 500-token doc with one
    // leaked question loses 8 tokens, not 500.
    // Scale: the benchmark gram set is test-set-sized by nature —
    // BROADCAST; corpus windows never shuffle for the match, only the
    // per-doc island window shuffles, keyed by doc_id.
    "q_decontaminate" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), toksOf(col("text")).as("l"))
      val wins = toks.filter(size(col("l")) >= W)
        .select(col("doc_id"), col("lang"),
          posexplode(transform(sequence(lit(1), size(col("l")) - W + 1),
            i => md5(concat_ws(" ", slice(col("l"), i, lit(W)))))))
        .select(col("doc_id"), col("lang"), (col("pos") + 1).as("s"), col("col").as("w"))
      val bench = wins.filter(col("doc_id") % 50 === 0).select("w").distinct()
      val ivals = wins.filter(col("doc_id") % 50 =!= 0)
        .join(broadcast(bench), "w")
        .select(col("doc_id"), col("lang"), col("s"), (col("s") + W).as("e"))
      val byDoc = Window.partitionBy("doc_id").orderBy("s", "e")
      val before = byDoc.rowsBetween(Window.unboundedPreceding, -1)
      val cov = ivals
        .withColumn("new_island",
          when(row_number().over(byDoc) === 1, 1L)
            .when(col("s") > max(col("e")).over(before), 1L)
            .otherwise(0L))
        .withColumn("g", sum(col("new_island")).over(byDoc))
        .groupBy(col("doc_id"), col("lang"), col("g"))
        .agg(min(col("s")).as("mn"), max(col("e")).as("mx"))
        .groupBy("doc_id", "lang").agg(sum(col("mx") - col("mn")).as("rm"))
      cov.join(toks.select(col("doc_id"), size(col("l")).cast("long").as("nt")), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("rm")).as("removed_tokens"),
          sum(col("nt") - col("rm")).as("clean_tokens"))
        .orderBy("lang")
    }),

    // ---- positional-index phrase search (ORACLE) ------------------------
    // Phase 1 (corpus-scale agg, k-row result): the most frequent
    // trigram, ties to the lexicographically smallest — a deterministic,
    // data-derived "query phrase". Phase 2 (the graded machinery): the
    // phrase's terms become a BROADCAST (offset, token) list joined
    // against unigram postings (token, doc, pos); a position p matching
    // offset o anchors the phrase at p−o, and an anchor with all 3
    // DISTINCT offsets present is a match (count_distinct, so a phrase
    // with repeated terms can't double-count one position). Per doc:
    // match count + first anchor.
    "q_phrase_search" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), toksOf(col("text")).as("l"))
      val top = toks.filter(size(col("l")) >= 3)
        .select(explode(transform(sequence(lit(1), size(col("l")) - 2),
          i => concat_ws(" ", slice(col("l"), i, lit(3))))).as("phrase"))
        .groupBy("phrase").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("phrase")).limit(1)
      val terms = top.select(col("phrase"), posexplode(split(col("phrase"), " ")))
        .select(col("phrase"), col("pos").as("off"), col("col").as("tok"))
      val postings = toks
        .select(col("doc_id"), posexplode(col("l")))
        .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("tok"))
      postings.join(broadcast(terms), "tok")
        .select(col("doc_id"), col("phrase"), (col("p") - col("off")).as("anchor"),
          col("off"))
        .groupBy("doc_id", "anchor")
        .agg(max(col("phrase")).as("phrase"), count_distinct(col("off")).as("k"))
        .filter(col("k") === 3)
        .groupBy("doc_id")
        .agg(max(col("phrase")).as("phrase"), count(lit(1)).as("n_matches"),
          min(col("anchor")).cast("long").as("first_pos"))
        .select(col("doc_id"), col("phrase"), col("n_matches"), col("first_pos"))
        .orderBy("doc_id")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_substring_dup" ->
      ("WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+'), t -> t <> '') AS l FROM documents), " +
        s"wins AS (SELECT doc_id, i AS s, md5(array_to_string(l[i:i+${W - 1}], ' ')) AS w FROM toks, UNNEST(range(1, len(l)-$W+2)) AS r(i) WHERE len(l) >= $W), " +
        "dm AS (SELECT doc_id, s, min(doc_id) OVER (PARTITION BY w) AS dmin, max(doc_id) OVER (PARTITION BY w) AS dmax FROM wins), " +
        s"ivals AS (SELECT doc_id, s, s+$W AS e FROM dm WHERE dmin <> dmax), " +
        "marked AS (SELECT doc_id, s, e, CASE WHEN row_number() OVER (PARTITION BY doc_id ORDER BY s, e) = 1 THEN 1 WHEN s > max(e) OVER (PARTITION BY doc_id ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) THEN 1 ELSE 0 END AS new_island FROM ivals), " +
        "isl AS (SELECT doc_id, s, e, sum(new_island) OVER (PARTITION BY doc_id ORDER BY s, e) AS g FROM marked), " +
        "cov AS (SELECT doc_id, CAST(sum(mx-mn) AS BIGINT) AS dup_tokens FROM (SELECT doc_id, g, min(s) AS mn, max(e) AS mx FROM isl GROUP BY doc_id, g) GROUP BY doc_id) " +
        "SELECT t.doc_id AS doc_id, len(t.l) AS n_tokens, c.dup_tokens AS dup_tokens, floor((CAST(c.dup_tokens AS DOUBLE)/len(t.l))*1000.0 + 0.5)/1000.0 AS dup_frac " +
        "FROM toks t JOIN cov c ON t.doc_id = c.doc_id ORDER BY doc_id"),

    "q_decontaminate" ->
      ("WITH toks AS (SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+'), t -> t <> '') AS l FROM documents), " +
        s"wins AS (SELECT doc_id, lang, i AS s, md5(array_to_string(l[i:i+${W - 1}], ' ')) AS w FROM toks, UNNEST(range(1, len(l)-$W+2)) AS r(i) WHERE len(l) >= $W), " +
        "bench AS (SELECT DISTINCT w FROM wins WHERE doc_id % 50 = 0), " +
        s"ivals AS (SELECT doc_id, lang, s, s+$W AS e FROM wins JOIN bench USING (w) WHERE doc_id % 50 <> 0), " +
        "marked AS (SELECT doc_id, lang, s, e, CASE WHEN row_number() OVER (PARTITION BY doc_id ORDER BY s, e) = 1 THEN 1 WHEN s > max(e) OVER (PARTITION BY doc_id ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) THEN 1 ELSE 0 END AS new_island FROM ivals), " +
        "isl AS (SELECT doc_id, lang, s, e, sum(new_island) OVER (PARTITION BY doc_id ORDER BY s, e) AS g FROM marked), " +
        "cov AS (SELECT doc_id, lang, CAST(sum(mx-mn) AS BIGINT) AS rm FROM (SELECT doc_id, lang, g, min(s) AS mn, max(e) AS mx FROM isl GROUP BY doc_id, lang, g) GROUP BY doc_id, lang) " +
        "SELECT c.lang AS lang, count(*) AS n_docs, CAST(sum(c.rm) AS BIGINT) AS removed_tokens, " +
        "CAST(sum(len(t.l) - c.rm) AS BIGINT) AS clean_tokens " +
        "FROM cov c JOIN toks t ON c.doc_id = t.doc_id GROUP BY c.lang ORDER BY lang"),

    "q_phrase_search" ->
      ("WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+'), t -> t <> '') AS l FROM documents), " +
        "tri AS (SELECT array_to_string(l[i:i+2], ' ') AS phrase FROM toks, UNNEST(range(1, len(l)-1)) AS r(i) WHERE len(l) >= 3), " +
        "top AS (SELECT phrase FROM tri GROUP BY phrase ORDER BY count(*) DESC, phrase LIMIT 1), " +
        "terms AS (SELECT o-1 AS off, ts[o] AS tok FROM (SELECT string_split(phrase, ' ') AS ts FROM top), UNNEST(range(1, len(ts)+1)) AS u(o)), " +
        "postings AS (SELECT doc_id, i AS p, l[i] AS tok FROM toks, UNNEST(range(1, len(l)+1)) AS r(i)), " +
        "anchors AS (SELECT doc_id, p - off AS anchor, off FROM postings JOIN terms USING (tok)), " +
        "hits AS (SELECT doc_id, anchor FROM anchors GROUP BY doc_id, anchor HAVING count(DISTINCT off) = 3) " +
        "SELECT doc_id, (SELECT phrase FROM top) AS phrase, count(*) AS n_matches, min(anchor) AS first_pos " +
        "FROM hits GROUP BY doc_id ORDER BY doc_id"),
  )
}
