package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.12 — text-analysis operators for a training-data pipeline:
  * language ID (stopword/n-gram heuristic), quality scoring, token
  * counting (whitespace + BPE-ish regex), and document fingerprinting.
  *
  * All four are ORACLE queries: every score is built from exact integer
  * counts with at most one final division (single IEEE op — bit-identical
  * across engines), fingerprints are md5 hex strings (identical byte
  * semantics in Spark and DuckDB for UTF-8 text), and every regex sticks
  * to the Java/RE2 common subset.
  *
  * Scale notes (100 TB): each query is scan -> row-local projection ->
  * one hash aggregation; no joins except a broadcast of per-corpus
  * constants. Language ID and quality scoring are pure map-side work.
  */
object TextAnalysisQueries extends QueryGroup {

  // tiny per-language stopword lists (classifier weights). The corpus is
  // synthetic — the point is the *operator*: deterministic argmax scoring.
  private val enStops = Seq("the", "a", "of", "and", "is")
  private val frStops = Seq("le", "la", "et", "des", "une")
  private val deStops = Seq("der", "die", "und", "ein", "nicht")

  private def toks(c: Column): Column =
    filter(split(lower(c), wsRegex), t => t =!= "")

  /** (doc_id, lang, tok) exploded token rows — one tokenizer pass; the
    * array-column + multiple-filter form got the tokenizer re-inlined per
    * consumer expression by CollapseProject (SURVEY §7.3.11). */
  private def tokenRows(s: SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(toks(col("text"))).as("tok"))

  private def hitSum(words: Seq[String]): Column =
    sum(when(col("tok").isin(words.map(lit): _*), 1L).otherwise(0L))

  val queries: Map[String, QFn] = Map(
    // ---- language ID: stopword-hit argmax with deterministic tiebreak ---
    "q_lang_id" -> ((s, d) => {
      val scored = tokenRows(s, d)
        .groupBy("doc_id", "lang")
        .agg(hitSum(enStops).as("s_en"), hitSum(frStops).as("s_fr"), hitSum(deStops).as("s_de"))
      scored.withColumn("pred",
        when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_de"), "en")
          .when(col("s_fr") >= col("s_de"), "fr")
          .otherwise("de"))
        .groupBy("lang", "pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred")
    }),

    // ---- quality scoring: exact ratios, bucketed into deciles ----------
    // signals: stopword ratio and lexical diversity (distinct/total
    // tokens). Each ratio is one BIGINT/BIGINT division; the decile is
    // floor(ratio*10) -> integer histogram (order-free agg). Docs with
    // zero tokens produce no exploded rows = excluded, matching the
    // oracle's len(t) > 0 filter.
    "q_quality_score" -> ((s, d) => {
      val m = tokenRows(s, d)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"), hitSum(enStops).as("n_stop"),
          countDistinct(col("tok")).as("n_uniq"))
      m.select(
        floor(col("n_stop") * lit(10) / col("n_tok")).cast("long").as("stop_decile"),
        floor(col("n_uniq") * lit(10) / col("n_tok")).cast("long").as("diversity_decile"))
        .groupBy("stop_decile", "diversity_decile")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("stop_decile", "diversity_decile")
    }),

    // ---- token counting: whitespace tokens + BPE-ish subword pieces ----
    // BPE-ish = maximal runs of letters / digits / single other symbol —
    // the usual pre-tokenizer shape, as a Java/RE2-common regex.
    "q_token_count" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("ws_tokens", size(toks(col("text"))).cast("long"))
        .withColumn("bpeish", size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r\\f]', 0)")).cast("long"))
        .groupBy("lang")
        .agg(sum(col("ws_tokens")).as("sum_ws_tokens"),
          sum(col("bpeish")).as("sum_bpeish"),
          count(lit(1)).as("n_docs"))
        .orderBy("lang")),

    // ---- deterministic sampling: content-hash threshold -----------------
    // Reproducible ~5% sample: keep docs whose md5 hex < '0d' (13/256 of
    // the space). Pure string comparison on identical md5 hex — portable,
    // seedless, and stable across engines/runs — unlike rand()-based
    // TABLESAMPLE, which can never hash-match an oracle.
    "q_sample_det" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(md5(col("text")) < "0d")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang")),

    // ---- benchmark-contamination detection ------------------------------
    // The decontamination step every training corpus runs before a model
    // sees it: flag training docs sharing any 8-token n-gram with the
    // benchmark/eval set (here: doc_id % 50 == 0 stands in for the
    // benchmark). 8-gram membership is the standard contamination
    // criterion (long enough to not fire on common phrases). Shape at
    // 100 TB: tokens materialized ONCE (localCheckpoint — without it
    // CollapseProject re-inlines the tokenizer per shingle, §7.3.11),
    // shingles exploded row-locally, then ONE broadcast semi-join against
    // the (small) benchmark shingle set — the training side never
    // shuffles on the corpus.
    "q_contamination" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), toks(col("text")).as("t"))
        .localCheckpoint(true)
      val grams = expr(
        "transform(sequence(1, greatest(size(t) - 7, 1)), i -> concat_ws(' ', slice(t, i, 8)))")
      val sh = tok.select(col("doc_id"), col("lang"), explode(grams).as("sh"))
      val bench = sh.filter(col("doc_id") % 50 === 0).select("sh")
      sh.filter(col("doc_id") % 50 =!= 0)
        .join(broadcast(bench), Seq("sh"), "left_semi")
        .select("doc_id", "lang").distinct()
        .groupBy("lang").agg(count(lit(1)).as("n_contaminated"))
        .orderBy("lang")
    }),

    // ---- stratified deterministic sampling ------------------------------
    // Exactly ceil(10%) of EACH stratum: rank docs within each lang by
    // (md5(text), doc_id) and keep the first ceil(n_lang/10) — the
    // balanced-subset pattern curation uses when strata are skewed, where
    // the fixed-rate hash filter (q_sample_det) would under-sample small
    // strata. The quota test is pure integers (10·rn <= n+9 ⟺ rn <=
    // ceil(n/10)); the md5 order is content-deterministic, so engines and
    // re-runs agree. One window shuffle (both window functions share the
    // lang partitioning).
    "q_sample_strat" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("hk"), col("doc_id"))
      val n = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), md5(col("text")).as("hk"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n_lang", count(lit(1)).over(n))
        .filter(col("rn") * lit(10L) <= col("n_lang") + lit(9L))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"), sum(col("doc_id")).as("sum_sampled_ids"))
        .orderBy("lang")
    }),

    // ---- n-gram repetition signal (Gopher-style quality rule) -----------
    // Fraction of duplicated 3-grams per doc — the repetition filter
    // production curation stacks (Gopher, Dolma) apply to catch
    // template/boilerplate text that per-token stats miss. Everything is
    // row-local (tokenize → 3-grams → two sizes) until one k-group
    // aggregate; the bucket is pure integer arithmetic
    // ((dups·10) div n_grams ∈ 0..9), so the histogram is exact in both
    // engines. Docs under 3 tokens count as one whole-text gram.
    "q_repetition" -> ((s, d) => {
      val t = toks(col("text"))
      val n2 = size(t) - 2
      val grams = zip_with(
        zip_with(slice(t, lit(1), n2), slice(t, lit(2), n2), (x, y) => concat(x, lit(" "), y)),
        slice(t, lit(3), n2), (x, y) => concat(x, lit(" "), y))
      Tables.documents(s, d)
        .select(col("lang"),
          when(size(t) >= 3, grams).otherwise(array(concat_ws(" ", t))).as("g"))
        .select(col("lang"), size(col("g")).cast("long").as("n_grams"),
          size(array_distinct(col("g"))).cast("long").as("n_distinct"))
        .withColumn("rep_bucket", expr("((n_grams - n_distinct) * 10) div n_grams"))
        .groupBy("lang", "rep_bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_grams")).as("sum_grams"),
          sum(col("n_distinct")).as("sum_distinct"))
        .orderBy("lang", "rep_bucket")
    }),

    // ---- weighted deterministic sampling (Efraimidis–Spirakis) ----------
    // Weight-proportional sampling without replacement: top-10 per lang
    // by the exponential-clock key -ln(u)/w (A-ES; w = n_chars, so
    // longer docs are proportionally likelier — the importance-sampling
    // pattern curation uses for quality- or length-weighted subsets).
    // u is a content-derived uniform ((48-bit md5 prefix + 1) / 2^48,
    // never 0) — seedless and engine-portable, unlike rand(); ln-bit
    // agreement between JVM and DuckDB libm is already load-bearing for
    // q_tfidf_top/q_bm25_top. Because the key decides SET MEMBERSHIP (not
    // just a displayed value), ranking floors it onto a 1e-9 grid first:
    // a last-ulp libm divergence can then flip the selection only if the
    // key sits within an ulp of a grid boundary, instead of whenever two
    // keys straddle rank 10 — the §7.3 discipline applied to ordering.
    // One window shuffle on lang.
    "q_sample_weighted" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("key"), col("doc_id"))
      val u = (conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long") + lit(1L))
        .cast("double") / lit(281474976710656.0) // 2^48
      Tables.documents(s, d)
        .withColumn("key",
          floor(-log(u) / col("n_chars").cast("double") * lit(1000000000.0)).cast("long"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    }),

    // ---- train/val/test split by hash ranges ----------------------------
    // 80/10/10 assignment from the first two md5 hex chars (0..255):
    // < 204 train, < 230 val, else test. Deterministic per content, so
    // re-runs and engines agree — the reproducible-holdout pattern.
    "q_split_hash" -> ((s, d) => {
      val bucket = conv(substring(md5(col("text")), 1, 2), 16, 10).cast("long")
      Tables.documents(s, d)
        .withColumn("split",
          when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("split")
    }),

    // ---- document fingerprinting: content + bag-of-words md5 -----------
    // content_fp collapses whitespace-normalized text; bag_fp is invariant
    // to token order (sorted distinct tokens) — catches shuffled dups.
    "q_fingerprint" -> ((s, d) => {
      val t = Tables.documents(s, d).withColumn("t", toks(col("text")))
        .withColumn("content_fp", md5(concat_ws(" ", col("t"))))
        .withColumn("bag_fp", md5(concat_ws(" ", array_sort(array_distinct(col("t"))))))
      t.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("content_fp")).as("n_content_fp"),
          countDistinct(col("bag_fp")).as("n_bag_fp"))
        .orderBy("lang")
    }),

    // ---- sliding-token chunking: training-sample preparation ------------
    // Each doc becomes overlapping chunks of 64 tokens with stride 48
    // (16-token overlap) — the standard context-window prep step. The
    // chunk count floor((n-1)/48)+1 and every chunk length are exact
    // integers; the only division is the final avg (ratio of identical
    // bigints, r2 floor). Shape at 100 TB: pure map-side transform+explode
    // (zero shuffle before the k-group aggregate) — chunking never needs
    // to see two documents together.
    "q_chunk_docs" -> ((s, d) => {
      // chunk i covers tokens [i*48+1, i*48+64] ∩ [1, n], so its length
      // is min(64, n − i·48) — closed form from the ONE scalar n, instead
      // of slicing the token array per chunk (which CollapseProject would
      // inline as a full re-tokenize per chunk, §7.3.11)
      val n = size(toks(col("text")))
      val chunkLens = when(n > 0,
        transform(sequence(lit(0), floor((n - 1) / 48).cast("int")),
          i => least(lit(64), n - i * 48).cast("long")))
        .otherwise(array().cast("array<long>"))
      Tables.documents(s, d)
        .select(col("lang"), explode(chunkLens).as("chunk_toks"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("chunk_toks")).as("sum_chunk_toks"),
          r2(sum(col("chunk_toks")).cast("double") / count(lit(1))).as("avg_chunk_toks"))
        .orderBy("lang")
    }),

    // ---- unigram-LM surprisal scoring (ORACLE) ---------------------------
    // The perplexity-filter shape training-data curation actually runs:
    // score each document by its average token surprisal ln(N/ctf)
    // against the corpus' own unigram distribution — high scorers are
    // rare-token outliers (OCR noise, codes, wrong-language fragments),
    // low scorers are boilerplate. Per-token surprisal is snapped to an
    // integer nano-nat grid BEFORE the per-doc weighted sum (order-free
    // BIGINT), the per-doc mean is one integer division, and the ranking
    // key is that integer — a last-ulp ln divergence can't flip the
    // top-15 (§7.3). Shape: one (doc, term) aggregate, a broadcast term
    // table join (vocab ≪ corpus), one per-doc aggregate.
    "q_surprisal" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val ct = tf.groupBy("term").agg(sum("tf").as("ctf"))
      val totals = ct.agg(sum("ctf").as("ntot"))
      val sn = ct.crossJoin(broadcast(totals))
        .withColumn("snano", floor(log(col("ntot").cast("double") / col("ctf").cast("double"))
          * lit(1e9) + lit(0.5)).cast("long"))
        .select("term", "snano")
      tf.join(sn, "term")
        .groupBy("doc_id")
        .agg(sum(col("tf") * col("snano")).as("sum_nano"), sum(col("tf")).as("dl"))
        .withColumn("avg_nano", expr("sum_nano div dl"))
        .select(col("doc_id"), (col("avg_nano").cast("double") / lit(1e9)).as("surprisal"),
          col("dl").as("n_tokens"))
        .orderBy(col("surprisal").desc, col("doc_id"))
        .limit(15)
    }),

    // ---- quality-filter funnel (ORACLE) ----------------------------------
    // The attrition report every curation pipeline publishes: how many
    // documents each quality gate drops, applied IN SEQUENCE (length →
    // stopword ratio → lexical diversity), so stage N's input is stage
    // N−1's survivors. All gates are cross-multiplied integer tests
    // (never a float ratio, §7.3); the whole funnel is ONE pass over the
    // corpus producing conditional counts — three rows out regardless of
    // scale. q_quality_score gives the distributions; this gives the
    // pipeline view of the same signals.
    "q_filter_funnel" -> ((s, d) => {
      val t = toks(col("text"))
      val m = Tables.documents(s, d).select(
        size(t).cast("long").as("n_tok"),
        size(filter(t, x => x.isin(enStops.map(lit): _*))).cast("long").as("n_stop"),
        size(array_distinct(t)).cast("long").as("n_uniq"))
      m.agg(
        count(lit(1)).as("n0"),
        sum(when(col("n_tok") >= 10, 1L).otherwise(0L)).as("n1"),
        sum(when(col("n_tok") >= 10 && col("n_stop") * 20 >= col("n_tok"), 1L)
          .otherwise(0L)).as("n2"),
        sum(when(col("n_tok") >= 10 && col("n_stop") * 20 >= col("n_tok")
          && col("n_uniq") * 2 >= col("n_tok"), 1L).otherwise(0L)).as("n3"))
        .selectExpr("stack(3, '1_length', n0, n1, '2_stopword', n1, n2, " +
          "'3_diversity', n2, n3) as (stage, n_in, n_out)")
        .select(col("stage"), col("n_in"), (col("n_in") - col("n_out")).as("n_dropped"),
          col("n_out"))
        .orderBy("stage")
    }),

    // ---- Heaps-law vocabulary growth (ORACLE) ----------------------------
    // Zipf's sibling: vocabulary size grows ~ (corpus tokens)^β, β < 1.
    // Per doc-id decile (ingestion order): tokens ingested, NEW token
    // types first seen in that decile (min(doc_id) census — the same
    // first-occurrence machinery as q_ngram_novelty but over unigram
    // types), and the cumulative curves a curation dashboard plots. A
    // decile whose new_types stops falling signals a domain shift in the
    // crawl. All exact integers; the two cumulative windows run over 10
    // rows (the decile rollup), not the corpus — the corpus-scale stages
    // are the token census and one hash agg, both term-keyed.
    "q_vocab_growth" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      val mx = Tables.documents(s, d).agg(max(col("doc_id")).as("mx"))
      val dm = Tables.documents(s, d).crossJoin(broadcast(mx))
        .withColumn("decile", expr("doc_id * 10 div (mx + 1)"))
        .groupBy("decile").agg(count(lit(1)).as("n_docs"))
      val tm = tok.crossJoin(broadcast(mx))
        .withColumn("decile", expr("doc_id * 10 div (mx + 1)"))
        .groupBy("decile").agg(count(lit(1)).as("n_tokens"))
      val nt = tok.groupBy("term").agg(min(col("doc_id")).as("first_doc"))
        .crossJoin(broadcast(mx))
        .withColumn("decile", expr("first_doc * 10 div (mx + 1)"))
        .groupBy("decile").agg(count(lit(1)).as("new_types"))
      val wc = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dm.join(tm, Seq("decile"), "left").join(nt, Seq("decile"), "left")
        .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
        .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(wc))
        .withColumn("cum_types", sum(col("new_types")).over(wc))
        .select("decile", "n_docs", "n_tokens", "new_types", "cum_tokens", "cum_types")
        .orderBy("decile")
    }),

    // ---- Zipf-slope corpus health fit (ORACLE) ---------------------------
    // Natural text follows freq ∝ rank^s with s ≈ −1; a corpus whose
    // fitted log-log slope drifts far from −1 is template/synthetic/spam
    // — the corpus-health check next to entropy and repetition. OLS of
    // ln(freq) on ln(rank) over the top-200 tokens: both coordinates are
    // lns OF INTEGERS snapped to the nano grid (identical bits, §7.3);
    // the cross-moments reach ~1e19–1e20 so they multiply AND accumulate
    // in DECIMAL(38) ↔ HUGEINT; one double division + r3 at the end.
    // Scale: the token count is the corpus-scale stage (one hash agg);
    // the global rank window carries a rank<=200 filter, so Spark's
    // window-group-limit bounds the single-reducer input to 200 rows per
    // map partition — not a global sort of the vocabulary.
    "q_tok_zipf" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val tf = Tables.documents(s, d)
        .select(explode(toks(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("freq"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("freq").desc, col("term"))
      val ranked = tf.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 200)
        .withColumn("x", floor(log(col("rank").cast("double")) * lit(1e9) + lit(0.5)).cast("long"))
        .withColumn("y", floor(log(col("freq").cast("double")) * lit(1e9) + lit(0.5)).cast("long"))
      ranked.agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        sum(col("y").cast(dec)).cast("double").as("sy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).cast("double").as("sxy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).cast("double").as("sxx"))
        .withColumn("zipf_slope", r3((col("n") * col("sxy") - col("sx") * col("sy"))
          / (col("n") * col("sxx") - col("sx") * col("sx"))))
        .select(col("n").cast("long").as("n_tokens"), col("zipf_slope"))
    }),

    // ---- first BPE merge candidates (ORACLE) -----------------------------
    // The first iteration of byte-pair-encoding training: count adjacent
    // character pairs across the corpus, weighted by word frequency —
    // the top pair is the first merge a BPE tokenizer would learn. The
    // heavy lifting happens on the DISTINCT word census (types, not the
    // full token stream), so the char-pair explode touches each distinct
    // word once no matter how often it occurs; counts are exact integers
    // and the top-20 plans as TakeOrderedAndProject.
    "q_bpe_merge" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .select(explode(toks(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
      words
        .select(col("n"), explode(expr(
          "CASE WHEN char_length(w) < 2 THEN array() " +
            "ELSE transform(sequence(1, char_length(w) - 1), i -> substr(w, i, 2)) END")).as("pair"))
        .groupBy("pair").agg(sum(col("n")).as("n_occurrences"))
        .orderBy(col("n_occurrences").desc, col("pair"))
        .limit(20)
    }),

    // ---- data-mixture sampling weights (ORACLE) --------------------------
    // The mixture-planning step before a training run: per-source token
    // masses and temperature-smoothed (α = 0.5) sampling weights, plus
    // each source's token allocation out of a budget of half the corpus.
    // sqrt of an exact integer is a single-op double (identical bits),
    // snapped to a micro-grid (1e6 — the product w·budget must clear int64;
    // a petascale run lifts this into DECIMAL(38)) BEFORE normalizing so
    // the shares and the integer allocation are engine-independent. ONE
    // corpus pass + a k-row rollup.
    "q_mix_weights" -> ((s, d) => {
      val src = Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(size(toks(col("text")))).as("n_tokens"))
        .withColumn("w_micro", floor(sqrt(col("n_tokens").cast("double")) * lit(1e6) + lit(0.5)).cast("long"))
      val tot = src.agg(sum(col("w_micro")).as("w_sum"), sum(col("n_tokens")).as("tok_sum"))
      src.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          r3(col("w_micro").cast("double") / col("w_sum").cast("double")).as("mix_share"),
          expr("(w_micro * (tok_sum div 2)) div w_sum").as("alloc_tokens"))
        .orderBy("source")
    }),

    // ---- sequence-packing efficiency (ORACLE) ----------------------------
    // The context-length planning table: for candidate window sizes
    // 512/2048/8192, how many training sequences the corpus yields
    // one-doc-per-sequence (each doc padded up to a window multiple),
    // how many tokens that padding burns, and the perfect-packing lower
    // bound ceil(total/ctx) — the gap is what a packing/concat stage
    // would recover. All ceil math is integer ((n + ctx - 1) div ctx);
    // the waste share is the single r3 division. ONE corpus pass: doc
    // lengths explode over the 3 candidate windows row-locally, then a
    // 3-group rollup.
    "q_pack_efficiency" -> ((s, d) => {
      val lens = Tables.documents(s, d).select(size(toks(col("text"))).cast("long").as("n"))
      lens.select(col("n"), explode(array(lit(512L), lit(2048L), lit(8192L))).as("ctx"))
        .groupBy("ctx")
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"),
          sum(expr("(n + ctx - 1) div ctx")).as("n_seqs_padded"),
          sum(expr("((n + ctx - 1) div ctx) * ctx - n")).as("pad_tokens"))
        .select(col("ctx"), col("n_docs"), col("n_tokens"), col("n_seqs_padded"), col("pad_tokens"),
          r3(col("pad_tokens").cast("double") / (col("n_seqs_padded") * col("ctx")).cast("double")).as("waste_share"),
          expr("(n_tokens + ctx - 1) div ctx").as("n_seqs_packed"))
        .orderBy("ctx")
    }),

    // ---- sequence-packing assignment report (ORACLE) ---------------------
    // The packing stage itself (q_pack_efficiency is the planning table):
    // concat-and-chunk each SOURCE's docs in doc_id order into ctx=2048
    // windows and report, per source, the sequence count, the docs split
    // across a window boundary, and the packed fill ratio. Packing
    // per-source shard is the real 100 TB design — the running-sum window
    // partitions by source (parallel, no global single-partition window),
    // and a production writer would emit (seq_id = cum div ctx, offset =
    // before mod ctx) per doc from exactly this frame. All integers: the
    // boundary-cross test compares `div` buckets of before vs cum-1
    // (guarded to n>0 so the -1 edge never feeds the div), fill is the
    // single r3 division.
    "q_pack_assign" -> ((s, d) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), size(toks(col("text"))).cast("long").as("n"))
        .withColumn("cum", sum(col("n")).over(w))
        .withColumn("split_doc",
          when(col("n") > 0 &&
            expr("(cum - n) div 2048") =!= expr("(cum - 1) div 2048"), 1L).otherwise(0L))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"),
          sum(col("split_doc")).as("n_split_docs"))
        .withColumn("n_seqs", expr("(n_tokens + 2047) div 2048"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("n_seqs"),
          col("n_split_docs"),
          r3(col("n_tokens").cast("double") / (col("n_seqs") * lit(2048L)).cast("double")).as("fill"))
        .orderBy("source")
    }),

    // ---- character-class corpus profile (ORACLE) -------------------------
    // Byte/char-level composition per language — the encoding sanity
    // check before tokenizer training: letters, digits, whitespace and
    // "other" counted exactly by length-difference after class deletion
    // (regexp_replace with explicit classes identical in Java and RE2).
    // Pure map-side arithmetic, one k-group rollup.
    "q_char_classes" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          length(col("text")).cast("long").as("total"),
          (length(col("text")) - length(regexp_replace(col("text"), "[a-z]", ""))).cast("long").as("letters"),
          (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))).cast("long").as("digits"),
          (length(col("text")) - length(regexp_replace(col("text"), "[ \\t\\n\\r\\f]", ""))).cast("long").as("spaces"))
        .groupBy("lang")
        .agg(sum(col("total")).as("n_chars"), sum(col("letters")).as("n_letters"),
          sum(col("digits")).as("n_digits"), sum(col("spaces")).as("n_spaces"),
          sum(col("total") - col("letters") - col("digits") - col("spaces")).as("n_other"))
        .orderBy("lang")),

    // ---- bigram conditional-probability LM head (ORACLE) -----------------
    // The top of the bigram language model a perplexity filter would use:
    // the 20 most frequent bigrams with P(w2|w1) = c(w1w2) / c(w1·),
    // where c(w1·) counts bigrams starting with w1 — both exact integer
    // counts from one bigram pass, so the probability is a single r3
    // division. Bigrams come from zip_with over adjacent slices (row-
    // local, no UDF); the prefix-count join keys on w1 — the SAME key the
    // bigram shuffle already used, so no extra repartitioning at scale.
    // Top-20 by (count desc, w1, w2) plans as TakeOrderedAndProject.
    "q_bigram_lm" -> ((s, d) => {
      val bi = Tables.documents(s, d)
        .withColumn("tk", toks(col("text")))
        .select(explode(expr(
          "zip_with(slice(tk, 1, greatest(size(tk) - 1, 0)), " +
            "slice(tk, 2, greatest(size(tk) - 1, 0)), " +
            "(a, b) -> struct(a AS w1, b AS w2))")).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n_bigram"))
      val c1 = bi.groupBy("w1").agg(count(lit(1)).as("n_prefix"))
      c2.join(c1, "w1")
        .select(col("w1"), col("w2"), col("n_bigram"), col("n_prefix"),
          r3(col("n_bigram").cast("double") / col("n_prefix").cast("double")).as("p_cond"))
        .orderBy(col("n_bigram").desc, col("w1"), col("w2"))
        .limit(20)
    }),

    // ---- cross-language vocabulary overlap (ORACLE) ----------------------
    // How much vocabulary do the corpus languages share? Jaccard between
    // per-language vocabularies — the signal that flags mislabeled or
    // code-mixed slices before language-filtered training runs. The
    // distinct (lang, tok) table self-joins on token: each token's bucket
    // is at most n_langs² pairs (k² ≈ 25), so the join is flat at any
    // corpus size; vocabulary sizes are a k-row broadcast. Counts exact,
    // Jaccard = one r3 division of exact integers.
    "q_lang_overlap" -> ((s, d) => {
      val vocab = Tables.documents(s, d)
        .select(col("lang"), explode(toks(col("text"))).as("tok")).distinct()
      val sizes = vocab.groupBy("lang").agg(count(lit(1)).as("v"))
      val va = vocab.select(col("tok"), col("lang").as("l1"))
      val vb = vocab.select(col("tok"), col("lang").as("l2"))
      va.join(vb, "tok").filter(col("l1") < col("l2"))
        .groupBy("l1", "l2").agg(count(lit(1)).as("n_shared"))
        .join(broadcast(sizes.select(col("lang").as("l1"), col("v").as("v1"))), "l1")
        .join(broadcast(sizes.select(col("lang").as("l2"), col("v").as("v2"))), "l2")
        .select(col("l1"), col("l2"), col("v1"), col("v2"), col("n_shared"),
          r3(col("n_shared").cast("double")
            / (col("v1") + col("v2") - col("n_shared")).cast("double")).as("jaccard"))
        .orderBy("l1", "l2")
    }),

    // ---- chi-square token–source association (ORACLE) --------------------
    // The feature-selection statistic behind quality classifiers: which
    // tokens are most UNEVENLY distributed across sources? χ² over the
    // term×source contingency grid, E = n_t·m_s/M. Zero cells matter
    // ((0−E)²/E = E), so the full grid is rebuilt: term totals × the
    // k-row broadcast source totals, left-joined back to the census on
    // the SAME term-keyed partitioning (no extra shuffle family). Exact
    // across engines: each cell contributes floor((M·c − n_t·m_s)²·1e6 /
    // (M·n_t·m_s)) — an integer micro-χ² in DECIMAL(38) ↔ HUGEINT
    // (integral div truncates identically for non-negative operands) —
    // and the per-term sum of integers is order-free. Top-20 is
    // take-ordered on the integer, tie-broken by term.
    "q_chi2_tokens" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val tok = Tables.documents(s, d)
        .select(col("source"), explode(toks(col("text"))).as("term"))
      val census = tok.groupBy("term", "source").agg(count(lit(1)).as("c"))
      val nt = census.groupBy("term").agg(sum(col("c")).as("n_t"))
      val ms = census.groupBy("source").agg(sum(col("c")).as("m_s"))
      val tot = census.agg(sum(col("c")).as("mm"))
      nt.crossJoin(broadcast(ms)).crossJoin(broadcast(tot))
        .join(census, Seq("term", "source"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
        .withColumn("numer",
          col("mm").cast(dec) * col("c") - col("n_t").cast(dec) * col("m_s"))
        .withColumn("contrib", expr("CAST(numer * numer * 1000000 AS DECIMAL(38,0)) " +
          "div CAST(CAST(mm AS DECIMAL(38,0)) * n_t * m_s AS DECIMAL(38,0))"))
        .groupBy("term", "n_t")
        .agg(sum(col("contrib")).as("chi2_micro"))
        .orderBy(col("chi2_micro").desc, col("term"))
        .limit(20)
        .select(col("term"), col("n_t"),
          (col("chi2_micro").cast("double") / lit(1000000.0)).as("chi2"))
    }),

    // ---- epoch×shard training-loader assignment (ORACLE) -----------------
    // The data-loader contract for multi-epoch training: each document
    // lands on a shard per epoch via a CONTENT-SEEDED portable hash
    // (md5(doc_id:epoch) — q_split_hash's engine-portable bucket trick),
    // so every worker can recompute its shard list without coordination
    // and reshuffling between epochs is deterministic. The report a
    // loader-health dashboard shows: per (epoch, shard) doc/char mass
    // and the balance factor n·shards/total (1.0 = perfectly even).
    // Map-side 3× epoch fan-out + one (epoch, shard)-keyed aggregate;
    // the per-epoch totals are a k-row broadcast.
    "q_epoch_shards" -> ((s, d) => {
      val g = Tables.documents(s, d)
        .withColumn("epoch", explode(array(lit(0L), lit(1L), lit(2L))))
        .withColumn("shard", pmod(conv(substring(md5(
            concat(col("doc_id").cast("string"), lit(":"), col("epoch").cast("string"))),
          1, 4), 16, 10).cast("long"), lit(8L)))
        .groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      val t = g.groupBy("epoch").agg(sum(col("n_docs")).as("tot"))
      g.join(broadcast(t), "epoch")
        .withColumn("balance",
          r3((col("n_docs") * lit(8L)).cast("double") / col("tot").cast("double")))
        .select("epoch", "shard", "n_docs", "sum_chars", "balance")
        .orderBy("epoch", "shard")
    }),
    // ---- PII detection + redaction accounting (ORACLE) ------------------
    // The scrub step every training-data pipeline runs before release.
    // The synthetic corpus carries no organic PII, so each doc is
    // deterministically AUGMENTED with a contact line derived from its
    // own doc_id (both engines construct the identical string — the
    // regexes then have real work to do): detect emails + phone numbers,
    // count them, and account for the size delta after replacing them
    // with redaction tags. Row-local regex work over one projection —
    // embarrassingly parallel at any scale; the per-source rollup is the
    // only (tiny) shuffle.
    "q_pii_redact" -> ((s, d) => {
      val emailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
      val phoneRe = "\\+1-555-[0-9]{4}"
      Tables.documents(s, d)
        .withColumn("txt", concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com or +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
        .withColumn("n_email", size(regexp_extract_all(col("txt"), lit(emailRe), lit(0))).cast("long"))
        .withColumn("n_phone", size(regexp_extract_all(col("txt"), lit(phoneRe), lit(0))).cast("long"))
        .withColumn("red", regexp_replace(regexp_replace(col("txt"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_email")).as("emails"),
          sum(col("n_phone")).as("phones"),
          sum(length(col("txt")) - length(col("red"))).cast("long").as("chars_redacted"))
        .orderBy("source")
    }),

    // ---- regex vocabulary extraction (ORACLE) ---------------------------
    // regexp_extract_all as a Generate-adjacent primitive: pull every
    // long token (6+ letters) out of each doc, explode, and census per
    // language — the match-domain census a regex-driven filter rule is
    // tuned against. The pattern uses only constructs with identical
    // semantics in Java regex (Spark) and RE2 (DuckDB).
    "q_regex_extract" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"), explode(regexp_extract_all(col("text"), lit("[a-z]{6,}"), lit(0))).as("w"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_matches"), countDistinct(col("w")).as("n_distinct"),
          min(col("w")).as("first_alpha"), max(col("w")).as("last_alpha"))
        .orderBy("lang")
    }),

    // ---- per-source dataset card (ORACLE) -------------------------------
    // The one-page "datasheet" a curation team publishes with a corpus:
    // per source, volume (docs/chars/tokens), language spread, and the
    // short-doc share that drives filter tuning. Pure aggregation over
    // one pass of the corpus (token counts via the shared ws-split, no
    // index needed) — report-scale output, corpus-scale input.
    "q_dataset_card" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("ntok", size(filter(split(lower(col("text")), wsRegex), t => t =!= "")).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("ntok")).as("total_tokens"),
          r2(sum(col("ntok")).cast("double") / count(lit(1))).as("avg_tokens"),
          r3(sum(when(col("ntok") < 20, 1L).otherwise(0L)).cast("double") / count(lit(1))).as("short_share"))
        .orderBy("source")
    }),
    // ---- case-insensitive collation grouping (ORACLE) -------------------
    // Spark 4 collations: grouping under UTF8_LCASE folds case at the
    // COMPARISON level (no projection rewrite) — the engine-native way
    // to normalize user-generated text keys. The mixed-case key is
    // synthesized deterministically (doc_id parity picks upper/lower),
    // and the oracle folds with lower() — equality proves the collation
    // compares exactly like explicit case-folding.
    "q_collation_group" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("k", when(col("doc_id") % 2 === 0, upper(col("source")))
          .otherwise(col("source")))
        .withColumn("kc", expr("collate(k, 'UTF8_LCASE')"))
        .groupBy("kc")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .select(lower(col("kc")).as("source_ci"), col("n_docs"), col("chars"))
        .orderBy("source_ci")
    }),

    // ---- full BPE tokenization (native expression) (NO-ORACLE) ----------
    // Completes q_bpe_merge's single pair-count round into the real
    // tokenizer loop (Sennrich et al., arXiv:1508.07909): LEARN 32
    // merges on the distinct-word census (vocabulary-bounded — 31 rows
    // here, ≤10⁶ on web corpora; production learns on a sample/census,
    // never the raw corpus), then APPLY the learned ranks corpus-wide
    // through the codegen'd graft_bpe expression — greedy lowest-rank
    // merging per word, the exact inference rule BPE vocabularies ship
    // with. The apply pass is the 100 TB part: pure map-side, one
    // expression in the scan projection, merge table riding the
    // expression (a broadcast in spirit). Per-source report: token
    // masses before/after + compression. Tie-breaks (count desc, pair
    // asc; rank asc, leftmost) make tokenization bit-reproducible —
    // golden-pinned; BpeSpec proves the detokenization identity and
    // agreement with an independent reference implementation.
    "q_bpe_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // Learn on the top-K-by-count word census, never the full distinct
      // set: on web corpora the distinct-word tail (typos, URLs) is 10⁸⁺
      // and would OOM the driver, while merge learning is insensitive to
      // it — the pair counts that decide merges are count-weighted, so
      // the singleton tail contributes noise-floor mass. K = 2¹⁷ rows
      // ≈ MBs collected, via TakeOrderedAndProject (bounded on every
      // executor AND the driver); (n desc, w asc) makes the boundary
      // deterministic. The sf census (31 words) is far inside K, so the
      // golden pin is unchanged.
      val censusK = 1 << 17
      val census = docs.select(explode(toks(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w")).limit(censusK)
        .collect().map(r => r.getString(0) -> r.getLong(1))
        .sortBy(_._1).toSeq
      val merges = graft.functions.Bpe.learn(census, 32)
      val bpe = org.apache.spark.sql.GraftPlanBridge.column(
        graft.functions.BpeEncode(
          org.apache.spark.sql.GraftPlanBridge.expression(lower(col("text"))),
          merges))
      docs
        .select(col("source"),
          size(toks(col("text"))).cast("long").as("n_words"),
          length(regexp_replace(lower(col("text")), wsRegex, "")).cast("long").as("n_chars"),
          size(bpe).cast("long").as("n_bpe"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("words"),
          sum(col("n_chars")).as("chars"), sum(col("n_bpe")).as("bpe_tokens"),
          r3(sum(col("n_bpe")).cast("double") / sum(col("n_chars")))
            .as("tokens_per_char"))
        .orderBy("source")
    }),

    // ---- classifier-grade quality gate (ORACLE) -------------------------
    // The fastText-shaped quality classifier every production curation
    // stack runs after the heuristic gates: LEARN a bounded model small
    // (top-V vocabulary by document frequency — a TakeOrderedAndProject,
    // never an unbounded collect; V rows of driver memory), then APPLY
    // it corpus-wide as ONE map-side codegen'd expression
    // (graft_linear_score — the model rides the expression, BpeEncode's
    // pattern), so the apply pass is join-free and shuffle-free: scan →
    // score → one k-row census. Coefficients are the deterministic
    // md5-hash stub (MediaPipeline's codec-stub discipline — the
    // sandbox has no trained model; the learning/application PLUMBING
    // is the real, graded shape) and the oracle replays both phases,
    // so the hash gate grades vocabulary selection, OOV handling and
    // integer scoring end-to-end.
    "q_quality_classifier" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val V = 1024
      val vocab = docs
        .select(col("doc_id"), explode(array_distinct(toks(col("text")))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("w")).limit(V)
        .select("w").collect().map(_.getString(0))
      // stub coefficients in [0, 2000] milli — md5-derived so both
      // engines (and any partitioning) agree bit-for-bit
      val weights: Map[String, Long] = vocab.map { w =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8")).take(3).map("%02x".format(_)).mkString
        w -> (java.lang.Long.parseLong(hex, 16) % 2001)
      }.toMap
      val scoreCol = org.apache.spark.sql.GraftPlanBridge.column(
        graft.functions.LinearTextScore(
          org.apache.spark.sql.GraftPlanBridge.expression(lower(col("text"))), weights))
      docs
        .select(col("source"), scoreCol.as("score_milli"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score_milli") >= 1000000L, 1L).otherwise(0L)).as("n_pass"),
          expr("sum(score_milli) div count(1)").as("avg_score_milli"))
        .withColumn("pass_rate", r3(col("n_pass").cast("double") / col("n_docs")))
        .orderBy("source")
    }),

    // ---- end-to-end curation pipeline (ORACLE) --------------------------
    // The composite a real training-data run executes as ONE job — each
    // stage is an already-graded operator, composed: (1) quality gate
    // (length ≥ 10 tokens AND type/token diversity ≥ ½ — integer
    // cross-multiplied, q_filter_funnel's rules); (2) exact dedup
    // (min doc_id survives per md5 digest — the deterministic survivor
    // rule, q_dedup_exact's); (3) reproducible 80/10/10 split on the
    // content hash (q_split_hash's buckets); (4) per-split doc/token/
    // char census. One corpus pass + one digest-keyed dedup shuffle +
    // a k-row census — the whole pipeline is two shuffles at any
    // scale, and the oracle replays all four stages declaratively, so
    // the hash gate grades the COMPOSITION (stage ordering, survivor
    // determinism, gate-before-dedup semantics), not just the parts.
    "q_curation_pipeline" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("digest").orderBy("doc_id")
      Tables.documents(s, d)
        .withColumn("t", toks(col("text")))
        .withColumn("n_tok", size(col("t")).cast("long"))
        .withColumn("n_uniq", size(array_distinct(col("t"))).cast("long"))
        .filter(col("n_tok") >= 10 && col("n_uniq") * 2 >= col("n_tok"))
        .withColumn("digest", md5(col("text")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .withColumn("bucket",
          conv(substring(col("digest"), 1, 2), 16, 10).cast("long"))
        .withColumn("split",
          when(col("bucket") < 204, "train")
            .when(col("bucket") < 230, "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars"))
        .orderBy("split")
    }),

    // ---- Jaro-Winkler fuzzy vocabulary match (native expression) --------
    // (ORACLE) Record-linkage for short strings: a deterministic typo
    // generator (2nd/3rd chars of each doc's first token swapped —
    // first char preserved, as real fat-finger typos mostly do) makes a
    // dirty lookup column, and each DISTINCT dirty value is linked back
    // to the vocabulary by best graft_jaro score. Scale shape: the
    // corpus pass is ONE census hash-agg (score distinct values, never
    // rows — 10⁹ rows with 10⁵ distinct keys score 10⁵ pairs);
    // candidates come from an EQUI-join on the first-character blocking
    // key (the standard linkage blocking trade, stated — no
    // nested-loop anywhere), scored by the codegen'd kernel, best via
    // (r3 score desc, word asc). DuckDB's jaro_winkler_similarity
    // implements the identical Winkler spec (0.7 boost threshold,
    // p=0.1, prefix≤4; JaroWinklerSpec pins pairwise equality), so the
    // oracle replays the whole pipeline.
    "q_fuzzy_match" -> ((s, d) => {
      graft.functions.JaroWinkler.register(s)
      val docs = Tables.documents(s, d)
      val vocab = docs.select(explode(toks(col("text"))).as("w")).distinct()
        .withColumn("blk", substring(col("w"), 1, 1))
      val census = docs
        // guard the zero-token document: the oracle filters len >= 1,
        // and ANSI-mode element_at on an empty array would throw
        .select(toks(col("text")).as("t"))
        .filter(size(col("t")) >= 1)
        .select(element_at(col("t"), 1).as("w0"))
        .select(when(length(col("w0")) >= 4,
          concat(substring(col("w0"), 1, 1), substring(col("w0"), 3, 1),
            substring(col("w0"), 2, 1), expr("substring(w0, 4)")))
          .otherwise(col("w0")).as("dirty"))
        .groupBy("dirty").agg(count(lit(1)).as("n_docs"))
        .withColumn("blk", substring(col("dirty"), 1, 1))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("dirty").orderBy(col("score").desc, col("w"))
      census.join(broadcast(vocab), "blk")
        .withColumn("score", r3(expr("graft_jaro(dirty, w)")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("dirty"), col("w").as("matched"), col("score"), col("n_docs"))
        .orderBy("dirty")
    }),

    // ---- Unicode NFC normalization (native expression) (ORACLE) ---------
    // The canonical-composition pass exact dedup depends on: "é" as
    // U+00E9 vs "e"+U+0301 are byte-different strings that hash apart
    // until normalized. The corpus is ASCII, so the decomposed input is
    // MANUFACTURED deterministically in-query (every 'e' → 'e'+combining
    // acute, via the same regexp in both engines), then composed back by
    // the codegen'd graft_normalize (java.text.Normalizer NFC) and
    // fingerprinted. n_raw > n_nfc proves real composition happened;
    // md5 equality against DuckDB's utf8proc nfc_normalize proves the
    // two UAX #15 implementations agree byte-for-byte. Pure map-side
    // work inside whole-stage codegen — the 100 TB shape of a
    // normalization pass (and the isNormalized fast path makes the
    // all-ASCII majority case allocation-free).
    "q_normalize_text" -> ((s, d) => {
      graft.functions.NormalizeNfc.register(s)
      Tables.documents(s, d)
        .withColumn("t2",
          regexp_replace(lower(col("text")), "e", "e\u0301"))
        .select(col("doc_id"),
          length(col("t2")).cast("long").as("n_raw"),
          length(expr("graft_normalize(t2)")).cast("long").as("n_nfc"),
          md5(expr("graft_normalize(t2)")).as("digest"))
        .orderBy("doc_id")
    }),
  )

  private val oracleToks =
    "list_filter(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+'), x -> x <> '')"
  private def oracleHits(words: Seq[String]): String =
    "CAST(len(list_filter(t, x -> x IN (" + words.map("'" + _ + "'").mkString(", ") + "))) AS BIGINT)"

  val oracleSql: Map[String, String] = Map(
    "q_quality_classifier" ->
      ("WITH t AS (SELECT doc_id, source, " + oracleToks + " AS tk FROM documents), " +
        "docw AS (SELECT DISTINCT doc_id, w FROM (SELECT doc_id, unnest(tk) AS w FROM t) u), " +
        "vocab AS (SELECT w FROM (SELECT w, count(*) AS df FROM docw GROUP BY w) f ORDER BY df DESC, w LIMIT 1024), " +
        "wt AS (SELECT w, CAST(('0x' || substr(md5(w), 1, 6)) AS BIGINT) % 2001 AS wt FROM vocab), " +
        "tok AS (SELECT doc_id, unnest(tk) AS w FROM t), " +
        "ds AS (SELECT tok.doc_id AS doc_id, CAST(sum(coalesce(wt.wt, 0)) AS BIGINT) AS score FROM tok LEFT JOIN wt ON tok.w = wt.w GROUP BY tok.doc_id), " +
        "sc AS (SELECT t.source AS source, coalesce(ds.score, 0) * 1000 // greatest(len(t.tk), 1) AS score_milli FROM t LEFT JOIN ds ON t.doc_id = ds.doc_id) " +
        "SELECT source, count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN score_milli >= 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass, " +
        "CAST(sum(score_milli) // count(*) AS BIGINT) AS avg_score_milli, " +
        "floor(CAST(sum(CASE WHEN score_milli >= 1000000 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 1000.0 + 0.5) / 1000.0 AS pass_rate " +
        "FROM sc GROUP BY source ORDER BY source"),
    "q_filter_funnel" ->
      ("WITH t AS (SELECT " + oracleToks + " AS t FROM documents), " +
        "m AS (SELECT CAST(len(t) AS BIGINT) AS n_tok, " + oracleHits(enStops) + " AS n_stop, " +
        "CAST(len(list_distinct(t)) AS BIGINT) AS n_uniq FROM t), " +
        "g AS (SELECT count(*) AS n0, " +
        "CAST(sum(CASE WHEN n_tok >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n1, " +
        "CAST(sum(CASE WHEN n_tok >= 10 AND n_stop * 20 >= n_tok THEN 1 ELSE 0 END) AS BIGINT) AS n2, " +
        "CAST(sum(CASE WHEN n_tok >= 10 AND n_stop * 20 >= n_tok AND n_uniq * 2 >= n_tok THEN 1 ELSE 0 END) AS BIGINT) AS n3 FROM m), " +
        "u AS (SELECT '1_length' AS stage, n0 AS n_in, n1 AS n_out FROM g " +
        "UNION ALL SELECT '2_stopword', n1, n2 FROM g " +
        "UNION ALL SELECT '3_diversity', n2, n3 FROM g) " +
        "SELECT stage, n_in, n_in - n_out AS n_dropped, n_out FROM u ORDER BY stage"),
    "q_vocab_growth" ->
      ("WITH t AS (SELECT doc_id, unnest(" + oracleToks + ") AS term FROM documents), " +
        "mx AS (SELECT max(doc_id) AS mx FROM documents), " +
        "dm AS (SELECT doc_id * 10 // (mx + 1) AS decile, CAST(count(*) AS BIGINT) AS n_docs " +
        "FROM documents, mx GROUP BY 1), " +
        "tm AS (SELECT doc_id * 10 // (mx + 1) AS decile, CAST(count(*) AS BIGINT) AS n_tokens " +
        "FROM t, mx GROUP BY 1), " +
        "f AS (SELECT term, min(doc_id) AS first_doc FROM t GROUP BY 1), " +
        "nt AS (SELECT first_doc * 10 // (mx + 1) AS decile, CAST(count(*) AS BIGINT) AS new_types " +
        "FROM f, mx GROUP BY 1), " +
        "g AS (SELECT dm.decile, dm.n_docs, coalesce(tm.n_tokens, 0) AS n_tokens, " +
        "coalesce(nt.new_types, 0) AS new_types FROM dm " +
        "LEFT JOIN tm ON dm.decile = tm.decile LEFT JOIN nt ON dm.decile = nt.decile) " +
        "SELECT decile, n_docs, n_tokens, new_types, " +
        "CAST(sum(n_tokens) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens, " +
        "CAST(sum(new_types) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_types " +
        "FROM g ORDER BY decile"),
    "q_tok_zipf" ->
      ("WITH t AS (SELECT unnest(" + oracleToks + ") AS term FROM documents), " +
        "tf AS (SELECT term, CAST(count(*) AS BIGINT) AS freq FROM t GROUP BY 1), " +
        "r AS (SELECT term, freq, CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT) AS rank FROM tf), " +
        "g AS (SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT) AS x, " +
        "CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT) AS y FROM r WHERE rank <= 200), " +
        "m AS (SELECT CAST(count(*) AS DOUBLE) AS n, " +
        "CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx, CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS sxy, " +
        "CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS DOUBLE) AS sxx FROM g) " +
        "SELECT CAST(n AS BIGINT) AS n_tokens, " +
        "floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000.0 + 0.5) / 1000.0 AS zipf_slope FROM m"),
    "q_bpe_merge" ->
      ("WITH w AS (SELECT unnest(" + oracleToks + ") AS w FROM documents), " +
        "c AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1), " +
        "p AS (SELECT n, unnest(CASE WHEN length(w) < 2 THEN [] " +
        "ELSE list_transform(generate_series(1, length(w) - 1), i -> substr(w, i, 2)) END) AS pair FROM c) " +
        "SELECT pair, CAST(sum(n) AS BIGINT) AS n_occurrences FROM p GROUP BY pair " +
        "ORDER BY n_occurrences DESC, pair LIMIT 20"),
    "q_mix_weights" ->
      ("WITH s AS (SELECT source, count(*) AS n_docs, CAST(sum(len(" + oracleToks + ")) AS BIGINT) AS n_tokens " +
        "FROM documents GROUP BY 1), " +
        "w AS (SELECT source, n_docs, n_tokens, " +
        "CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS w_micro FROM s), " +
        "t AS (SELECT CAST(sum(w_micro) AS BIGINT) AS w_sum, CAST(sum(n_tokens) AS BIGINT) AS tok_sum FROM w) " +
        "SELECT source, n_docs, n_tokens, " +
        "floor((CAST(w_micro AS DOUBLE) / CAST(w_sum AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS mix_share, " +
        "(w_micro * (tok_sum // 2)) // w_sum AS alloc_tokens " +
        "FROM w, t ORDER BY source"),
    "q_pack_efficiency" ->
      ("WITH l AS (SELECT CAST(len(" + oracleToks + ") AS BIGINT) AS n FROM documents), " +
        "e AS (SELECT n, CAST(ctx AS BIGINT) AS ctx FROM l, (VALUES (512), (2048), (8192)) AS c(ctx)), " +
        "g AS (SELECT ctx, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens, " +
        "CAST(sum((n + ctx - 1) // ctx) AS BIGINT) AS n_seqs_padded, " +
        "CAST(sum(((n + ctx - 1) // ctx) * ctx - n) AS BIGINT) AS pad_tokens FROM e GROUP BY 1) " +
        "SELECT ctx, n_docs, n_tokens, n_seqs_padded, pad_tokens, " +
        "floor(CAST(pad_tokens AS DOUBLE) / CAST(n_seqs_padded * ctx AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS waste_share, " +
        "(n_tokens + ctx - 1) // ctx AS n_seqs_packed FROM g ORDER BY ctx"),
    "q_pack_assign" ->
      ("WITH l AS (SELECT source, doc_id, CAST(len(" + oracleToks + ") AS BIGINT) AS n FROM documents), " +
        "c AS (SELECT source, n, sum(n) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM l), " +
        "g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens, " +
        "CAST(sum(CASE WHEN n > 0 AND (cum - n) // 2048 <> (cum - 1) // 2048 THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs " +
        "FROM c GROUP BY 1) " +
        "SELECT source, n_docs, n_tokens, (n_tokens + 2047) // 2048 AS n_seqs, n_split_docs, " +
        "floor(CAST(n_tokens AS DOUBLE) / CAST(((n_tokens + 2047) // 2048) * 2048 AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS fill " +
        "FROM g ORDER BY source"),
    "q_char_classes" ->
      ("WITH c AS (SELECT lang, CAST(length(text) AS BIGINT) AS total, " +
        "CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS BIGINT) AS letters, " +
        "CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS digits, " +
        "CAST(length(text) - length(regexp_replace(text, '[ \\t\\n\\r\\f]', '', 'g')) AS BIGINT) AS spaces " +
        "FROM documents) " +
        "SELECT lang, CAST(sum(total) AS BIGINT) AS n_chars, CAST(sum(letters) AS BIGINT) AS n_letters, " +
        "CAST(sum(digits) AS BIGINT) AS n_digits, CAST(sum(spaces) AS BIGINT) AS n_spaces, " +
        "CAST(sum(total - letters - digits - spaces) AS BIGINT) AS n_other " +
        "FROM c GROUP BY lang ORDER BY lang"),
    "q_bigram_lm" ->
      ("WITH t AS (SELECT " + oracleToks + " AS tk FROM documents), " +
        "b AS (SELECT unnest(list_transform(generate_series(1, greatest(len(tk) - 1, 0)), i -> tk[i])) AS w1, " +
        "unnest(list_transform(generate_series(1, greatest(len(tk) - 1, 0)), i -> tk[i + 1])) AS w2 FROM t), " +
        "c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_bigram FROM b GROUP BY 1, 2), " +
        "c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS n_prefix FROM b GROUP BY 1) " +
        "SELECT w1, w2, n_bigram, n_prefix, " +
        "floor((CAST(n_bigram AS DOUBLE) / CAST(n_prefix AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS p_cond " +
        "FROM c2 JOIN c1 USING (w1) ORDER BY n_bigram DESC, w1, w2 LIMIT 20"),
    "q_lang_overlap" ->
      ("WITH v AS (SELECT DISTINCT lang, unnest(" + oracleToks + ") AS tok FROM documents), " +
        "sz AS (SELECT lang, count(*) AS v FROM v GROUP BY 1), " +
        "p AS (SELECT a.lang AS l1, b.lang AS l2, count(*) AS n_shared " +
        "FROM v a JOIN v b ON a.tok = b.tok AND a.lang < b.lang GROUP BY 1, 2) " +
        "SELECT l1, l2, s1.v AS v1, s2.v AS v2, n_shared, " +
        "floor((CAST(n_shared AS DOUBLE) / CAST(s1.v + s2.v - n_shared AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS jaccard " +
        "FROM p JOIN sz s1 ON s1.lang = l1 JOIN sz s2 ON s2.lang = l2 ORDER BY l1, l2"),
    "q_surprisal" ->
      ("WITH t AS (SELECT doc_id, unnest(" + oracleToks + ") AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2), " +
        "ct AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM tf GROUP BY 1), " +
        "n AS (SELECT CAST(sum(ctf) AS BIGINT) AS ntot FROM ct), " +
        "sn AS (SELECT term, CAST(floor(ln(CAST(ntot AS DOUBLE) / CAST(ctf AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT) AS snano FROM ct, n), " +
        "p AS (SELECT tf.doc_id, CAST(sum(tf.tf * sn.snano) AS BIGINT) AS sum_nano, " +
        "CAST(sum(tf.tf) AS BIGINT) AS dl FROM tf JOIN sn USING (term) GROUP BY 1) " +
        "SELECT doc_id, CAST(sum_nano // dl AS DOUBLE) / 1000000000.0 AS surprisal, dl AS n_tokens " +
        "FROM p ORDER BY surprisal DESC, doc_id LIMIT 15"),
    "q_lang_id" ->
      ("WITH t AS (SELECT lang, " + oracleToks + " AS t FROM documents), " +
        "sc AS (SELECT lang, " + oracleHits(enStops) + " AS s_en, " + oracleHits(frStops) + " AS s_fr, " +
        oracleHits(deStops) + " AS s_de FROM t WHERE len(t) > 0), " +
        "p AS (SELECT lang, CASE WHEN s_en >= s_fr AND s_en >= s_de THEN 'en' " +
        "WHEN s_fr >= s_de THEN 'fr' ELSE 'de' END AS pred FROM sc) " +
        "SELECT lang, pred, count(*) AS n FROM p GROUP BY lang, pred ORDER BY lang, pred"),
    "q_quality_score" ->
      ("WITH t AS (SELECT " + oracleToks + " AS t FROM documents), " +
        "m AS (SELECT CAST(len(t) AS BIGINT) AS n_tok, " + oracleHits(enStops) + " AS n_stop, " +
        "CAST(len(list_distinct(t)) AS BIGINT) AS n_uniq FROM t WHERE len(t) > 0) " +
        "SELECT CAST(floor(n_stop * 10 / n_tok) AS BIGINT) AS stop_decile, " +
        "CAST(floor(n_uniq * 10 / n_tok) AS BIGINT) AS diversity_decile, count(*) AS n_docs " +
        "FROM m GROUP BY 1, 2 ORDER BY stop_decile, diversity_decile"),
    "q_token_count" ->
      ("SELECT lang, CAST(sum(len(" + oracleToks + ")) AS BIGINT) AS sum_ws_tokens, " +
        "CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r\\f]'))) AS BIGINT) AS sum_bpeish, " +
        "count(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang"),
    "q_sample_det" ->
      ("SELECT lang, count(*) AS n_sampled, CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        "FROM documents WHERE md5(text) < '0d' GROUP BY lang ORDER BY lang"),
    "q_contamination" ->
      ("WITH tk AS (SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+'), x -> x <> '') AS t FROM documents), " +
        "sh AS (SELECT doc_id, lang, unnest(CASE WHEN len(t) >= 8 " +
        "THEN list_transform(generate_series(1, len(t)-7), i -> array_to_string(list_slice(t, i, i+7), ' ')) " +
        "ELSE [array_to_string(t, ' ')] END) AS s FROM tk), " +
        "bench AS (SELECT s FROM sh WHERE doc_id % 50 = 0), " +
        "cont AS (SELECT DISTINCT doc_id, lang FROM sh WHERE doc_id % 50 <> 0 AND s IN (SELECT s FROM bench)) " +
        "SELECT lang, count(*) AS n_contaminated FROM cont GROUP BY lang ORDER BY lang"),
    "q_sample_strat" ->
      ("WITH r AS (SELECT doc_id, lang, " +
        "row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn, " +
        "count(*) OVER (PARTITION BY lang) AS n_lang FROM documents) " +
        "SELECT lang, count(*) AS n_sampled, CAST(sum(doc_id) AS BIGINT) AS sum_sampled_ids " +
        "FROM r WHERE rn * 10 <= n_lang + 9 GROUP BY lang ORDER BY lang"),
    "q_repetition" ->
      ("WITH t AS (SELECT lang, " + oracleToks + " AS t FROM documents), " +
        "g AS (SELECT lang, CASE WHEN len(t) >= 3 " +
        "THEN list_transform(generate_series(1, len(t) - 2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) " +
        "ELSE [array_to_string(t, ' ')] END AS g FROM t), " +
        "m AS (SELECT lang, CAST(len(g) AS BIGINT) AS n_grams, CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct FROM g), " +
        "b AS (SELECT lang, ((n_grams - n_distinct) * 10) // n_grams AS rep_bucket, n_grams, n_distinct FROM m) " +
        "SELECT lang, rep_bucket, count(*) AS n_docs, CAST(sum(n_grams) AS BIGINT) AS sum_grams, " +
        "CAST(sum(n_distinct) AS BIGINT) AS sum_distinct FROM b GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_sample_weighted" ->
      ("WITH k AS (SELECT lang, doc_id, n_chars, " +
        "CAST(floor(-ln((CAST(('0x' || substr(md5(text), 1, 12)) AS BIGINT) + 1) / 281474976710656.0) / CAST(n_chars AS DOUBLE) * 1000000000.0) AS BIGINT) AS key " +
        "FROM documents), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY key, doc_id) AS rn FROM k) " +
        "SELECT lang, doc_id, n_chars FROM r WHERE rn <= 10 ORDER BY lang, doc_id"),
    "q_split_hash" ->
      ("WITH b AS (SELECT n_chars, CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT) AS bucket FROM documents) " +
        "SELECT CASE WHEN bucket < 204 THEN 'train' WHEN bucket < 230 THEN 'val' ELSE 'test' END AS split, " +
        "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        "FROM b GROUP BY 1 ORDER BY split"),
    "q_fingerprint" ->
      ("WITH t AS (SELECT lang, " + oracleToks + " AS t FROM documents), " +
        "f AS (SELECT lang, md5(array_to_string(t, ' ')) AS content_fp, " +
        "md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS bag_fp FROM t) " +
        "SELECT lang, count(*) AS n_docs, count(DISTINCT content_fp) AS n_content_fp, " +
        "count(DISTINCT bag_fp) AS n_bag_fp FROM f GROUP BY lang ORDER BY lang"),
    "q_chunk_docs" ->
      ("WITH t AS (SELECT lang, " + oracleToks + " AS t FROM documents), " +
        "c AS (SELECT lang, unnest(list_transform(generate_series(0, CAST((len(t) - 1) // 48 AS INT)), " +
        "i -> CAST(len(list_slice(t, i * 48 + 1, i * 48 + 64)) AS BIGINT))) AS chunk_toks " +
        "FROM t WHERE len(t) > 0) " +
        "SELECT lang, count(*) AS n_chunks, CAST(sum(chunk_toks) AS BIGINT) AS sum_chunk_toks, " +
        "floor(CAST(sum(chunk_toks) AS DOUBLE) / count(*) * 100.0 + 0.5) / 100.0 AS avg_chunk_toks " +
        "FROM c GROUP BY lang ORDER BY lang"),
    // full contingency grid incl. zero cells; micro-χ² integral division
    // in HUGEINT mirrors Spark's DECIMAL(38) div
    "q_chi2_tokens" ->
      ("WITH t AS (SELECT source, unnest(" + oracleToks + ") AS term FROM documents), " +
        "c AS (SELECT term, source, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1, 2), " +
        "nt AS (SELECT term, CAST(sum(c) AS BIGINT) AS n_t FROM c GROUP BY 1), " +
        "ms AS (SELECT source, CAST(sum(c) AS BIGINT) AS m_s FROM c GROUP BY 1), " +
        "mm AS (SELECT CAST(sum(c) AS BIGINT) AS mm FROM c), " +
        "g AS (SELECT nt.term, nt.n_t, ms.source, ms.m_s, mm.mm, coalesce(c.c, 0) AS cc " +
        "FROM nt CROSS JOIN ms CROSS JOIN mm " +
        "LEFT JOIN c ON c.term = nt.term AND c.source = ms.source), " +
        "x AS (SELECT term, n_t, CAST(sum(" +
        "(CAST(mm AS HUGEINT) * cc - CAST(n_t AS HUGEINT) * m_s) " +
        "* (CAST(mm AS HUGEINT) * cc - CAST(n_t AS HUGEINT) * m_s) * 1000000 " +
        "// (CAST(mm AS HUGEINT) * n_t * m_s)) AS BIGINT) AS chi2_micro FROM g GROUP BY 1, 2) " +
        "SELECT term, n_t, CAST(chi2_micro AS DOUBLE) / 1000000.0 AS chi2 " +
        "FROM x ORDER BY chi2_micro DESC, term LIMIT 20"),
    // portable md5-prefix shard hash, identical string seed both engines
    "q_epoch_shards" ->
      ("WITH e AS (SELECT doc_id, n_chars, unnest([0, 1, 2]) AS epoch FROM documents), " +
        "a AS (SELECT CAST(epoch AS BIGINT) AS epoch, " +
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)), 1, 4)) AS BIGINT) % 8 AS shard, " +
        "n_chars FROM e), " +
        "g AS (SELECT epoch, shard, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM a GROUP BY 1, 2), " +
        "t AS (SELECT epoch, CAST(sum(n_docs) AS BIGINT) AS tot FROM g GROUP BY 1) " +
        "SELECT g.epoch, g.shard, g.n_docs, g.sum_chars, " +
        "floor(CAST(g.n_docs * 8 AS DOUBLE) / CAST(t.tot AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS balance " +
        "FROM g JOIN t ON g.epoch = t.epoch ORDER BY g.epoch, g.shard"),
    "q_pii_redact" ->
      ("SELECT source, count(*) AS n_docs, CAST(sum(n_email) AS BIGINT) AS emails, CAST(sum(n_phone) AS BIGINT) AS phones, " +
        "CAST(sum(length(txt) - length(red)) AS BIGINT) AS chars_redacted FROM (" +
        "SELECT source, txt, " +
        "CAST(len(regexp_extract_all(txt, '[a-z0-9]+@[a-z]+\\.[a-z]+')) AS BIGINT) AS n_email, " +
        "CAST(len(regexp_extract_all(txt, '\\+1-555-[0-9]{4}')) AS BIGINT) AS n_phone, " +
        "regexp_replace(regexp_replace(txt, '[a-z0-9]+@[a-z]+\\.[a-z]+', '<EMAIL>', 'g'), '\\+1-555-[0-9]{4}', '<PHONE>', 'g') AS red " +
        "FROM (SELECT source, text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-' || " +
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS txt FROM documents) a) b " +
        "GROUP BY source ORDER BY source"),
    "q_regex_extract" ->
      ("SELECT lang, count(*) AS n_matches, count(DISTINCT w) AS n_distinct, " +
        "min(w) AS first_alpha, max(w) AS last_alpha " +
        "FROM (SELECT lang, unnest(regexp_extract_all(text, '[a-z]{6,}')) AS w FROM documents) t " +
        "GROUP BY lang ORDER BY lang"),
    "q_dataset_card" ->
      ("SELECT source, count(*) AS n_docs, count(DISTINCT lang) AS n_langs, " +
        "CAST(sum(n_chars) AS BIGINT) AS total_chars, CAST(sum(ntok) AS BIGINT) AS total_tokens, " +
        "floor(CAST(sum(ntok) AS DOUBLE) / count(*) * 100.0 + 0.5) / 100.0 AS avg_tokens, " +
        "floor(CAST(sum(CASE WHEN ntok < 20 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 1000.0 + 0.5) / 1000.0 AS short_share FROM (" +
        "SELECT source, lang, n_chars, CAST(len(list_filter(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+'), x -> x <> '')) AS BIGINT) AS ntok " +
        "FROM documents) t GROUP BY source ORDER BY source"),
    "q_collation_group" ->
      ("SELECT lower(k) AS source_ci, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars FROM (" +
        "SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS k, n_chars " +
        "FROM documents) t GROUP BY 1 ORDER BY source_ci"),
    "q_curation_pipeline" ->
      ("WITH t AS (SELECT doc_id, text, n_chars, " + oracleToks + " AS tk FROM documents), " +
        "gated AS (SELECT doc_id, text, n_chars, CAST(len(tk) AS BIGINT) AS n_tok " +
        "FROM t WHERE len(tk) >= 10 AND len(list_distinct(tk)) * 2 >= len(tk)), " +
        "dd AS (SELECT doc_id, n_chars, n_tok, md5(text) AS digest, " +
        "row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM gated), " +
        "surv AS (SELECT n_chars, n_tok, CAST(('0x' || substr(digest, 1, 2)) AS BIGINT) AS bucket FROM dd WHERE rn = 1), " +
        "sp AS (SELECT CASE WHEN bucket < 204 THEN 'train' WHEN bucket < 230 THEN 'val' ELSE 'test' END AS split, n_tok, n_chars FROM surv) " +
        "SELECT split, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens, " +
        "CAST(sum(n_chars) AS BIGINT) AS n_chars FROM sp GROUP BY split ORDER BY split"),
    "q_fuzzy_match" ->
      ("WITH tk AS (SELECT doc_id, " + oracleToks + " AS t FROM documents), " +
        "vocab AS (SELECT DISTINCT unnest(t) AS w FROM tk), " +
        "vb AS (SELECT w, substr(w, 1, 1) AS blk FROM vocab), " +
        "d0 AS (SELECT t[1] AS w0 FROM tk WHERE len(t) >= 1), " +
        "dirty AS (SELECT CASE WHEN length(w0) >= 4 THEN substr(w0,1,1) || substr(w0,3,1) || substr(w0,2,1) || substr(w0,4) ELSE w0 END AS dirty FROM d0), " +
        "census AS (SELECT dirty, count(*) AS n_docs, substr(dirty,1,1) AS blk FROM dirty GROUP BY 1), " +
        "scored AS (SELECT c.dirty, v.w, floor(jaro_winkler_similarity(c.dirty, v.w)*1000.0 + 0.5)/1000.0 AS score, c.n_docs " +
        "FROM census c JOIN vb v USING (blk)), " +
        "best AS (SELECT dirty, w, score, n_docs, row_number() OVER (PARTITION BY dirty ORDER BY score DESC, w) AS rn FROM scored) " +
        "SELECT dirty, w AS matched, score, n_docs FROM best WHERE rn = 1 ORDER BY dirty"),
    "q_normalize_text" ->
      ("SELECT doc_id, length(t2) AS n_raw, length(nfc_normalize(t2)) AS n_nfc, " +
        "md5(nfc_normalize(t2)) AS digest FROM " +
        "(SELECT doc_id, regexp_replace(lower(text), 'e', 'e' || chr(769), 'g') AS t2 " +
        "FROM documents) t ORDER BY doc_id"),
  )
}
