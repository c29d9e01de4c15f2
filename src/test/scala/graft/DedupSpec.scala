package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.Row

/** Property tests for the NO-ORACLE dedup operators, anchored to the
  * ORACLE-verified exact n-gram Jaccard (q_dedup_ngram) as ground truth.
  * This is the net that catches silent estimator degeneration — e.g. a
  * monotone hash family making every MinHash slot pick the same shingle
  * (caught exactly this way during development). */
class DedupSpec extends SparkSpec {

  private def pairs(name: String, sfDir: String): Map[(Long, Long), Double] =
    DedupQueries.queries(name)(spark, sfDir).collect().map {
      case Row(a: Long, b: Long, x: Double) => (a, b) -> x
      case Row(a: Long, b: Long, x: Long) => (a, b) -> x.toDouble
    }.toMap

  lazy val exact: Map[(Long, Long), Double] = pairs("q_dedup_ngram", sf001)
  lazy val minhash: Map[(Long, Long), Double] = pairs("q_dedup_near", sf001)
  lazy val simhash: Map[(Long, Long), Double] = pairs("q_dedup_simhash", sf001)

  test("corpus has planted near-duplicates (test has signal)") {
    assert(exact.nonEmpty, "no exact-jaccard >= 0.5 pairs at sf0.01 — tests below would be vacuous")
  }

  test("minhash recall >= 0.8 of exact jaccard>=0.5 pairs") {
    val recalled = exact.keySet.intersect(minhash.keySet)
    assert(recalled.size.toDouble >= 0.8 * exact.size,
      s"recall ${recalled.size}/${exact.size}")
  }

  test("minhash precision: no candidate pair with negligible true overlap") {
    // every minhash-reported pair must share >= 1 shingle with real overlap:
    // est >= 0.5 on a background pair (true jaccard ~0.02) means the hash
    // family degenerated
    val falsePos = minhash.keySet -- exact.keySet
    assert(falsePos.size <= 0.2 * (minhash.size + 1), s"${falsePos.size} false positives of ${minhash.size}")
  }

  test("minhash estimate within 0.25 of exact jaccard on recalled pairs") {
    exact.keySet.intersect(minhash.keySet).foreach { k =>
      assert(math.abs(exact(k) - minhash(k)) <= 0.25,
        s"pair $k: exact ${exact(k)} vs est ${minhash(k)}")
    }
  }

  test("simhash finds most strong near-dups with no background pairs") {
    val strong = exact.filter(_._2 >= 0.7).keySet
    val recalled = strong.intersect(simhash.keySet)
    assert(recalled.size.toDouble >= 0.8 * strong.size, s"recall ${recalled.size}/${strong.size}")
    val falsePos = simhash.keySet -- exact.keySet
    assert(falsePos.isEmpty, s"simhash background pairs: ${falsePos.take(5)}")
  }

  test("q_dedup_embed_lsh: exact subset of q_dedup_embed with identical scores") {
    val embed = pairs("q_dedup_embed", sf001)
    val lsh = pairs("q_dedup_embed_lsh", sf001)
    assert(lsh.nonEmpty, "LSH path found no pairs — no signal")
    lsh.foreach { case (k, c) =>
      assert(embed.contains(k), s"false positive pair $k (confirm step broken)")
      assert(embed(k) == c, s"pair $k score drift: lsh $c vs exact ${embed(k)}")
    }
  }

  test("cosine LSH dedup: recall >= 0.8 on planted near-duplicates") {
    import spark.implicits._
    // the corpus is isotropic random (no true near neighbors), so recall
    // needs a planted fixture: each base vector gets a mildly perturbed
    // copy (cos ~ 0.999); the LSH path must recover >= 80% of the
    // (base, copy) pairs at the 0.9 confirm threshold
    val base = Tables.embeddings(spark, sf001).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val planted = base.map { case (id, v) =>
      (id + 1000000L,
        v.zipWithIndex.map { case (x, i) => x * (1.0 + 0.05 * math.sin(id * 31.0 + i)) })
    }
    val all = (base ++ planted).map { case (id, v) => (id, v.toSeq) }
      .toSeq.toDF("vec_id", "v")
    val found = graft.queries.AnnQueries.cosineLshPairs(all, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalled = base.count { case (id, _) => found.contains((id, id + 1000000L)) }
    assert(recalled.toDouble >= 0.8 * base.length, s"recall $recalled/${base.length}")
  }

  test("edit-distance blocking cap drops a degenerate identical-prefix block") {
    import spark.implicits._
    // 1000 docs sharing one blocking prefix (a boilerplate header at web
    // scale) + a 10-doc bucket of genuine candidates. Uncapped, the big
    // block alone is ~500k Levenshtein pairs; the [2, MAX_BUCKET] cap
    // must drop it entirely and keep the small bucket's pairs.
    val big = (0 until 1000).map(i => (i.toLong, s"boiler plate header text here variant$i", "boiler plate header text here"))
    val small = (2000 until 2010).map(i => (i.toLong, s"unique little prefix block $i", "unique little prefix block"))
    val docs = (big ++ small).toDF("doc_id", "text", "fp")
    val out = DedupQueries.editDupPairs(docs).collect()
    assert(out.nonEmpty, "small-bucket pairs should survive")
    assert(out.forall(r => r.getLong(0) >= 2000L),
      s"degenerate block leaked pairs: ${out.take(3).mkString(",")}")
    assert(out.length == 10 * 9 / 2, s"expected full small-bucket pair set, got ${out.length}")
  }

  test("dedup determinism/idempotence: identical output across runs") {
    assert(pairs("q_dedup_near", sf001) == minhash)
    assert(pairs("q_dedup_ngram", sf001) == exact)
  }

  test("exact dedup survivors: representative is min doc_id per hash group") {
    val survivors = graft.queries.TextQueries.queries("q_dedup_exact")(spark, sf0001)
      .collect().map(r => r.getLong(1)).sum
    val total = Tables.documents(spark, sf0001).count()
    assert(survivors <= total)
    assert(survivors > 0)
  }

  test("CC tiers agree: union-find (small path) == doubling loop (scale path)") {
    val p = graft.queries.DedupQueries.queries("q_dedup_ngram")(spark, sf001)
      .select("d1", "d2").localCheckpoint(true)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    val uf = norm(graft.queries.DedupQueries.unionFindLabels(spark, p))
    val dl = norm(graft.queries.DedupQueries.doublingLabels(spark, p))
    assert(uf.nonEmpty)
    assert(uf == dl, s"tier divergence: uf=${uf.take(5)} dl=${dl.take(5)}")
  }

  test("bloom dedup: pruned+confirmed result equals exact no-bloom semi-join") {
    import org.apache.spark.sql.functions._
    // the query itself (bloom prune -> exact confirm)
    val withBloom = graft.queries.DedupQueries.queries("q_dedup_bloom")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    // the same semantics with NO bloom: a bloom may only add false
    // positives (removed by the confirm join), never drop a true dup
    val fp = concat_ws(" ", slice(
      filter(split(lower(col("text")), "[ \\t\\n\\r\\f]+"), t => t =!= ""), 1, 5))
    val docs = Tables.documents(spark, sf001).select(col("doc_id"), col("source"), fp.as("fp"))
    val exactDups = docs.filter(col("doc_id") % 2 === 1)
      .join(docs.filter(col("doc_id") % 2 === 0).select("fp"), Seq("fp"), "left_semi")
      .groupBy("source").agg(count(lit(1)).as("n_dup"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(withBloom == exactDups,
      s"bloom path diverged from exact: bloom=$withBloom exact=$exactDups")
    assert(withBloom.nonEmpty, "corpus has no planted cross-batch dups — test has no signal")
  }

  test("containment catches a doc-inside-doc pair that Jaccard misses") {
    import spark.implicits._
    // planted corpus: doc 1 is a contiguous prefix of doc 2 (the
    // quoted/concatenated shape), doc 3 unrelated
    val base = java.nio.file.Files.createTempDirectory("graft_contain").toString
    val words = (1 to 120).map(i => s"w$i")
    val sub = words.take(40).mkString(" ")
    val sup = words.mkString(" ")
    val other = (200 to 320).map(i => s"x$i").mkString(" ")
    Seq((1L, sub, "en", "t", sub.length.toLong),
        (2L, sup, "en", "t", sup.length.toLong),
        (3L, other, "en", "t", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    val cont = graft.queries.DedupQueries.queries("q_dedup_contain")(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(cont.contains((1L, 2L)), s"subset pair not caught: $cont")
    val (c, j) = cont((1L, 2L))
    assert(c == 1.0, s"containment of a contiguous subset must be 1.0, got $c")
    assert(j < 0.5, s"planted pair should be below the Jaccard threshold, got $j")
    val jacPairs = graft.queries.DedupQueries.queries("q_dedup_ngram")(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jacPairs.contains((1L, 2L)), "Jaccard unexpectedly caught the subset pair — plant is invalid")
  }

  test("df-ceiling stoplist is a no-op on the test corpus (max df below ceiling)") {
    // proves the pair artifact is bit-identical to the unpruned join here:
    // no shingle reaches the ceiling, so the anti-join drops nothing and
    // the oracle comparisons still cover the full semantics
    val maxDf = DedupQueries.maxShingleDf(spark, sf001)
    assert(maxDf <= DedupQueries.DF_CEILING,
      s"corpus max shingle df $maxDf exceeds ceiling ${DedupQueries.DF_CEILING} — " +
        "the stoplist would change graded pair output on this corpus")
    assert(exact.nonEmpty, "pruned index still yields the planted near-dup pairs")
  }

  test("df-ceiling stoplist stops the boilerplate pair blow-up") {
    import spark.implicits._
    // 1100 shingle-identical boilerplate docs: every doc's distinct
    // shingle set is the SAME 3 shingles, each at df 1100 > DF_CEILING.
    // Unpruned, that single posting list self-joins into ~604k jaccard-1.0
    // pairs — the web-scale stopword blow-up. The stoplist must emit zero
    // pairs for them while a 3-doc genuine near-dup family (distinctive
    // sub-ceiling shingles) still surfaces.
    val base = java.nio.file.Files.createTempDirectory("graft_stoplist").toString
    val boilerText = "legal boiler plate legal boiler plate"
    val boiler = (1 to 1100).map(i => (i.toLong, boilerText, "en", "t", boilerText.length.toLong))
    val words = (1 to 20).map(i => s"w$i").mkString(" ")
    val family = Seq(
      (2001L, words, "en", "t", words.length.toLong),
      (2002L, s"$words extra2", "en", "t", (words.length + 7).toLong),
      (2003L, s"$words extra3", "en", "t", (words.length + 7).toLong))
    (boiler ++ family).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    val out = DedupQueries.queries("q_dedup_ngram")(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.forall { case (a, b) => a >= 2001L && b >= 2001L },
      s"boilerplate docs leaked pairs through the stoplist: ${out.take(5)}")
    assert(out == Set((2001L, 2002L), (2001L, 2003L), (2002L, 2003L)),
      s"genuine near-dup family not fully recovered: $out")
  }

  test("prefix filter is lossless: q_dedup_prefix equals the brute-force tau=0.6 join") {
    // recompute the exact shingle-set Jaccard join with NO prefix filter,
    // driver-side, and demand pair-for-pair equality — the pigeonhole
    // argument (the df-order-smallest common shingle cannot hide in
    // either suffix when J >= tau) must hold on real data, not just on
    // paper
    val toksByDoc = Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")), "[ \\t\\n\\r\\f]+").as("t"))
      .collect().map { r =>
        val toks = r.getSeq[String](1).filter(_.nonEmpty)
        val shingles =
          if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
          else Set(toks.mkString(" "))
        r.getLong(0) -> shingles
      }.toMap
    val docs = toksByDoc.keys.toSeq.sorted
    val brute = (for {
      i <- docs.indices.iterator; j <- (i + 1) until docs.length
      a = toksByDoc(docs(i)); b = toksByDoc(docs(j))
      inter = (a & b).size.toLong; union = a.size + b.size - inter
      if inter * 5 >= union * 3
    } yield (docs(i), docs(j)) ->
      (math.floor(inter.toDouble / union * 1000.0 + 0.5) / 1000.0)).toMap
    val got = pairs("q_dedup_prefix", sf0001)
    assert(got == brute,
      s"prefix join diverged from exact: missing=${(brute.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- brute.keySet).take(5)}")
    assert(brute.nonEmpty, "no tau=0.6 pairs at sf0.001 — parity test is vacuous")
  }

  test("q_sim_sparse equals a driver-side idf-squared cosine recomputation") {
    val shByDoc = Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")), "[ \\t\\n\\r\\f]+").as("t"))
      .collect().map { r =>
        val toks = r.getSeq[String](1).filter(_.nonEmpty)
        val shingles =
          if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
          else Set(toks.mkString(" "))
        r.getLong(0) -> shingles
      }.toMap
    val n = shByDoc.size.toLong
    val dfm = shByDoc.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // the query's snapped weight: w2 = floor(ln²(N/df)·1e6 + 0.5), df-pruned
    def w2(sh: String): Long = {
      val l = math.log(n.toDouble / dfm(sh).toDouble); math.floor(l * l * 1e6 + 0.5).toLong
    }
    val pruned = shByDoc.view.mapValues(_.filter(s => dfm(s) <= 1000L)).toMap
    val norm2 = pruned.map { case (d, s) => d -> s.toSeq.map(w2).sum }
    val docs = shByDoc.keys.toSeq.sorted
    val brute = (for {
      i <- docs.indices.iterator; j <- (i + 1) until docs.length
      d1 = docs(i); d2 = docs(j)
      dot2 = (pruned(d1) & pruned(d2)).toSeq.map(w2).sum
      if BigInt(dot2) * BigInt(dot2) * 4 >= BigInt(norm2(d1)) * BigInt(norm2(d2))
    } yield (d1, d2) -> (math.floor(dot2.toDouble
      / (math.sqrt(norm2(d1).toDouble) * math.sqrt(norm2(d2).toDouble))
      * 1000.0 + 0.5) / 1000.0)).toMap
    val got = pairs("q_sim_sparse", sf0001)
    assert(got == brute,
      s"sparse cosine diverged: missing=${(brute.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- brute.keySet).take(5)}")
    assert(brute.nonEmpty, "no sparse-cosine pairs at sf0.001 — parity test is vacuous")
    got.values.foreach(c => assert(c > 0.0 && c <= 1.0, s"cosine out of range: $c"))
  }

  test("q_ngram_novelty conserves the shingle vocabulary across deciles") {
    val rows = DedupQueries.queries("q_ngram_novelty")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == (0L to 9L), s"deciles not 0..9: ${rows.map(_._1).toSeq}")
    // Σ novel over the corpus = |distinct shingles|: every shingle is
    // novel exactly once, in the doc where it first appears
    val vocab = Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")), "[ \\t\\n\\r\\f]+").as("t"))
      .collect().flatMap { r =>
        val toks = r.getSeq[String](1).filter(_.nonEmpty)
        if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
        else Set(toks.mkString(" "))
      }.toSet
    assert(rows.map(_._3).sum == vocab.size.toLong,
      s"novel mass ${rows.map(_._3).sum} != vocabulary ${vocab.size}")
    rows.foreach { case (dec, nDocs, novel, total, share) =>
      assert(novel <= total, s"decile $dec: novel $novel exceeds shingle mass $total")
      assert(nDocs > 0 && share >= 0.0 && share <= 1.0, s"degenerate decile row: $dec")
    }
  }

  test("incremental near-dup equals the cross-carve restriction of the full pair set") {
    // the asymmetric batch×prior join must surface EXACTLY the q_dedup_ngram
    // pairs that straddle the carve (one member in each snapshot) — no
    // self-pairs within a carve, none dropped
    val got = DedupQueries.queries("q_snapshot_neardup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    got.foreach { case (dNew, dPrior, _) =>
      assert(dNew % 3 == 0, s"$dNew is not a batch doc")
      assert(dPrior % 3 != 0, s"$dPrior is not a prior doc")
    }
    val expected = exact.collect {
      case ((d1, d2), jac) if (d1 % 3 == 0) != (d2 % 3 == 0) =>
        val (b, p) = if (d1 % 3 == 0) (d1, d2) else (d2, d1)
        (b, p, jac)
    }.toSet
    assert(got == expected,
      s"cross-carve mismatch: missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(expected.nonEmpty, "no cross-carve near-dup pairs at sf0.01 — test is vacuous")
  }

  test("survivor selection is consistent with clustering") {
    val clusters = graft.queries.DedupQueries.queries("q_dedup_clusters")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val survivors = graft.queries.DedupQueries.queries("q_dedup_survivor")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(survivors.map(_._1).toSet == clusters.keySet, "cluster roots differ")
    survivors.foreach { case (root, nMembers, survivorId, survivorChars) =>
      assert(nMembers == clusters(root), s"cluster $root size mismatch")
      assert(nMembers >= 2, s"cluster $root has no duplicates")
      assert(survivorId >= root, s"survivor $survivorId precedes root $root")
      assert(survivorChars > 0)
    }
  }

  test("persisted postings index round-trips losslessly through parquet") {
    // diskPostings = savePostingsIndex -> loadPostingsIndex; the on-disk
    // copy must contain EXACTLY the rows of the live artifact, or
    // q_snapshot_neardup's prior side silently diverges from its oracle
    val live = graft.queries.DedupQueries.postingsArtifact(spark, sf001)
    val disk = graft.queries.DedupQueries.diskPostings(spark, sf001)
    assert(disk.schema.map(f => (f.name, f.dataType)) ==
      live.schema.map(f => (f.name, f.dataType)), "schema changed in round-trip")
    assert(disk.exceptAll(live).count() == 0, "disk copy has rows the live index lacks")
    assert(live.exceptAll(disk).count() == 0, "disk copy lost rows")
    assert(live.count() > 0, "vacuous: empty postings index")
  }
}
