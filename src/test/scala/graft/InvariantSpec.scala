package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Cross-query invariants from SURVEY §5.3: window-vs-group totals, HLL
  * accuracy, as-of join semantics at ties, sessionization conservation. */
class InvariantSpec extends SparkSpec {

  test("running window sum at partition end equals group-by sum") {
    val last = graft.queries.WindowQueries.queries("q_win_running")(spark, sf0001)
    val events = Tables.events(spark, sf0001)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val tail = events
      .withColumn("rn_desc", row_number().over(
        Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn_desc") === 1).select("event_id")
    val lastRun = last.join(tail, Seq("event_id")).select(col("user_id"), col("run_sum"))
    val grp = events.groupBy("user_id").agg(round(sum("value"), 2).as("grp_sum"))
    val diff = lastRun.join(grp, "user_id")
      .filter(abs(col("run_sum") - col("grp_sum")) > 0.011).count()
    assert(diff == 0, s"$diff users where final running sum != group sum")
  }

  test("approx_percentile within 5% of the exact percentile") {
    val exact = graft.queries.AggQueries.queries("q_agg_percentile")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    graft.queries.AggQueries.queries("q_approx_percentile")(spark, sf001).collect().foreach { r =>
      val (p50, p90) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - p50) / p50 <= 0.05, s"${r.getString(0)} p50")
      assert(math.abs(r.getDouble(2) - p90) / p90 <= 0.05, s"${r.getString(0)} p90")
    }
  }

  test("HLL sketch union of daily partials is lossless and tracks exact distinct") {
    val ev = Tables.events(spark, sf001)
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("direct_est"),
        countDistinct(col("user_id")).as("exact"))
    graft.queries.AggQueries.queries("q_hll_merge")(spark, sf001)
      .join(direct, "event_type").collect().foreach { r =>
        val est = r.getAs[Long]("est_users")
        val dir = r.getAs[Long]("direct_est")
        val exact = r.getAs[Long]("exact").toDouble
        assert(est == dir,
          s"${r.getString(0)}: union of partials ($est) != direct sketch ($dir) — merge is not lossless")
        assert(math.abs(est - exact) / exact <= 0.05,
          s"${r.getString(0)}: estimate $est vs exact $exact")
      }
  }

  test("theta-sketch overlap estimates match exact intersection/union counts") {
    val ev = Tables.events(spark, sf001)
      .withColumn("half", when(dayofmonth(col("ts")) <= 15, "h1").otherwise("h2"))
      .select("event_type", "half", "user_id").distinct()
    val h1 = ev.filter(col("half") === "h1").select(col("event_type"), col("user_id"))
    val h2 = ev.filter(col("half") === "h2").select(col("event_type"), col("user_id"))
    val exactBoth = h1.join(h2, Seq("event_type", "user_id"), "left_semi")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAny = ev.select("event_type", "user_id").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactH1 = h1.distinct().groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactH2 = h2.distinct().groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = graft.queries.AggQueries.queries("q_sketch_overlap")(spark, sf001).collect()
    assert(rows.nonEmpty, "overlap report is empty — query lost its input")
    assert(rows.map(_.getString(0)).toSet == exactAny.keySet,
      "overlap report does not cover every event type")
    rows.foreach { r =>
      val t = r.getString(0)
      // cardinalities sit far below the sketch's k=4096 entries, so the
      // sketches are in exact mode — estimates must EQUAL the true counts
      assert(r.getLong(1) == exactH1.getOrElse(t, 0L), s"$t: est_h1 ${r.getLong(1)}")
      assert(r.getLong(2) == exactH2.getOrElse(t, 0L), s"$t: est_h2 ${r.getLong(2)}")
      assert(r.getLong(3) == exactBoth.getOrElse(t, 0L),
        s"$t: intersection estimate ${r.getLong(3)} != exact ${exactBoth.get(t)}")
      assert(r.getLong(4) == exactAny(t),
        s"$t: union estimate ${r.getLong(4)} != exact ${exactAny(t)}")
    }
  }

  test("HLL approx_count_distinct within 5% of exact") {
    graft.queries.AggQueries.queries("q_approx_distinct")(spark, sf001).collect().foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"flag ${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("as-of join: every matched purchase pairs with a strictly earlier click") {
    // reference implementation computed driver-side on the small sf0.001
    import scala.collection.mutable
    val ev = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_id", "user_id", "event_type", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3).getTime))
    val byUser = ev.groupBy(_._2)
    val expected = mutable.Map[Long, (Long, Double)]().withDefaultValue((0L, 0.0))
    byUser.foreach { case (user, rows) =>
      val clicks = rows.filter(_._3 == "click").map(_._4).sorted
      rows.filter(_._3 == "purchase").foreach { case (_, _, _, pts) =>
        val earlier = clicks.filter(_ < pts) // strictly earlier
        if (earlier.nonEmpty) {
          val gap = (pts - earlier.max) / 1000.0 // ms -> sec (micros truncated to ms grid)
          val b = user % 10
          val (n, s) = expected(b); expected(b) = (n + 1, s + gap)
        }
      }
    }
    val got = graft.queries.EventQueries.queries("q_join_asof")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet.filter(expected(_)._1 > 0))
    got.foreach { case (bucket, (n, avgGap)) =>
      val (en, es) = expected(bucket)
      assert(n == en, s"bucket $bucket: matched $n vs expected $en")
      assert(math.abs(avgGap - (es / en)) < 0.011, s"bucket $bucket: avg gap $avgGap vs ${es / en}")
    }
  }

  test("sessionization conserves events") {
    val sess = graft.queries.WindowQueries.queries("q_session_30m")(spark, sf0001).collect()
    val totalEvents = Tables.events(spark, sf0001).count()
    val reconstructed = sess.map(r => r.getLong(1) * r.getDouble(2)).sum
    assert(math.abs(reconstructed - totalEvents) < 0.01 * totalEvents + 1,
      s"events $totalEvents vs sessions*events_per_session $reconstructed")
  }

  test("exact percentile matches a driver-side reference") {
    val got = graft.queries.AggQueries.queries("q_agg_percentile")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val vals = Tables.orders(spark, sf0001).select("o_orderstatus", "o_totalprice")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    vals.groupBy(_._1).foreach { case (st, rows) =>
      val sorted = rows.map(_._2).sorted
      def pct(p: Double): Double = {
        val idx = p * (sorted.length - 1)
        val lo = math.floor(idx).toInt; val hi = math.ceil(idx).toInt
        val v = sorted(lo) + (idx - lo) * (sorted(hi) - sorted(lo))
        math.round(v * 100.0) / 100.0
      }
      assert(math.abs(got(st)._1 - pct(0.5)) < 0.011, s"$st p50")
      assert(math.abs(got(st)._2 - pct(0.9)) < 0.011, s"$st p90")
    }
  }

  test("chunking matches a driver-side reference computation") {
    import org.apache.spark.sql.functions._
    // reference: per-doc token count -> chunk count/lengths in plain Scala
    val counts = Tables.documents(spark, sf0001)
      .select(col("lang"),
        size(filter(split(lower(col("text")), "[ \\t\\n\\r\\f]+"), t => t =!= "")).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val expected = counts.filter(_._2 > 0).flatMap { case (lang, n) =>
      (0 to (n - 1) / 48).map(i => (lang, math.min(64, n - i * 48).toLong))
    }.groupBy(_._1).map { case (lang, cs) =>
      (lang, (cs.length.toLong, cs.map(_._2).sum))
    }
    val got = graft.queries.TextAnalysisQueries.queries("q_chunk_docs")(spark, sf0001)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, s"got $got, expected $expected")
  }

  test("cumulative share is monotone within each status and caps at 1.0") {
    val rows = graft.queries.WindowQueries.queries("q_win_cumshare")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (st, rs) =>
      val shares = rs.sortBy(_._2).map(_._3)
      assert(shares.head > 0.0, s"$st first share")
      assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
        s"$st shares not monotone: ${shares.take(10).toSeq}")
      assert(shares.last <= 1.0 + 1e-9, s"$st last share ${shares.last}")
    }
  }

  test("surprisal scores are non-negative, descending, and penalize rare tokens") {
    val rows = graft.queries.TextAnalysisQueries.queries("q_surprisal")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 15)
    assert(rows.forall(_._2 >= 0.0), s"negative surprisal: ${rows.find(_._2 < 0.0)}")
    val scores = rows.map(_._2)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      s"not ranked descending: ${scores.toSeq}")
    // upper bound: mean surprisal can't exceed ln(N) (an all-hapax doc)
    val nTotal = Tables.documents(spark, sf0001)
      .select(explode(split(lower(col("text")), "[ \\t\\n\\r\\f]+")).as("t"))
      .filter(col("t") =!= "").count()
    assert(rows.forall(_._2 <= math.log(nTotal.toDouble) + 1e-6),
      s"surprisal exceeds ln(N)=${math.log(nTotal.toDouble)}")
  }

  test("dup rate by source is consistent with the near-dup pair set") {
    val rows = graft.queries.DedupQueries.queries("q_dup_rate_source")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val dupDocs = graft.queries.DedupQueries.queries("q_dedup_ngram")(spark, sf0001)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(_._3).sum == dupDocs.size.toLong,
      s"per-source dup counts don't sum to the distinct dup-doc count")
    rows.foreach { case (src, n, nd, pct) =>
      assert(nd <= n, s"$src: more dups than docs")
      assert(pct >= 0.0 && pct <= 100.0, s"$src: pct out of range")
    }
    assert(rows.map(_._2).sum == Tables.documents(spark, sf0001).count())
  }

  test("sweep-line concurrency: peaks bounded by segment counts, sessions conserved") {
    val days = graft.queries.EventQueries.queries("q_sessions_concurrent")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(days.nonEmpty)
    days.foreach { case (day, peak, nSeg) =>
      assert(peak >= 1 && peak <= nSeg, s"$day: peak $peak vs segments $nSeg")
    }
    // day-splitting only ADDS segments: total segments >= total sessions
    val nSessions = graft.queries.WindowQueries.queries("q_session_30m")(spark, sf0001)
      .collect().map(_.getLong(1)).sum
    assert(days.map(_._3).sum >= nSessions,
      s"segments ${days.map(_._3).sum} < sessions $nSessions")
  }

  test("attribution: first-touch and last-touch credit the same purchase mass") {
    val rows = graft.queries.EventQueries.queries("q_first_last_touch")(spark, sf0001)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // every touched purchase is credited exactly once on each side, so
    // the two models must agree in total and differ only in distribution
    assert(rows.map(_._1).sum == rows.map(_._3).sum, "n_first total != n_last total")
    assert(rows.map(_._2).sum == rows.map(_._4).sum, "first cents total != last cents total")
    assert(rows.map(_._2).sum > 0)
  }

  test("dedup consensus flags reproduce the three source pair sets exactly") {
    def pairSet(name: String, c1: Int = 0, c2: Int = 1) =
      graft.queries.DedupQueries.queries(name)(spark, sf0001)
        .collect().map(r => (r.getLong(c1), r.getLong(c2))).toSet
    val consensus = graft.queries.DedupQueries.queries("q_dedup_consensus")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val ng = pairSet("q_dedup_ngram")
    val ed = pairSet("q_dedup_edit")
    val em = pairSet("q_dedup_embed")
    assert(consensus.keySet == (ng ++ ed ++ em), "consensus pair universe mismatch")
    consensus.foreach { case (p, (bn, be, bm, n)) =>
      assert(bn == (if (ng(p)) 1L else 0L), s"$p ngram flag")
      assert(be == (if (ed(p)) 1L else 0L), s"$p edit flag")
      assert(bm == (if (em(p)) 1L else 0L), s"$p embed flag")
      assert(n == bn + be + bm)
    }
  }

  test("2-D histogram partitions all orders and conserves cents") {
    val grid = graft.queries.AggQueries.queries("q_histogram2d")(spark, sf0001)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    val o = Tables.orders(spark, sf0001)
      .agg(count(lit(1)), sum(round(col("o_totalprice") * 100).cast("long")))
      .head()
    assert(grid.map(_._1).sum == o.getLong(0), "row count not conserved")
    assert(grid.map(_._2).sum == o.getLong(1), "cents mass not conserved")
  }

  test("session conversion buckets partition exactly the sessions q_session_30m counts") {
    val buckets = graft.queries.EventQueries.queries("q_session_conversion")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val totalSessions = graft.queries.WindowQueries.queries("q_session_30m")(spark, sf0001)
      .collect().map(_.getLong(1)).sum
    assert(buckets.map(_._2).sum == totalSessions,
      s"bucketed sessions ${buckets.map(_._2).sum} != sessionizer's $totalSessions")
    buckets.foreach { case (b, n, conv, pct) =>
      assert(conv <= n, s"bucket $b: conversions exceed sessions")
      assert(pct >= 0.0 && pct <= 100.0, s"bucket $b pct $pct")
    }
  }

  test("skew report: shares in (0,1], distinct <= rows, known low-cardinality keys flagged") {
    val rows = graft.queries.RelationalQueries.queries("q_skew_report")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.size == 5)
    rows.foreach { case (k, (n, d, share)) =>
      assert(d >= 1 && d <= n, s"$k: distinct $d vs rows $n")
      assert(share > 0.0 && share <= 1.0, s"$k: share $share")
      assert(share >= 1.0 / d - 1e-9, s"$k: top share below uniform floor")
    }
    // the 3-value returnflag and 5-value priority are the salting
    // candidates this report exists to expose
    assert(rows("lineitem.l_returnflag")._2 <= 5)
    assert(rows("lineitem.l_returnflag")._3 >= 0.2)
    assert(rows("orders.o_custkey")._3 <= 0.05, "high-card key should have a thin top share")
  }

  test("pareto: bucketed two-level prefix sum equals the brute-force 80% cut") {
    val r = graft.queries.AnalyticsQueries.queries("q_pareto")(spark, sf0001).collect()(0)
    val (nCust, total, nTop, pct) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    // brute force on the collected per-customer cents
    val cents = Tables.orders(spark, sf0001)
      .groupBy("o_custkey").agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .collect().map(_.getLong(1)).sorted(Ordering[Long].reverse)
    assert(cents.length == nCust && cents.sum == total)
    var cum = 0L; var k = 0
    while (cum * 5 < total * 4) { cum += cents(k); k += 1 }
    assert(nTop == k, s"two-level cut $nTop != brute-force $k")
    assert(pct > 0.0 && pct <= 100.0)
  }

  test("trimmed mean sits within the raw distribution and trims ~10%") {
    graft.queries.AnalyticsQueries.queries("q_trimmed_mean")(spark, sf0001).collect().foreach { r =>
      val (n, kept, raw, trimmed) = (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(kept == n - 2 * (n / 20), s"kept $kept of $n is not the symmetric 5% trim")
      assert(trimmed > 0 && math.abs(trimmed - raw) / raw < 0.25,
        s"trimmed $trimmed implausibly far from raw $raw")
    }
  }

  test("rfm: segment census conserves customers and codes are valid quartile triples") {
    val rows = graft.queries.AnalyticsQueries.queries("q_rfm")(spark, sf0001).collect()
    val nWithOrders = Tables.orders(spark, sf0001).select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(2)).sum == nWithOrders, "RFM census loses customers")
    rows.foreach { r =>
      val code = r.getLong(1)
      val (q1, q2, q3) = (code / 100, code / 10 % 10, code % 10)
      assert(Seq(q1, q2, q3).forall(q => q >= 1 && q <= 4), s"bad rfm code $code")
    }
  }

  test("gap distribution conserves gaps (events minus one per active user)") {
    val buckets = graft.queries.EventQueries.queries("q_gap_dist")(spark, sf0001).collect()
    val ev = Tables.events(spark, sf0001)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(buckets.map(_.getLong(1)).sum == expected, "gap count != events - users")
    buckets.foreach { r =>
      val (dig, mn, mx) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(mn.toString.length == dig && mx.toString.length == dig,
        s"bucket $dig holds out-of-range gaps [$mn,$mx]")
    }
  }

  test("vocab coverage is monotone in k and bounded by the total token mass") {
    val rows = graft.queries.TextQueries.queries("q_vocab_coverage")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    var prev = 0.0
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "cumulative exceeds total")
      assert(r.getDouble(4) >= prev, "coverage not monotone in k")
      prev = r.getDouble(4)
    }
  }

  test("dup family sizes partition the corpus exactly") {
    val rows = graft.queries.DedupQueries.queries("q_dup_family_size")(spark, sf0001).collect()
    val total = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getLong(2)).sum == total, "family histogram loses docs")
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1), "n_docs != size * families")
    }
  }

  test("bigram LM: conditional probabilities are valid and consistent with the counts") {
    val rows = graft.queries.TextAnalysisQueries.queries("q_bigram_lm")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val counts = rows.map(_.getLong(2))
    assert(counts.sameElements(counts.sorted(Ordering[Long].reverse)), "top-20 not sorted by count")
    rows.foreach { r =>
      val (c2, c1, p) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(c2 <= c1, "bigram count exceeds its prefix count")
      assert(p > 0.0 && p <= 1.0, s"P(w2|w1)=$p out of range")
      assert(math.abs(p - math.floor(c2.toDouble / c1 * 1000 + 0.5) / 1000) < 1e-12)
    }
  }

  test("lang overlap: jaccard bounded and intersection no larger than either vocabulary") {
    val rows = graft.queries.TextAnalysisQueries.queries("q_lang_overlap")(spark, sf0001).collect()
    val k = Tables.documents(spark, sf0001).select("lang").distinct().count()
    assert(rows.length == k * (k - 1) / 2, "missing language pairs")
    rows.foreach { r =>
      val (v1, v2, inter, j) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(inter <= math.min(v1, v2), "intersection exceeds a vocabulary")
      assert(j >= 0.0 && j <= 1.0, s"jaccard $j out of range")
    }
  }

  test("embedding centroids: norm bounded by the label's max vector norm, drift nonnegative") {
    val norms = graft.queries.VectorQueries.queries("q_vector_norms")(spark, sf0001)
      .collect().map(r => r.getInt(0) -> r.getDouble(4)).toMap // label -> max_norm
    graft.queries.VectorQueries.queries("q_emb_centroid")(spark, sf0001).collect().foreach { r =>
      val (label, cn, drift) = (r.getInt(0), r.getDouble(2), r.getDouble(3))
      assert(cn >= 0.0 && cn <= norms(label) + 1e-9,
        s"label $label centroid norm $cn exceeds max vector norm ${norms(label)} (convexity)")
      assert(drift >= 0.0, s"label $label negative drift")
    }
  }

  test("multi-exists: every blamed supplier truly is the only late shipper on shared orders") {
    // recompute the Q21 semantics brutally on the collected sf0.001 slice
    val o = Tables.orders(spark, sf0001).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), unix_date(col("o_orderdate").cast("date")).as("od")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val lines = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_suppkey"),
        unix_date(col("l_shipdate").cast("date")).as("sd")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byOrder = lines.groupBy(_._1)
    def isLate(k: Long, shipDay: Int): Boolean =
      o.contains(k) && (shipDay - o(k)) > 60
    val blamed = byOrder.toSeq.flatMap { case (k, ls) =>
      val supps = ls.map(_._2).distinct
      val lateSupps = ls.filter(l => isLate(k, l._3)).map(_._2).distinct
      if (supps.size > 1 && lateSupps.size == 1) lateSupps else Nil
    }.groupBy(identity).map { case (s, v) => s -> v.size.toLong }
    val expected = blamed.toSeq.sortBy { case (s, n) => (-n, s) }.take(10)
    val got = graft.queries.RelationalQueries.queries("q_multi_exists")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == expected, s"q_multi_exists diverges from the brute-force Q21 recompute")
  }

  test("graph BFS: depth 0 is exactly the seed and depths stay within the bound") {
    val rows = graft.queries.DedupQueries.queries("q_graph_bfs")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val d0 = rows.filter(_.getLong(0) == 0L)
    assert(d0.length == 1 && d0(0).getLong(1) == 1L, "depth-0 frontier is not the single seed")
    assert(d0(0).getLong(2) == d0(0).getLong(3), "depth-0 min_doc != max_doc")
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 3, "depth outside the recursion bound")
      assert(r.getLong(1) >= 1 && r.getLong(2) <= r.getLong(3))
    }
  }

  test("filter funnel: stages chain (each n_in is the previous n_out) and only shrink") {
    val stages = graft.queries.TextAnalysisQueries.queries("q_filter_funnel")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(stages.length == 3)
    assert(stages.head._2 == Tables.documents(spark, sf0001).count(),
      "stage 1 input must be the whole corpus")
    stages.foreach { case (st, in, dropped, out) =>
      assert(in - dropped == out, s"$st: attrition bookkeeping broken")
      assert(out <= in, s"$st grew")
    }
    stages.sliding(2).foreach { case Array((s1, _, _, out1), (s2, in2, _, _)) =>
      assert(out1 == in2, s"$s1 -> $s2: funnel not chained")
    }
    assert(stages.last._4 > 0, "every doc filtered out — gates degenerate")
  }

  test("vector norm audit: bounds ordered, zero vectors counted exactly") {
    val rows = graft.queries.VectorQueries.queries("q_vector_norms")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (label, n, nZero, mn, mx, avg) =>
      assert(n > 0 && nZero >= 0 && nZero <= n, s"label $label counts")
      assert(mn <= avg + 1e-9 && avg <= mx + 1e-9, s"label $label: min $mn avg $avg max $mx")
      assert(mn >= 0.0, s"label $label negative norm")
    }
    assert(rows.map(_._2).sum == Tables.embeddings(spark, sf0001).count())
  }

  test("BPE merges: pair mass bounded by the corpus char-pair budget, sorted, true bigrams") {
    val rows = graft.queries.TextAnalysisQueries.queries("q_bpe_merge")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val counts = rows.map(_.getLong(1))
    assert(counts.sameElements(counts.sorted(Ordering[Long].reverse)), "top-20 not sorted by count")
    rows.foreach { r =>
      assert(r.getString(0).length == 2, s"pair '${r.getString(0)}' is not a character bigram")
      assert(r.getLong(1) >= 1)
    }
    // every word of length L contributes exactly L-1 pairs: totals must reconcile
    val words = Tables.documents(spark, sf0001)
      .select(explode(filter(split(lower(col("text")), "[ \\t\\n\\r\\f]+"), t => t =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val budget = words.select(sum(col("n") * greatest(length(col("w")) - 1, lit(0)))).head.getLong(0)
    assert(counts.sum <= budget, "top-20 pair mass exceeds the corpus pair budget")
  }

  test("mix weights: shares form a distribution and allocations respect the half-corpus budget") {
    val rows = graft.queries.TextAnalysisQueries.queries("q_mix_weights")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getDouble(3))
    shares.foreach(sh => assert(sh >= 0.0 && sh <= 1.0, s"share $sh out of range"))
    assert(math.abs(shares.sum - 1.0) <= 0.002 * rows.length, "shares do not sum to ~1")
    val tokTotal = rows.map(_.getLong(2)).sum
    val allocs = rows.map(_.getLong(4))
    allocs.foreach(a => assert(a >= 0))
    assert(allocs.sum <= tokTotal / 2, "allocations overrun the half-corpus budget")
    // sqrt smoothing flattens the mixture: smaller sources get a share boost
    val byTokens = rows.sortBy(_.getLong(2))
    byTokens.sliding(2).foreach { case Array(small, big) =>
      val smallBoost = small.getDouble(3) * tokTotal - small.getLong(2).toDouble
      val bigBoost = big.getDouble(3) * tokTotal - big.getLong(2).toDouble
      assert(smallBoost >= bigBoost - 1e-3 * tokTotal,
        "temperature smoothing failed to favor the smaller source")
    }
  }

  test("char classes: class counts partition total chars exactly per language") {
    val rows = graft.queries.TextAnalysisQueries.queries("q_char_classes")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, letters, digits, spaces, other) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(letters + digits + spaces + other == total,
        s"lang ${r.getString(0)}: classes do not partition the char total")
      assert(Seq(letters, digits, spaces, other).forall(_ >= 0))
      assert(spaces > 0, s"lang ${r.getString(0)}: multi-word docs must contain whitespace")
    }
    val grandTotal = Tables.documents(spark, sf0001)
      .select(sum(length(col("text")))).head.getLong(0)
    assert(rows.map(_.getLong(1)).sum == grandTotal, "per-language totals lose characters")
  }

  test("snapshot diff: status census reconciles with the carve rules exactly") {
    val rows = graft.queries.AnalyticsQueries.queries("q_snapshot_diff")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ids = Tables.documents(spark, sf0001).select("doc_id").collect().map(_.getLong(0))
    def inV1(i: Long) = i % 10 != 0
    def inV2(i: Long) = i % 7 != 0
    val added = ids.count(i => !inV1(i) && inV2(i)).toLong
    val removed = ids.count(i => inV1(i) && !inV2(i)).toLong
    val changed = ids.count(i => inV1(i) && inV2(i) && i % 5 == 0).toLong
    val unchanged = ids.count(i => inV1(i) && inV2(i) && i % 5 != 0).toLong
    assert(rows.getOrElse("added", 0L) == added, s"added: $rows vs $added")
    assert(rows.getOrElse("removed", 0L) == removed, s"removed: $rows vs $removed")
    assert(rows.getOrElse("changed", 0L) == changed, s"changed: $rows vs $changed")
    assert(rows.getOrElse("unchanged", 0L) == unchanged, s"unchanged: $rows vs $unchanged")
  }

  test("pack efficiency: integer ceil identities hold and packing beats padding") {
    val rows = graft.queries.TextAnalysisQueries.queries("q_pack_efficiency")(spark, sf0001)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(512L, 2048L, 8192L))
    val (docs, toks) = (rows.map(_.getLong(1)).distinct, rows.map(_.getLong(2)).distinct)
    assert(docs.length == 1 && toks.length == 1,
      "per-ctx rows disagree on corpus doc/token totals")
    rows.foreach { r =>
      val (ctx, nTokens, nPad, pad, waste, nPacked) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6))
      assert(pad == nPad * ctx - nTokens, s"ctx $ctx: pad_tokens identity broken")
      assert(nPacked == (nTokens + ctx - 1) / ctx, s"ctx $ctx: packed lower bound wrong")
      assert(nPacked <= nPad, s"ctx $ctx: perfect packing cannot need MORE sequences")
      assert(waste >= 0.0 && waste < 1.0, s"ctx $ctx: waste share $waste out of range")
    }
    // waste grows with window size on a short-doc corpus
    val wastes = rows.map(_.getDouble(5))
    assert(wastes.sameElements(wastes.sorted), s"waste not monotone in ctx: ${wastes.toSeq}")
  }

  test("pack assignment: per-source seq counts, split bounds and corpus totals reconcile") {
    val rows = graft.queries.TextAnalysisQueries.queries("q_pack_assign")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, nDocs, nTokens, nSeqs, nSplit, fill) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(nSeqs == (nTokens + 2047) / 2048, s"$src: seq count is not ceil(tokens/ctx)")
      assert(nSplit >= 0 && nSplit <= math.min(nDocs, math.max(nSeqs - 1, 0)),
        s"$src: $nSplit split docs vs $nDocs docs / $nSeqs seqs — each of the " +
          "nSeqs-1 boundaries splits at most one doc")
      assert(fill > 0.0 && fill <= 1.0, s"$src: fill $fill out of range")
    }
    val docTotal = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == docTotal, "per-source doc counts lose docs")
    // same corpus totals q_pack_efficiency reports (cross-query consistency)
    val eff = graft.queries.TextAnalysisQueries.queries("q_pack_efficiency")(spark, sf0001)
      .collect().head
    assert(rows.map(_.getLong(2)).sum == eff.getLong(2), "token totals disagree with q_pack_efficiency")
  }
}
