package graft

import graft.queries.AnalyticsQueries
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic properties of the round-4 analytics operators — each is
  * oracle-checked by the driver, so these pin the SEMANTICS (dominance,
  * anomaly definition, conservation laws) rather than exact values. */
class AnalyticsSpec extends SparkSpec {

  private def q(name: String) = AnalyticsQueries.queries(name)(spark, sf0001)

  test("q_skyline: result is mutually non-dominated and every dropped order is dominated") {
    val sky = q("q_skyline").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getString(3)))
    // mutual non-domination within each status group
    for (g <- sky.groupBy(_._1).values; a <- g; b <- g if a != b)
      assert(!(a._2 >= b._2 && a._3 >= b._3 && (a._2 > b._2 || a._3 > b._3)),
        s"skyline row $b dominated by $a")
    // completeness: a non-skyline order must have a dominator
    val all = Tables.orders(spark, sf0001)
      .select(col("o_orderstatus"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val skyKeys = sky.map(_._2).toSet // cents values are near-unique at sf0.001
    val byStatus = all.groupBy(_._1)
    for ((st, g) <- byStatus; r <- g if !skyKeys.contains(r._3))
      assert(g.exists(o => o._3 >= r._3 && o._4 >= r._4 && (o._3 > r._3 || o._4 > r._4)),
        s"dropped order $r has no dominator in status $st")
  }

  test("q_anomaly_mean: flags exactly the events above 2x their user's exact mean") {
    val rows = Tables.events(spark, sf0001)
      .select(col("user_id"), round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byUser = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = rows.count { case (u, c) =>
      val v = byUser(u); c * v.length > 2 * v.sum
    }
    val got = q("q_anomaly_mean").agg(sum("n_anom")).collect()(0).getLong(0)
    assert(got == expected, s"anomaly count $got != exact recompute $expected")
  }

  test("q_compact_plan: conserves files and cents; bins are contiguous per status") {
    val plan = q("q_compact_plan").collect()
    val nFiles = plan.map(_.getAs[Long]("n_files")).sum
    assert(nFiles == Tables.orders(spark, sf0001).count())
    // no bin exceeds target + one max-file overshoot (greedy invariant)
    val maxCents = Tables.orders(spark, sf0001)
      .agg(max(round(col("o_totalprice") * 100).cast("long"))).collect()(0).getLong(0)
    plan.foreach { r =>
      assert(r.getAs[Long]("max_bin_cents") <= 1000000000L + maxCents,
        s"bin overshoots target by more than one file: $r")
    }
  }

  test("q_entropy: per-doc entropy is in [0, ln(n_tok)] nano-nats") {
    // uniform distribution maximizes entropy at ln(k) <= ln(total tokens)
    val docs = Tables.documents(spark, sf0001)
      .select(size(split(lower(col("text")), "[ \\t\\n\\r\\f]+")).as("n"))
      .agg(max("n")).collect()(0).getInt(0)
    val cap = math.ceil(math.log(docs.toDouble) * 1e9).toLong
    q("q_entropy").collect().foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b * 500000000L <= cap, s"entropy bucket $b out of [0, ln(max_tok)] range")
    }
  }

  test("q_quality_gate: conjunction count never exceeds any single rule count") {
    q("q_quality_gate").collect().foreach { case Row(_, n: Long, l: Long, w: Long, s: Long, rp: Long, p: Long) =>
      assert(p <= Seq(l, w, s, rp).min && Seq(l, w, s, rp).max <= n)
    }
  }

  test("q_token_drift: drift score is zero iff split rates are exactly equal") {
    q("q_token_drift").collect().foreach { r =>
      val (dfA, dfB, drift) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(drift >= 0)
      if (drift == 0) assert(r.getDouble(4) == 0.0,
        s"zero integer drift but nonzero rate_diff: $r")
      assert(dfA != dfB || drift == 0 || math.abs(dfA - dfB) > 0)
    }
  }

  test("q_sliding_distinct: each 7-day WAU bounds its days' DAU (max <= wau <= sum)") {
    val dau = Tables.events(spark, sf0001)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .groupBy("day").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    q("q_sliding_distinct").collect().foreach { r =>
      val w = java.time.LocalDate.parse(r.getString(0), fmt)
      val daus = (0 to 6).flatMap(k => dau.get(w.minusDays(k).toString))
      val wau = r.getLong(1)
      assert(daus.nonEmpty && wau >= daus.max && wau <= daus.sum,
        s"WAU $wau outside [max DAU ${daus.max}, sum DAU ${daus.sum}] for window ending $w")
    }
  }

  test("q_corr_regr: correlation in [-1,1] and matches a direct double recompute") {
    val rows = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), round(col("l_quantity") * 100).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).view.mapValues { g =>
      val n = g.length.toDouble
      val sx = g.map(_._2.toDouble).sum; val sy = g.map(_._3.toDouble).sum
      val sxy = g.map(t => t._2.toDouble * t._3).sum
      val sxx = g.map(t => t._2.toDouble * t._2).sum
      val syy = g.map(t => t._3.toDouble * t._3).sum
      (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }.toMap
    q("q_corr_regr").collect().foreach { r =>
      val c = r.getDouble(1)
      assert(c >= -1.0 && c <= 1.0, s"corr out of range: $r")
      assert(math.abs(c - expected(r.getString(0))) < 2e-3,
        s"corr ${c} far from recompute ${expected(r.getString(0))}")
    }
  }

  test("q_mode: returns the true argmax count per lang") {
    val counts = Tables.documents(spark, sf0001)
      .groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val maxByLang = counts.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    q("q_mode").collect().foreach { r =>
      assert(r.getLong(2) == maxByLang(r.getString(0)), s"mode count not the max: $r")
    }
  }

  test("q_listagg: element lists are sorted and consistent with the distinct count") {
    q("q_listagg").collect().foreach { r =>
      val parts = r.getString(1).split(",").toSeq
      assert(parts == parts.sorted && parts.distinct == parts,
        s"listagg not sorted-distinct: $r")
      assert(parts.size.toLong == r.getLong(2), s"n_statuses mismatch: $r")
    }
  }

  test("q_weighted_median: half the weight sits on each side of the result") {
    val rows = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_quantity") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byFlag = rows.groupBy(_._1)
    q("q_weighted_median").collect().foreach { r =>
      val (flag, med) = (r.getString(0), r.getLong(1))
      val g = byFlag(flag)
      val tot = g.map(_._3).sum
      val below = g.filter(_._2 < med).map(_._3).sum   // strictly below median
      val upTo = g.filter(_._2 <= med).map(_._3).sum   // including median value
      assert(2 * below < tot && 2 * upTo >= tot,
        s"$flag: weighted median $med violates the half-weight property")
    }
  }

  test("q_having_global: shares of retained groups are each > 5% and <= 100%") {
    val rows = q("q_having_global").collect()
    rows.foreach { r =>
      val pct = r.getDouble(2)
      assert(pct > 5.0 - 0.01 && pct <= 100.0, s"share out of range: $r")
    }
    assert(rows.nonEmpty, "no group exceeds 5% of global — degenerate fixture")
  }

  test("q_decimal_exact: decimal sums equal the cents-BIGINT recompute exactly") {
    // output is DOUBLE (cast from the internal DECIMAL(18,2) — exact
    // below 2^53 cents; DECIMAL-typed output can't cross the driver's
    // parquet↔DuckDB hash boundary), so ×100 must recover integer cents
    val exact = Tables.orders(spark, sf0001)
      .groupBy("o_orderstatus")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q("q_decimal_exact").collect().foreach { r =>
      val cents = BigDecimal(r.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP) * 100
      assert(cents.isValidLong && cents.toLongExact == exact(r.getString(0)),
        s"double sum ${r.getDouble(1)} != cents recompute ${exact(r.getString(0))}")
    }
  }

  test("q_bitmap_distinct: bitmap popcounts equal COUNT(DISTINCT) exactly") {
    // per event_type, summed daily popcounts must equal the direct
    // distinct (user, day) count — bitmaps are exact, not a sketch
    val viaBitmap = q("q_bitmap_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Tables.events(spark, sf0001)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaBitmap == direct, s"bitmap=$viaBitmap direct=$direct")
    assert(viaBitmap.values.sum > 0)
  }

  test("q_outliers_mad: outliers are a minority and the MAD bound is honored") {
    q("q_outliers_mad").collect().foreach { r =>
      val (n, med, mad, out) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(out <= n / 2, s"MAD outliers cannot be a majority: $r")
      assert(med > 0 && mad >= 0, s"degenerate median/MAD: $r")
      // recompute one group's count independently — in INTEGERS, exactly
      // like the query (med_usd = med2/200, mad_usd = mad4/400 recover
      // the doubled medians exactly; a float |x−med| > 3·MAD recompute
      // could flip on rows landing exactly on the boundary)
      val med2 = math.round(med * 200)
      val mad4 = math.round(mad * 400)
      val cents = Tables.orders(spark, sf0001)
        .filter(col("o_orderstatus") === r.getString(0))
        .select(round(col("o_totalprice") * 100).cast("long")).collect().map(_.getLong(0))
      val recomputed = cents.count(c => 2 * math.abs(2 * c - med2) > 3 * mad4)
      assert(recomputed == out, s"${r.getString(0)}: recomputed $recomputed != $out")
    }
  }

  test("q_gini: coefficients sit in [0, 1) and a uniform fixture scores 0") {
    q("q_gini").collect().foreach { r =>
      val g = r.getDouble(3)
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $r")
    }
    // analytic check: equal values => G = 0 by the rank formula
    // (2·Σi·x − (n+1)·n·x) = x·(2·n(n+1)/2 − (n+1)·n) = 0
    val n = 100L; val x = 7L
    val s1 = (1L to n).map(_ * x).sum
    assert(2 * s1 - (n + 1) * n * x == 0L)
  }

  test("q_churn: churned counts bounded by active, weeks complete up to max-1") {
    val rows = q("q_churn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (wk, act, ch, pct) =>
      assert(ch <= act, s"week $wk: churned $ch > active $act")
      assert(pct >= 0.0 && pct <= 100.0, s"week $wk pct $pct")
    }
    // the final (unknowable) week must be excluded
    val allWeeks = Tables.events(spark, sf0001)
      .select(floor(datediff(to_date(col("ts")), lit("2024-01-01")) / 7).cast("long"))
      .distinct().collect().map(_.getLong(0))
    assert(rows.map(_._1).max == allWeeks.max - 1,
      "last reported churn week should be max_week - 1")
  }

  test("q_autocorr and q_tok_zipf land in their analytic ranges") {
    val ac = q("q_autocorr").collect()(0)
    assert(ac.getLong(0) > 0)
    assert(math.abs(ac.getDouble(1)) <= 1.0 + 1e-9, s"autocorr out of [-1,1]: $ac")
    val z = graft.queries.TextAnalysisQueries.queries("q_tok_zipf")(spark, sf0001).collect()(0)
    // sf0.001's synthetic vocab is tiny (31 tokens) — the fit uses
    // min(vocab, 200) points; at sf0.01+ it saturates at 200
    assert(z.getLong(0) >= 10 && z.getLong(0) <= 200,
      s"unexpected ranked-token count: $z")
    assert(z.getDouble(1) < 0.0, s"zipf slope must be negative for any real corpus: $z")
  }

  test("q_zorder: clusters are local — each spans at most 8 values per dimension") {
    // z_cluster = z >> 6 fixes the top 3 interleaved bits of each dim, so
    // within a cluster both dimensions vary by < 2^3
    val plan = q("q_zorder").collect()
    plan.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 7, s"qty not local in cluster: $r")
      assert(r.getLong(5) - r.getLong(4) <= 7, s"price-bucket not local in cluster: $r")
    }
    assert(plan.map(_.getLong(1)).sum == Tables.lineitem(spark, sf0001).count())
  }

  test("q_asof_tolerance: matched + expired + unmatched partitions the purchases") {
    graft.queries.EventQueries.queries("q_asof_tolerance")(spark, sf0001)
      .collect().foreach { r =>
        assert(r.getAs[Long]("n_purchases") == r.getAs[Long]("n_matched_1h")
          + r.getAs[Long]("n_expired") + r.getAs[Long]("n_unmatched"),
          s"tri-state does not partition n_purchases: $r")
      }
  }

  test("q_funnel_window: conversions never exceed clickers") {
    q("q_funnel_window").collect().foreach { r =>
      assert(r.getAs[Long]("n_conv") <= r.getAs[Long]("n_clicked"),
        s"more conversions than clickers: $r")
    }
  }

  test("q_histogram_eqd: deciles are balanced within one row per group") {
    q("q_histogram_eqd").collect().groupBy(_.getString(0)).values.foreach { g =>
      val ns = g.map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"unbalanced equi-depth deciles: ${g.toSeq}")
      assert(g.sortBy(_.getLong(1)).toSeq.sliding(2).forall {
        case Seq(a, b) => a.getLong(4) <= b.getLong(3) // hi(prev) <= lo(next)
        case _ => true
      }, s"decile bounds overlap: ${g.toSeq}")
    }
  }

  test("q_week_over_week / q_streaks / q_union_evolve conserve their totals") {
    val orderCents = Tables.orders(spark, sf0001)
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))).collect()(0).getLong(0)
    assert(q("q_week_over_week").agg(sum("rev_cents")).collect()(0).getLong(0) == orderCents)
    assert(q("q_union_evolve").agg(sum("sum_cents")).collect()(0).getLong(0) == orderCents)
    assert(q("q_streaks").agg(sum("n_events")).collect()(0).getLong(0) ==
      Tables.events(spark, sf0001).count())
  }

  test("q_sample_join: sampled customer count bounds the distinct customers seen") {
    val nSampled = Tables.customer(spark, sf0001)
      .filter(md5(col("c_custkey").cast("string")) < "1a").count()
    val seen = q("q_sample_join").agg(sum("n_customers")).collect()(0).getLong(0)
    assert(seen <= nSampled * 3, // a customer can appear under each status
      s"more sampled customers seen ($seen) than exist x statuses (${nSampled * 3})")
    assert(seen > 0, "empty sample — degenerate fixture")
  }

  test("q_pmi_cooccur: support never exceeds either marginal doc-frequency") {
    val df = Tables.documents(spark, sf0001)
      .select(explode(array_distinct(filter(
        split(lower(col("text")), "[ \\t\\n\\r\\f]+"), t => t =!= ""))).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q("q_pmi_cooccur").collect().foreach { r =>
      val (t1, t2, nCo) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(t1 < t2, "pair not in canonical order")
      assert(nCo <= math.min(df(t1), df(t2)), s"support $nCo exceeds marginals for ($t1,$t2)")
    }
  }

  test("q_corr_spearman matches a driver-side rank recomputation exactly") {
    val data = Tables.orders(spark, sf0001)
      .select(col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long"),
        date_format(col("o_orderdate"), "yyyyMMdd").cast("long"),
        col("o_orderkey"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = data.groupBy(_._1).map { case (st, g) =>
      // the query's exact tie order: (value, o_orderkey) — o_orderkey is
      // the table's unique key, so the permutation is well-defined
      val rx = g.sortBy(t => (t._2, t._4)).zipWithIndex
        .map { case (t, i) => t._4 -> (i + 1).toLong }.toMap
      val ry = g.sortBy(t => (t._3, t._4)).zipWithIndex
        .map { case (t, i) => t._4 -> (i + 1).toLong }.toMap
      val sd2 = g.map { t => val d = rx(t._4) - ry(t._4); d * d }.sum.toDouble
      val nd = g.length.toDouble
      val rho = 1.0 - 6.0 * sd2 / (nd * nd * nd - nd)
      st -> (g.length.toLong, math.floor(rho * 1000.0 + 0.5) / 1000.0)
    }
    val got = q("q_corr_spearman").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expected, s"spearman drift: got $got expected $expected")
    got.values.foreach { case (_, rho) => assert(rho >= -1.0 && rho <= 1.0) }
  }

  test("q_argmax_group picks the same extremes as a full driver-side scan") {
    val names = Tables.nation(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val byNation = Tables.customer(spark, sf0001)
      .select(col("c_nationkey"), col("c_custkey"), round(col("c_acctbal") * 100).cast("long"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = byNation.map { case (nk, g) =>
      val top = g.maxBy(t => (t._3, t._2)); val bot = g.minBy(t => (t._3, t._2))
      names(nk) -> (top._2, top._3, bot._2, bot._3, g.length.toLong)
    }
    val got = q("q_argmax_group").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == expected, s"argmax drift: got $got expected $expected")
  }

  test("q_vocab_growth conserves tokens/types and its cumulatives are monotone") {
    val rows = graft.queries.TextAnalysisQueries.queries("q_vocab_growth")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == (0L to 9L), s"deciles not 0..9: ${rows.map(_._1).toSeq}")
    val toks = Tables.documents(spark, sf0001)
      .select(explode(filter(split(lower(col("text")), "[ \\t\\n\\r\\f]+"), t => t =!= "")).as("tok"))
    assert(rows.map(_._3).sum == toks.count(), "token mass not conserved across deciles")
    assert(rows.map(_._4).sum == toks.distinct().count(),
      "sum of new_types must equal the corpus vocabulary size")
    assert(rows.map(_._2).sum == Tables.documents(spark, sf0001).count(), "docs not conserved")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 >= a._5 && b._6 >= a._6, s"cumulative curve not monotone: $a -> $b")
    }
    assert(rows.last._5 == rows.map(_._3).sum && rows.last._6 == rows.map(_._4).sum,
      "final cumulatives must equal the totals")
  }

  test("q_rolling_7d equals a driver-side trailing-window recomputation") {
    val daily = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(expr("datediff(to_date(ts), date'1970-01-01')").cast("long").as("dn"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (dn, g) => (dn, g.map(_._2).sum, g.length.toLong) }
      .toSeq.sortBy(_._1)
    val expected = daily.map { case (dn, _, _) =>
      val frame = daily.filter(d => d._1 >= dn - 6 && d._1 <= dn)
      val rc = frame.map(_._2).sum; val rd = frame.length.toLong
      dn -> (rc, rd, math.floor(rc.toDouble / rd.toDouble / 100.0 * 100.0 + 0.5) / 100.0)
    }.toMap
    val got = graft.queries.EventQueries.queries("q_rolling_7d")(spark, sf0001).collect()
      .map { r =>
        val dn = java.time.LocalDate.parse(r.getString(0)).toEpochDay
        dn -> (r.getLong(3), r.getLong(4), r.getDouble(5))
      }.toMap
    assert(got == expected, s"rolling drift: got $got expected $expected")
    assert(expected.size > 7, "fewer than 8 purchase days at sf0.001 — frame test is vacuous")
  }

  test("q_chi2_tokens matches a float chi-square recomputation within the micro grid") {
    val cells = Tables.documents(spark, sf0001)
      .select(col("source"), explode(filter(split(lower(col("text")), "[ \\t\\n\\r\\f]+"),
        t => t =!= "")).as("term"))
      .groupBy("term", "source").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nt = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ms = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val mm = cells.map(_._3).sum.toDouble
    val chi = nt.keys.map { t =>
      t -> ms.keys.map { s =>
        val c = cells.find(x => x._1 == t && x._2 == s).map(_._3).getOrElse(0L).toDouble
        val e = nt(t) * ms(s) / mm
        (c - e) * (c - e) / e
      }.sum
    }.toMap
    val got = graft.queries.TextAnalysisQueries.queries("q_chi2_tokens")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 20, s"expected top-20, got ${got.length}")
    got.foreach { case (t, n, x) =>
      assert(n == nt(t), s"term total drift for $t")
      assert(x >= 0.0, s"negative chi2 for $t")
      // each of the |sources| cells floors away < 1e-6; float recompute
      // differs only by that and ulp noise
      assert(math.abs(x - chi(t)) < 1e-3, s"chi2 drift for $t: $x vs ${chi(t)}")
    }
    // the query's top-20 is the true top-20 of the full statistic
    val top = chi.toSeq.sortBy { case (t, x) => (-x, t) }.take(20).map(_._1)
    assert(got.map(_._1).toSeq == top, "top-20 ordering diverged from the full recompute")
  }

  test("q_ecdf_ks equals a driver-side exact KS recomputation") {
    val lens = Tables.documents(spark, sf0001)
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val l0 = lens.filter(_._1 == "src0").map(_._2).sorted
    val l1 = lens.filter(_._1 == "src1").map(_._2).sorted
    val support = (l0 ++ l1).distinct.sorted
    val best = support.map { v =>
      val c0 = l0.count(_ <= v).toLong; val c1 = l1.count(_ <= v).toLong
      (v, math.abs(c0 * l1.length - c1 * l0.length))
    }.sortBy { case (v, d) => (-d, v) }.head
    val r = graft.queries.AnalyticsQueries.queries("q_ecdf_ks")(spark, sf0001).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == best._1, s"KS location drift: ${r(0).getLong(0)} vs ${best._1}")
    assert(r(0).getLong(1) == l0.length.toLong && r(0).getLong(2) == l1.length.toLong)
    assert(r(0).getLong(3) == best._2, s"KS numerator drift: ${r(0).getLong(3)} vs ${best._2}")
    val ks = r(0).getDouble(4)
    assert(ks >= 0.0 && ks <= 1.0, s"KS out of range: $ks")
    assert(best._2 > 0, "identical ECDFs at sf0.001 — KS test is vacuous")
  }

  test("q_ab_ttest equals a driver-side Welch recomputation from exact moments") {
    val cs = Tables.events(spark, sf0001).filter(col("event_type") === "purchase")
      .select(pmod(col("user_id"), lit(2)).cast("long"),
        floor(col("value") * 100 + lit(0.5)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def mom(g: Long) = {
      val v = cs.filter(_._1 == g).map(_._2)
      (v.length.toLong, v.sum, v.map(c => BigInt(c) * BigInt(c)).sum)
    }
    val (n0, s0, q0) = mom(0); val (n1, s1, q1) = mom(1)
    val m0 = s0.toDouble / n0.toDouble; val m1 = s1.toDouble / n1.toDouble
    val v0 = (BigInt(n0) * q0 - BigInt(s0) * BigInt(s0)).toDouble / (n0 * (n0 - 1)).toDouble
    val v1 = (BigInt(n1) * q1 - BigInt(s1) * BigInt(s1)).toDouble / (n1 * (n1 - 1)).toDouble
    val t = (m0 - m1) / math.sqrt(v0 / n0.toDouble + v1 / n1.toDouble)
    val r = graft.queries.AnalyticsQueries.queries("q_ab_ttest")(spark, sf0001).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == n0 && r(0).getLong(1) == n1)
    assert(r(0).getDouble(2) == math.floor(m0 / 100.0 * 100.0 + 0.5) / 100.0)
    assert(r(0).getDouble(3) == math.floor(m1 / 100.0 * 100.0 + 0.5) / 100.0)
    assert(r(0).getDouble(4) == math.floor(t * 1000.0 + 0.5) / 1000.0,
      s"t-stat drift: ${r(0).getDouble(4)} vs $t")
    assert(n0 > 30 && n1 > 30, "cohorts too small at sf0.001 — t-test is vacuous")
  }

  test("q_decile_lift conserves segment totals and orders lift with spend") {
    val rows = q("q_decile_lift").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val bySeg = rows.groupBy(_._1)
    val spend = Tables.orders(spark, sf0001)
      .groupBy("o_custkey").agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .join(Tables.customer(spark, sf0001)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")), "o_custkey")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((seg, g) <- bySeg) {
      assert(g.map(_._2).sorted.toSeq == (1L to 10L), s"$seg deciles not 1..10")
      assert(g.map(_._3).sum == spend(seg)._1, s"$seg customer count not conserved")
      assert(g.map(_._4).sum == spend(seg)._2, s"$seg cents not conserved")
      val byDec = g.sortBy(_._2)
      // decile 1 holds the biggest spenders: lift must be >= 1 and the
      // per-decile revenue non-increasing
      assert(byDec.head._6 >= 1.0, s"$seg top-decile lift < 1")
      byDec.map(_._4).sliding(2).foreach { case Array(a, b) =>
        assert(a >= b, s"$seg decile revenue not non-increasing") }
      g.foreach { r => assert(r._5 >= 0.0 && r._5 <= 1.0, s"$seg share out of range") }
    }
  }

  test("q_market_share: shares are consistent and revenue conserves vs a flat recompute") {
    val rows = graft.queries.RelationalQueries.queries("q_market_share")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty, "no ASIA/PROMO revenue at sf0.001 — query is vacuous")
    rows.foreach { case (yr, n, tot, n0, share) =>
      assert(n > 0 && tot > 0 && n0 >= 0 && n0 <= tot, s"degenerate year row $yr")
      assert(share == math.floor(n0.toDouble / tot.toDouble * 1000.0 + 0.5) / 1000.0,
        s"share not the declared ratio for year $yr")
    }
    // independent single-SQL recompute of the total revenue mass
    val flat = spark.sql(s"""
      SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
      FROM parquet.`$sf0001/lineitem.parquet` l
      JOIN parquet.`$sf0001/part.parquet` p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
      JOIN parquet.`$sf0001/orders.parquet` o ON l.l_orderkey = o.o_orderkey
      JOIN parquet.`$sf0001/customer.parquet` c ON o.o_custkey = c.c_custkey
      JOIN parquet.`$sf0001/nation.parquet` n ON c.c_nationkey = n.n_nationkey
      JOIN parquet.`$sf0001/region.parquet` r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'""").collect()(0).getLong(0)
    assert(rows.map(_._3).sum == flat, "total revenue mass diverged from the flat recompute")
  }

  test("q_grouping_id: gid levels partition the rollup and conserve the total") {
    val rows = graft.queries.AggQueries.queries("q_grouping_id")(spark, sf0001).collect()
      .map(r => (Option(r.getString(0)), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = Tables.customer(spark, sf0001).count()
    val grand = rows.filter(_._3 == 3L)
    assert(grand.length == 1 && grand.head._4 == total, "grand-total row wrong")
    assert(rows.filter(_._3 == 1L).map(_._4).sum == total, "segment subtotals don't conserve")
    assert(rows.filter(_._3 == 0L).map(_._4).sum == total, "detail rows don't conserve")
    rows.foreach { case (seg, nk, gid, _, _) =>
      assert(Set(0L, 1L, 3L)(gid), s"unexpected gid $gid")
      if (gid == 0L) assert(seg.isDefined && nk.isDefined, "detail row with NULL keys")
      if (gid == 1L) assert(seg.isDefined && nk.isEmpty, "segment subtotal shape wrong")
      if (gid == 3L) assert(seg.isEmpty && nk.isEmpty, "grand total shape wrong")
    }
  }

  test("q_basket_lift equals a driver-side association recomputation") {
    val ob = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val n = ob.map(_._1).distinct.length.toLong
    val ca = ob.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cab = ob.groupBy(_._1).values.flatMap { g =>
      val bs = g.map(_._2).sorted
      for (i <- bs.indices; j <- (i + 1) until bs.length) yield (bs(i), bs(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 5L).toMap
    val expected = cab.map { case ((b1, b2), c) =>
      (b1, b2) -> (c, ca(b1), ca(b2), c * n * 1000000L / (ca(b1) * ca(b2)))
    }.toSeq.sortBy { case ((b1, b2), t) => (-t._4, b1, b2) }.take(20)
    val got = q("q_basket_lift").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          math.round(r.getDouble(5) * 1000000.0))))
    assert(got.toSeq == expected, s"basket lift drift:\n got ${got.take(3).toSeq}\n exp ${expected.take(3)}")
    assert(expected.nonEmpty, "no supported pairs at sf0.001 — lift test is vacuous")
  }

  test("q_benford: digit census conserves orders and expectation matches ln recompute") {
    val rows = q("q_benford").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(rows.map(_._1).forall(d => d >= 1 && d <= 9), "non-digit row")
    val total = Tables.orders(spark, sf0001)
      .filter(round(col("o_totalprice") * 100).cast("long") > 0).count()
    assert(rows.map(_._2).sum == total, "digit census lost orders")
    rows.foreach { case (d, _, share, p, dev) =>
      val expP = math.floor(math.log(1.0 + 1.0 / d.toDouble) / math.log(10.0) * 1e6 + 0.5) / 1e6
      assert(p == expP, s"benford_p drift for digit $d: $p vs $expP")
      assert(share >= 0.0 && share <= 1.0 && dev >= 0L)
    }
    // shares are floors of exact micro ratios: they sum to <= 1 and
    // within 9 micro of it
    val sm = rows.map(r => math.round(r._3 * 1e6)).sum
    assert(sm <= 1000000L && sm >= 1000000L - 9L, s"share mass $sm out of the floor envelope")
  }

  test("q_epoch_shards conserves docs per epoch and actually reshuffles between epochs") {
    val rows = graft.queries.TextAnalysisQueries.queries("q_epoch_shards")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val nDocs = Tables.documents(spark, sf0001).count()
    for (e <- 0L to 2L) {
      val g = rows.filter(_._1 == e)
      assert(g.map(_._2).toSet.subsetOf((0L to 7L).toSet), s"epoch $e has a bad shard id")
      assert(g.map(_._3).sum == nDocs, s"epoch $e lost documents")
      g.foreach { r => assert(r._5 > 0.0, s"degenerate balance in epoch $e") }
    }
    // the per-(doc, epoch) hash must actually differ across epochs for
    // most docs — otherwise every epoch replays the same shard order
    val a = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        pmod(conv(substring(md5(concat(col("doc_id").cast("string"), lit(":0"))), 1, 4), 16, 10)
          .cast("long"), lit(8L)).as("s0"),
        pmod(conv(substring(md5(concat(col("doc_id").cast("string"), lit(":1"))), 1, 4), 16, 10)
          .cast("long"), lit(8L)).as("s1"))
      .filter(col("s0") =!= col("s1")).count()
    assert(a > nDocs / 2, s"only $a/$nDocs docs moved shards between epochs")
  }

  test("q_volume_ship (raw SQL entry) equals the DataFrame-API formulation") {
    val sql = graft.queries.RelationalQueries.queries("q_volume_ship")(spark, sf0001)
      .collect().toSeq
    val sn = Tables.supplier(spark, sf0001)
      .join(Tables.nation(spark, sf0001), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cn = Tables.customer(spark, sf0001)
      .join(Tables.nation(spark, sf0001), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val df = Tables.lineitem(spark, sf0001)
      .join(sn, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .join(cn, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .withColumn("rev_cc", round(col("l_extendedprice") * 100).cast("long")
        * (lit(100L) - round(col("l_discount") * 100).cast("long")))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n_lines"), sum(col("rev_cc")).as("rev_cc"))
      .orderBy("supp_nation", "cust_nation", "yr")
      .collect().toSeq
    assert(sql == df, "SQL-text entry diverged from the DataFrame formulation")
    assert(sql.nonEmpty, "empty trade matrix at sf0.001 — parity test is vacuous")
  }

  test("q_asof_forward matches a driver-side earliest-later-purchase scan") {
    val ev = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val gaps = byUser.values.flatMap { g =>
      val purchases = g.filter(_._2 == "purchase")
      g.filter(_._2 == "click").flatMap { c =>
        // strictly later: same-ts purchases are excluded (they sort first)
        val later = purchases.filter(p => p._3 > c._3)
        if (later.isEmpty) None
        else Some((c._1 % 10, later.map(_._3).min - c._3))
      }
    }.toSeq
    val expected = gaps.groupBy(_._1).map { case (b, g) =>
      val s = g.map(_._2).sum
      b -> (g.length.toLong,
        math.floor(s.toDouble / g.length / 1000000.0 * 100.0 + 0.5) / 100.0)
    }
    val got = graft.queries.EventQueries.queries("q_asof_forward")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expected, s"forward as-of drift: got $got expected $expected")
    assert(expected.values.map(_._1).sum > 50, "too few matches at sf0.001 — test is vacuous")
  }
}
