package graft

import graft.functions.ArrayCosineSimilarity
import org.apache.spark.sql.functions._

/** The native codegen'd cosine expression: registration, agreement with
  * the declarative HOF formulation bit-for-bit, and codegen activation. */
class NativeExpressionSpec extends SparkSpec {

  test("graft_cosine registers idempotently and evaluates") {
    ArrayCosineSimilarity.register(spark)
    ArrayCosineSimilarity.register(spark) // second call is a no-op
    val r = spark.sql("SELECT graft_cosine(array(1.0d, 2.0d), array(2.0d, 1.0d)) AS c").collect()
    assert(math.abs(r.head.getDouble(0) - 0.8) < 1e-12)
  }

  test("bit-identical to the declarative HOF cosine on real embeddings") {
    ArrayCosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, sf0001)
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      .withColumn("r", reverse(col("v")))
    val both = e.select(
      expr("graft_cosine(v, r)").as("native"),
      (aggregate(zip_with(col("v"), col("r"), (x, y) => x * y), lit(0.0), (a, x) => a + x)
        / (sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x))
          * sqrt(aggregate(col("r"), lit(0.0), (a, x) => a + x * x)))).as("hof"))
    val mismatches = both.filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0, s"$mismatches rows where native != HOF (bitwise)")
  }

  test("expression participates in whole-stage codegen") {
    ArrayCosineSimilarity.register(spark)
    val plan = Tables.embeddings(spark, sf0001)
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      .select(expr("graft_cosine(v, reverse(v))"))
      .queryExecution.executedPlan
    // the `*(n)` prefix marks operators inside a WholeStageCodegen span
    val line = plan.toString.linesIterator.find(_.contains("graft_cosine"))
    assert(line.exists(_.trim.startsWith("*")),
      s"graft_cosine not inside a codegen span:\n$plan")
  }

  test("null and type safety") {
    ArrayCosineSimilarity.register(spark)
    val r = spark.sql("SELECT graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS c").collect()
    assert(r.head.isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT graft_cosine('abc', array(1.0d))").collect()
    }
  }

  private def lshCol(v: org.apache.spark.sql.Column, first: Int, bits: Int) =
    org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.LshSignature(
        org.apache.spark.sql.GraftPlanBridge.expression(v), first, bits))

  test("graft_lsh_sig equals the per-bit HOF fold on real embeddings") {
    // the kernel replaced one aggregate(zip_with) fold PER BIT — every
    // signature must be bit-identical to that declarative form
    import graft.functions.Hyperplanes
    def hofDot(v: org.apache.spark.sql.Column, w: Array[Double]) =
      aggregate(zip_with(v, array(w.map(lit): _*), (x, y) => x * y),
        lit(0.0), (a, x) => a + x)
    val e = Tables.embeddings(spark, sf0001)
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
    val hofSig = (0 until 16)
      .map(j => when(hofDot(col("v"), Hyperplanes.plane(j)) >= 0.0, 1L << j).otherwise(0L))
      .reduce(_ + _)
    val mismatches = e.select(lshCol(col("v"), 0, 16).as("native"), hofSig.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0, s"$mismatches signature mismatches vs the HOF form")
  }

  test("graft_lsh_sig codegen agrees with interpreted eval and is codegen-resident") {
    // plain Cast (codegen-able) instead of the transform HOF: a HOF in
    // the same projection would drag the whole Project out of
    // whole-stage codegen and the test would exercise the wrong path
    val e = Tables.embeddings(spark, sf0001)
      .withColumn("v", col("embedding").cast("array<double>"))
    val viaCodegen = e.select(col("vec_id"), lshCol(col("v"), 8, 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // interpreted path: evaluate the expression directly on driver rows
    val expr0 = graft.functions.LshSignature(
      org.apache.spark.sql.GraftPlanBridge.expression(col("v")), 8, 8)
    val interpreted = e.select(col("vec_id"), col("v")).collect().map { r =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        r.getSeq[Double](1).toArray)
      r.getLong(0) -> expr0.nullSafeEval(arr).asInstanceOf[Long]
    }.toMap
    assert(viaCodegen == interpreted, "codegen and interpreted signatures diverge")
    val plan = e.select(lshCol(col("v"), 0, 16)).queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_lsh_sig"))
    assert(line.exists(_.trim.startsWith("*")),
      s"graft_lsh_sig not inside a codegen span:\n$plan")
  }

  test("graft_lsh_sig null vector yields null, signatures land in [0, 2^bits)") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq(1.0, -2.0))), (2L, None))
      .toDF("id", "v")
    val rows = df.select(col("id"), lshCol(col("v"), 0, 8).as("s")).collect()
    val byId = rows.map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(byId(2L).isEmpty, "null vector must produce a null signature")
    assert(byId(1L).exists(s => s >= 0L && s < 256L), s"signature out of range: $byId")
  }

  test("graft_jaro: textbook values, symmetry, bounds, codegen-resident") {
    import graft.functions.JaroWinklerKernel.jw
    // classic published pairs (Winkler spec with the 0.7 boost gate)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-10)
    assert(jw("abc", "xyz") == 0.0 && jw("same", "same") == 1.0)
    assert(jw("", "x") == 0.0 && jw("", "") == 1.0)
    // boost gate: below-0.7 jaro must NOT get the prefix bonus
    import graft.functions.JaroWinklerKernel.jaro
    val pairsBelow = Seq(("abcdxxxxx", "abzzzz"))
    pairsBelow.foreach { case (a, b) =>
      if (jaro(a, b) <= 0.7) assert(jw(a, b) == jaro(a, b), s"boost leaked for $a/$b")
    }
    // symmetry over corpus words
    graft.functions.JaroWinkler.register(spark)
    val words = Tables.documents(spark, sf0001)
      .select(explode(split(lower(col("text")), "[ \\t\\n\\r\\f]+")).as("w"))
      .filter(col("w") =!= "").distinct().collect().map(_.getString(0))
    for (a <- words.take(12); b <- words.take(12))
      assert(jw(a, b) == jw(b, a), s"asymmetric on $a/$b")
    // SQL registration + codegen span on a real scan
    val r = spark.sql("SELECT graft_jaro('martha', 'marhta') AS s").head.getDouble(0)
    assert(math.abs(r - 0.9611111111111111) < 1e-12)
    val plan = Tables.documents(spark, sf0001)
      .select(expr("graft_jaro(text, source)")).queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_jaro"))
    assert(line.exists(_.trim.startsWith("*")),
      s"graft_jaro not inside a codegen span:\n$plan")
  }

  test("graft_normalize: NFC composition matches java.text.Normalizer, codegen == interpreted") {
    import spark.implicits._
    graft.functions.NormalizeNfc.register(spark)
    // decomposed e + U+0301, precomposed é, ASCII (fast path), null
    val cases = Seq((1L, Some("cafe\u0301")), (2L, Some("caf\u00e9")),
      (3L, Some("plain ascii")), (4L, None))
    val df = cases.toDF("id", "s")
    val out = df.select(col("id"), expr("graft_normalize(s)").as("n")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    cases.foreach { case (id, in) =>
      val expected = in.map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
      assert(out(id) == expected, s"id=$id: ${out(id)} != $expected")
    }
    assert(out(1L) == out(2L), "decomposed and precomposed forms must normalize equal")
    assert(out(1L).get.length == 4, "NFC must compose e+combining-acute to one char")
    // codegen vs interpreted: evaluate the expression directly
    val e0 = graft.functions.NormalizeNfc(
      org.apache.spark.sql.GraftPlanBridge.expression(col("s")))
    cases.collect { case (id, Some(in)) =>
      val interp = e0.nullSafeEval(
        org.apache.spark.unsafe.types.UTF8String.fromString(in)).toString
      assert(out(id).contains(interp), s"id=$id codegen ${out(id)} != interpreted $interp")
    }
    // and it runs inside a codegen span (on a real scan — a literal local
    // table constant-folds to LocalTableScan with no codegen stage at all)
    val plan = Tables.documents(spark, sf0001)
      .select(expr("graft_normalize(text)")).queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_normalize"))
    assert(line.exists(_.trim.startsWith("*")),
      s"graft_normalize not inside a codegen span:\n$plan")
  }

  // ---- round-8 sketch probes (replaced the last two hot-path UDFs) ----

  test("graft_bloom_contains agrees with the driver-side sketch and stays in codegen") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), substring(col("text"), 1, 16).as("fp"))
    val bloom = docs.filter(col("doc_id") % 2 === 0).stat
      .bloomFilter("fp", 1000L, 0.01)
    val probe = org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.BloomMightContain(
        org.apache.spark.sql.GraftPlanBridge.expression(col("fp")), bloom))
    val rows = docs.select(col("fp"), probe.as("native")).collect()
    rows.foreach { r =>
      assert(r.getBoolean(1) == bloom.mightContain(r.getString(0)),
        s"probe mismatch for ${r.getString(0)}")
    }
    val plan = docs.filter(probe).queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_bloom_contains"))
    assert(line.exists(_.contains("*(")),
      s"graft_bloom_contains not inside a codegen span:\n$plan")
  }

  test("graft_cms_atleast agrees with the driver-side sketch and stays in codegen") {
    val toksDf = Tables.documents(spark, sf0001)
      .select(explode(split(lower(col("text")), "[ \\t\\n\\r\\f]+")).as("tok"))
      .filter(col("tok") =!= "")
    val cms = toksDf.stat.countMinSketch("tok", 0.0001, 0.99, 42)
    val t = cms.totalCount() / 500L + 1L
    val probe = org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.CmsAtLeast(
        org.apache.spark.sql.GraftPlanBridge.expression(col("tok")), cms, t))
    val sample = toksDf.limit(200).select(col("tok"), probe.as("native")).collect()
    sample.foreach { r =>
      assert(r.getBoolean(1) == (cms.estimateCount(r.getString(0)) >= t),
        s"probe mismatch for ${r.getString(0)}")
    }
    val plan = toksDf.filter(probe).queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_cms_atleast"))
    assert(line.exists(_.contains("*(")),
      s"graft_cms_atleast not inside a codegen span:\n$plan")
  }

  test("graft_linear_score: milli mean weight per token, OOV → 0, codegen-resident") {
    val w = Map("alpha" -> 3L, "beta" -> 5L)
    def score(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftPlanBridge.column(
        graft.functions.LinearTextScore(
          org.apache.spark.sql.GraftPlanBridge.expression(c), w))
    val df = Tables.documents(spark, sf0001).limit(1)
      .select(lit("alpha beta  gamma alpha").as("t"), lit("").as("empty"))
    // (3+5+0+3)·1000 / 4 tokens = 2750; zero-token doc scores 0
    val row = df.select(score(col("t")), score(col("empty"))).collect().head
    assert(row.getLong(0) == 2750L && row.getLong(1) == 0L)
    val plan = Tables.documents(spark, sf0001)
      .select(score(lower(col("text")))).queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_linear_score"))
    assert(line.exists(_.contains("*(")),
      s"graft_linear_score not inside a codegen span:\n$plan")
  }
}
