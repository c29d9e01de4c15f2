package graft.queries

import graft.Tables
import graft.functions.TopKAgg
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SURVEY §2.11 — the user-extension surface: scalar UDF, typed
  * Aggregator UDAF, and a generator (UDTF-style flatMap).
  *
  * These deliberately exercise the *extension* APIs rather than builtins
  * (the oracle re-expresses each as plain SQL arithmetic). Production
  * guidance stays "functions over UDFs" — see ScalarFuncQueries — but an
  * engine must still offer the escape hatch.
  */
object UdxQueries extends QueryGroup {

  /** Weighted mean: sum(w*x)/sum(w), merged associatively — safe for
    * partial aggregation across partitions at any scale. */
  object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Double)): Double = if (b._2 == 0.0) 0.0 else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Exact-integer variant for the oracle-gated query: inputs are cents
    * (price_c, qty_c), the buffer holds exact Long sums (order-free, so
    * partial aggregation can't perturb the result), and finish divides
    * once — the only float op, identical bits in both engines even when
    * the numerator exceeds 2^53 (the same integer rounds to the same
    * double everywhere). Result unit: price cents. */
  object WeightedAvgExact extends Aggregator[(Long, Long), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), in: (Long, Long)): (Long, Long) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Long, Long)): Double = if (b._2 == 0L) 0.0 else b._1.toDouble / b._2.toDouble
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Map[String, QFn] = Map(
    // scalar UDF over exact integer micro-units (price-cents × discount
    // points × tax points = 1e-6 dollars): the score's true value is a
    // 6dp decimal, so double averaging could land on the half-grid where
    // round() is engine-dependent (§7.3.13); Long arithmetic is exact and
    // the single final division is bit-identical across engines.
    "q_udf_scalar" -> ((s, d) => {
      s.udf.register("price_score_u",
        (priceC: Long, discP: Long, taxP: Long) => priceC * (100L - discP) * (100L + taxP))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .withColumn("price_c", round(col("l_extendedprice") * 100).cast("long"))
        .withColumn("disc_p", round(col("l_discount") * 100).cast("long"))
        .withColumn("tax_p", round(col("l_tax") * 100).cast("long"))
        .withColumn("score_u", expr("price_score_u(price_c, disc_p, tax_p)"))
        .groupBy("p_brand")
        .agg(r2(sum(col("score_u")).cast("double") / count(lit(1)) / 1000000.0).as("avg_score"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    }),

    "q_udaf_weighted" -> ((s, d) => {
      import s.implicits._
      val wavg = udaf(WeightedAvgExact)
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .withColumn("price_c", round(col("l_extendedprice") * 100).cast("long"))
        .withColumn("qty_c", round(col("l_quantity") * 100).cast("long"))
        .groupBy("p_brand")
        .agg(r2(wavg(col("price_c"), col("qty_c")) / 100.0).as("wavg_price"))
        .orderBy("p_brand")
    }),

    // native codegen'd Catalyst expression (graft.functions
    // .ArrayCosineSimilarity) — the top rung of the extension ladder:
    // no boxing/serialization, fused into whole-stage codegen. Computes
    // cosine(embedding, reverse(embedding)) per vector.
    "q_native_cosine" -> ((s, d) => {
      Tables.embeddings(s, d)
        .withColumn("v", transform(col("embedding"), x => x.cast("double")))
        .select(col("vec_id"),
          r3(expr("graft_cosine(v, reverse(v))")).as("cos_rev"))
        .orderBy("vec_id")
    }),

    // generator: doc -> word bigrams (flatMap = UDTF surface; composes
    // with the relational layer exactly like posexplode).
    "q_udtf_bigrams" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), lower(col("text")).as("t")).as[(Long, String)]
        .flatMap { case (_, t) =>
          t.split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty).sliding(2).collect {
            case Array(a, b) => a + " " + b
          }
        }
        .toDF("bigram")
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(10)
    }),

    // ---- bounded partial top-k aggregator (ORACLE) -----------------------
    // graft.functions.TopKAgg: top-3 orders per status as a HASH AGGREGATE
    // whose buffer never exceeds k pairs — map-side combine ships ≤k rows
    // per group per task, O(groups·k) shuffle motion, vs the window
    // row_number form that sorts every group member on one reducer (the
    // hot-group killer at 100 TB). The oracle IS that window form, so the
    // gate proves the aggregator equals the sort semantics (score desc,
    // key asc) it replaces.
    "q_topk_peragg" -> ((s, d) => {
      val topk = udaf(TopKAgg(3), Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .groupBy("o_orderstatus")
        .agg(topk(col("cents"), col("o_orderkey")).as("top"))
        .select(col("o_orderstatus"), posexplode(col("top")))
        .select(col("o_orderstatus"), (col("pos") + 1).cast("long").as("rank"),
          col("col._2").as("o_orderkey"), col("col._1").as("cents"))
        .orderBy("o_orderstatus", "rank")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_udf_scalar" ->
      ("SELECT p_brand, floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) " +
        "* (100 - CAST(round(l_discount * 100) AS BIGINT)) * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE) " +
        "/ count(*) / 1000000.0 * 100.0 + 0.5) / 100.0 AS avg_score, " +
        "count(*) AS n FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "GROUP BY p_brand ORDER BY p_brand"),
    "q_udaf_weighted" ->
      ("SELECT p_brand, floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) " +
        "/ CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS wavg_price " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand ORDER BY p_brand"),
    "q_native_cosine" ->
      ("SELECT vec_id, floor(list_cosine_similarity(CAST(embedding AS DOUBLE[]), " +
        "list_reverse(CAST(embedding AS DOUBLE[]))) * 1000.0 + 0.5) / 1000.0 AS cos_rev " +
        "FROM embeddings ORDER BY vec_id"),
    "q_udtf_bigrams" ->
      ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+'), x -> x <> '') AS toks " +
        "FROM documents), " +
        "idx AS (SELECT unnest(generate_series(1, (SELECT max(len(toks)) FROM d))) AS i), " +
        "b AS (SELECT toks[i] || ' ' || toks[i + 1] AS bigram FROM d, idx WHERE i <= len(toks) - 1) " +
        "SELECT bigram, count(*) AS n FROM b GROUP BY bigram ORDER BY n DESC, bigram LIMIT 10"),
    // the window form the aggregator replaces — equality proves the
    // partial-agg top-k preserves sort semantics
    "q_topk_peragg" ->
      ("WITH r AS (SELECT o_orderstatus, o_orderkey, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents, " +
        "row_number() OVER (PARTITION BY o_orderstatus " +
        "ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey) AS rn FROM orders) " +
        "SELECT o_orderstatus, CAST(rn AS BIGINT) AS rank, o_orderkey, cents " +
        "FROM r WHERE rn <= 3 ORDER BY o_orderstatus, rank"),
  )
}
