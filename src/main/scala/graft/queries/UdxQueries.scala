package graft.queries

import graft.Tables
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

  val queries: Map[String, QFn] = Map(
    "q_udf_scalar" -> ((s, d) => {
      s.udf.register("price_score",
        (price: Double, disc: Double, tax: Double) => price * (1.0 - disc) * (1.0 + tax))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .withColumn("score", expr("price_score(l_extendedprice, l_discount, l_tax)"))
        .groupBy("p_brand")
        .agg(round(avg(col("score")), 2).as("avg_score"), count(lit(1)).as("n"))
        .orderBy("p_brand")
    }),

    "q_udaf_weighted" -> ((s, d) => {
      val wavg = udaf(WeightedAvg)
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 2).as("wavg_price"))
        .orderBy("p_brand")
    }),

    // native codegen'd Catalyst expression (graft.functions
    // .ArrayCosineSimilarity) — the top rung of the extension ladder:
    // no boxing/serialization, fused into whole-stage codegen. Computes
    // cosine(embedding, reverse(embedding)) per vector.
    "q_native_cosine" -> ((s, d) => {
      graft.functions.ArrayCosineSimilarity.register(s)
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
  )

  val oracleSql: Map[String, String] = Map(
    "q_udf_scalar" ->
      ("SELECT p_brand, round(avg(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS avg_score, " +
        "count(*) AS n FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "GROUP BY p_brand ORDER BY p_brand"),
    "q_udaf_weighted" ->
      ("SELECT p_brand, round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS wavg_price " +
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
  )
}
