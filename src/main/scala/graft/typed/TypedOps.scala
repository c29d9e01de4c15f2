package graft.typed

import graft.Tables
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset[T] surface (SURVEY §1.2: DataFrame is the primary
  * abstraction because the oracle compares untyped relational output,
  * but the engine also exposes the type-safe API where compile-time
  * schemas help — ETL stages with business logic, not ad-hoc analytics).
  *
  * Everything here stays encoder-based (Tungsten binary rows, no Kryo):
  * case-class Encoders, typed filters/maps, KeyValueGroupedDataset
  * aggregation with a typed Aggregator, and a typed join back to an
  * untyped frame. Exercised by TypedOpsSpec.
  */
object TypedOps {

  case class Doc(doc_id: Long, lang: String, source: String, text: String, n_chars: Long)
  case class DocStats(lang: String, n_docs: Long, total_chars: Long, longest: Long)

  def docs(spark: SparkSession, sfDir: String): Dataset[Doc] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "text", "n_chars").as[Doc]
  }

  /** typed Aggregator folding per-language stats in one pass */
  object StatsAgg extends Aggregator[Doc, (Long, Long, Long), (Long, Long, Long)] {
    def zero: (Long, Long, Long) = (0L, 0L, 0L)
    def reduce(b: (Long, Long, Long), d: Doc): (Long, Long, Long) =
      (b._1 + 1, b._2 + d.n_chars, math.max(b._3, d.n_chars))
    def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
      (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3))
    def finish(r: (Long, Long, Long)): (Long, Long, Long) = r
    def bufferEncoder: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[(Long, Long, Long)] = bufferEncoder
  }

  /** per-language stats through the typed API: filter -> groupByKey ->
    * Aggregator. Same partial/merge shape as an untyped hash aggregate. */
  def langStats(ds: Dataset[Doc], minChars: Long): Dataset[DocStats] = {
    import ds.sparkSession.implicits._
    ds.filter(_.n_chars >= minChars)
      .groupByKey(_.lang)
      .agg(StatsAgg.toColumn.name("stats"))
      .map { case (lang, (n, total, longest)) => DocStats(lang, n, total, longest) }
  }

  /** typed mapGroups: representative (longest, doc_id-tiebreak) doc per
    * (lang, source) — deterministic row-pick expressed in plain Scala. */
  def representatives(ds: Dataset[Doc]): Dataset[Doc] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(d => (d.lang, d.source))
      .mapGroups { (_, it) =>
        it.reduce((a, b) =>
          if (a.n_chars > b.n_chars || (a.n_chars == b.n_chars && a.doc_id < b.doc_id)) a else b)
      }
  }
}
