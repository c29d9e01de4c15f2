package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded partial top-k: an `Aggregator` whose BUFFER never exceeds k
  * (score, key) pairs, so top-k-per-group runs as ordinary hash
  * aggregation with map-side combine — each task ships at most k rows
  * per group to the shuffle, O(groups·k) total motion.
  *
  * This is the 100 TB alternative to the `row_number() OVER (...) <= k`
  * window: the window must SORT EVERY GROUP MEMBER on one reducer
  * (O(n log n) per group, and a hot group concentrates on one task),
  * while this aggregator's work per row is O(k) against a tiny buffer
  * that lives in the hash map. For the suite's k=3 the insertion uses a
  * sort-truncate for clarity; a production k would use a bounded heap —
  * same associative contract.
  *
  * Ordering contract: score DESC, key ASC — total and deterministic, so
  * the result is reproducible under any partitioning and matches a
  * windowed oracle with the same ORDER BY. reduce/merge are associative
  * and commutative (set-union then truncate), the partial-agg
  * requirement.
  */
final case class TopKAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  private def top(xs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    xs.sortBy(t => (-t._1, t._2)).take(k)

  def zero: Seq[(Long, Long)] = Seq.empty
  def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    if (b.length == k && {
      val last = b.last; a._1 < last._1 || (a._1 == last._1 && a._2 > last._2)
    }) b // fast path: below the current cut, buffer untouched
    else top(b :+ a)
  def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    top(a ++ b)
  def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = top(r)

  def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}
