package graft

import graft.plans.ShardedRank
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pin for the distributed global row-numbering primitive: for
  * ANY input multiset and ANY shard count, rn must be exactly the
  * 1-based position in the total (value desc, key) order and n the exact
  * row count — i.e. ShardedRank ≡ Window.orderBy, minus the single
  * reducer. This is the invariant q_win_ntile_pct and
  * q_percentile_global lean on; RangePartitioner's sampled boundaries
  * must never leak into it. (Direct Gen sampling — the
  * scalatest-scalacheck bridge isn't in the offline cache.)
  */
class ShardedRankSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    var seed = Seed(46L)
    val out = Seq.newBuilder[A]
    var k = 0
    while (k < n) {
      g.apply(params, seed) match {
        case Some(x) => out += x; k += 1
        case None =>
      }
      seed = seed.next
    }
    out.result()
  }

  private val cases: Gen[(List[Long], Int)] = for {
    n <- Gen.choose(0, 200)
    vals <- Gen.listOfN(n, Gen.choose(-50L, 50L)) // heavy ties on purpose
    shards <- Gen.oneOf(1, 2, 3, 7, 32)
  } yield (vals, shards)

  test("rn is the exact rank in the total order for arbitrary inputs and shard counts") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      samples(cases, 20).foreach { case (vals, shards) =>
        spark.conf.set("spark.sql.shuffle.partitions", shards.toString)
        import spark.implicits._
        val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("key", "value")
        val got = ShardedRank.withRowNumber(df, "rn", "n",
            col("value").desc, col("key"))
          .select("key", "rn", "n")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val expectRn = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .sortBy { case (k, v) => (-v, k) }
          .zipWithIndex.map { case ((k, _), pos) => k -> (pos + 1).toLong }.toMap
        assert(got.length == vals.length, s"row count drift (shards=$shards)")
        got.foreach { case (k, rn, n) =>
          assert(n == vals.length.toLong, s"n=$n != ${vals.length} (shards=$shards)")
          assert(rn == expectRn(k), s"key $k: rn=$rn expected ${expectRn(k)} (shards=$shards)")
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("empty input yields an empty result, not a crash") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("key", "value")
    assert(ShardedRank.withRowNumber(df, "rn", "n", col("value"), col("key")).count() == 0)
  }
}
