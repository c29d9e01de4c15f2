package graft

import graft.multimodal.MediaPipeline
import graft.queries.UdxQueries.WeightedAvg
import graft.functions.ArrayCosineSimilarity
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import java.security.MessageDigest

/** Randomized property tests (scalacheck generators, deterministic seed)
  * over the pure kernels — no SparkSession needed, so these run in
  * milliseconds and cover input space the fixture corpus can't.
  * (The scalatest-scalacheck bridge isn't in the offline dependency
  * cache, so sampling is driven directly.) */
class PropertySpec extends AnyFunSuite {

  /** 200 deterministic samples of g applied to the property f */
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var n = 0
    while (n < 200) {
      val a = ga.apply(params, seed)
      val b = gb.apply(params, seed.slide)
      seed = seed.next
      (a, b) match {
        case (Some(x), Some(y)) => f(x, y); n += 1
        case _ => // generator retry (suchThat miss)
      }
    }
  }

  private val finiteD = Gen.choose(-1e6, 1e6)
  private val weights = Gen.choose(0.1, 1e3)
  private val pairs = Gen.nonEmptyListOf(Gen.zip(finiteD, weights))

  test("WeightedAvg: reduce-then-merge equals direct formula for any split") {
    forAll(pairs, Gen.choose(0, 1000)) { (xs, splitSeed) =>
      val split = if (xs.size <= 1) 0 else splitSeed % xs.size
      val (l, r) = xs.splitAt(split)
      def fold(part: List[(Double, Double)]): (Double, Double) =
        part.foldLeft(WeightedAvg.zero)(WeightedAvg.reduce)
      val merged = WeightedAvg.finish(WeightedAvg.merge(fold(l), fold(r)))
      val direct = xs.map { case (x, w) => x * w }.sum / xs.map(_._2).sum
      assert(math.abs(merged - direct) <= 1e-9 * math.max(1.0, math.abs(direct)))
    }
  }

  test("WeightedAvg: merge is commutative") {
    forAll(pairs, pairs) { (a, b) =>
      val fa = a.foldLeft(WeightedAvg.zero)(WeightedAvg.reduce)
      val fb = b.foldLeft(WeightedAvg.zero)(WeightedAvg.reduce)
      assert(WeightedAvg.merge(fa, fb) == WeightedAvg.merge(fb, fa))
    }
  }

  private val vec = Gen.listOfN(16, Gen.choose(-10.0, 10.0)).suchThat(_.exists(_ != 0.0))

  test("ArrayCosineSimilarity: range [-1,1] and exact self-similarity sign") {
    forAll(vec, vec) { (a, b) =>
      def cos(x: List[Double], y: List[Double]): Double =
        ArrayCosineSimilarity(
          Literal.create(ArrayData.toArrayData(x.toArray), ArrayType(DoubleType)),
          Literal.create(ArrayData.toArrayData(y.toArray), ArrayType(DoubleType)))
          .eval(null).asInstanceOf[Double]
      val c = cos(a, b)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(math.abs(cos(a, a) - 1.0) <= 1e-9)
      // antisymmetry under negation
      assert(math.abs(cos(a.map(-_), b) + c) <= 1e-9)
    }
  }

  test("decodeStub: deterministic, dimension-bounded, md5-consistent") {
    val bytesGen = Gen.nonEmptyListOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    val md = MessageDigest.getInstance("MD5")
    forAll(bytesGen, Gen.oneOf("image", "audio", "video")) { (bytes, kind) =>
      val a = MediaPipeline.decodeStub(1L, kind, bytes, md)
      val b = MediaPipeline.decodeStub(1L, kind, bytes, md)
      assert(a == b || (a.content_md5 == b.content_md5 && a.width == b.width
        && a.height == b.height && a.feature.sameElements(b.feature)))
      assert(a.width >= 16 && a.width < 144 && a.height >= 16 && a.height < 144)
      assert(kind == "video" || a.n_frames == 1)
      assert(a.n_bytes == bytes.length.toLong)
    }
  }

  test("Bpe: random words always detokenize exactly under random learned merges") {
    val word = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
    val census = Gen.nonEmptyListOf(Gen.zip(word, Gen.choose(1L, 50L)))
    forAll(census, word) { (wc, probe) =>
      val merges = graft.functions.Bpe.learn(wc, 12)
      val rank = merges.zipWithIndex.toMap
      (probe :: wc.map(_._1)).foreach { w =>
        val toks = graft.functions.Bpe.encodeWord(w, rank)
        assert(toks.mkString("") == w, s"detok broke: $w -> ${toks.toSeq}")
        assert(toks.forall(_.nonEmpty))
      }
    }
  }

  test("JaroWinkler: symmetry, bounds, identity, and boost-gate invariants") {
    import graft.functions.JaroWinklerKernel.{jaro, jw}
    val word = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'x')).map(_.mkString)
    forAll(word, word) { (a, b) =>
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"out of range: $a/$b -> $s")
      assert(s == jw(b, a), s"asymmetric: $a/$b")
      if (a == b) assert(s == 1.0)
      val j = jaro(a, b)
      assert(s >= j, "winkler boost can only raise the score")
      if (j <= 0.7) assert(s == j, s"boost below gate: $a/$b")
    }
  }

  test("interval union (gaps-and-islands) equals brute-force coverage") {
    // the q_substring_dup merge: spans [s, s+W) union-merged per doc
    val W = 8
    val starts = Gen.nonEmptyListOf(Gen.choose(1, 120))
    forAll(starts, Gen.const(())) { (ss, _) =>
      val sorted = ss.distinct.sorted
      // islands exactly as the query computes them
      var covered = 0L
      var curStart = -1; var curEnd = -1
      sorted.foreach { s =>
        if (curEnd < 0 || s > curEnd) { // new island
          if (curEnd >= 0) covered += curEnd - curStart
          curStart = s; curEnd = s + W
        } else curEnd = math.max(curEnd, s + W)
      }
      if (curEnd >= 0) covered += curEnd - curStart
      val brute = sorted.flatMap(s => s until s + W).distinct.size.toLong
      assert(covered == brute, s"islands $covered != brute $brute for $sorted")
    }
  }

  test("roaring DV serialization round-trips arbitrary position sets (z85 too)") {
    import graft.sources.RoaringDv
    // positions spanning container boundaries, chunk edges, and >1 high
    // word; sizes up to a few thousand (both array + bitmap containers
    // appear because values cluster mod 65536 under the small gen)
    val pos = Gen.listOf(Gen.frequency(
      6 -> Gen.choose(0L, 70000L),            // dense low chunk
      2 -> Gen.choose(0L, 1L << 20),          // sparse spread
      1 -> Gen.choose(1L << 32, (1L << 32) + 100000L))) // second high word
    forAll(pos, Gen.const(())) { (ps, _) =>
      val sorted = ps.distinct.sorted
      assert(RoaringDv.deserialize(RoaringDv.serialize(sorted)) == sorted)
    }
    // z85 round-trips arbitrary 4-aligned byte strings
    val bytes = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
    forAll(bytes, Gen.const(())) { (bs, _) =>
      val padded = bs.toArray ++ Array.fill((4 - bs.length % 4) % 4)(0.toByte)
      assert(RoaringDv.z85Decode(RoaringDv.z85Encode(padded)).toSeq == padded.toSeq)
    }
  }
}
