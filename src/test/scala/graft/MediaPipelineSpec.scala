package graft

import graft.multimodal.MediaPipeline
import java.security.MessageDigest

/** The multimodal decode plumbing: schema contract, determinism, and
  * agreement between the distributed pipeline and a local reference. */
class MediaPipelineSpec extends SparkSpec {

  test("pipeline decodes every document with the declared schema") {
    val out = MediaPipeline.pipeline(Tables.documents(spark, sf0001))
    assert(out.columns.toSeq ==
      Seq("id", "kind", "n_bytes", "content_md5", "width", "height", "n_frames", "feature"))
    assert(out.count() == Tables.documents(spark, sf0001).count())
  }

  test("decode is deterministic and matches a local reference decode") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").limit(5).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val out = MediaPipeline.pipeline(Tables.documents(spark, sf0001))
      .collect().map(r => r.getLong(0) -> r).toMap
    val md = MessageDigest.getInstance("MD5")
    docs.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val ref = MediaPipeline.decodeStub(id, kind, bytes, md)
      val got = out(id)
      assert(got.getString(3) == ref.content_md5, s"doc $id md5 mismatch")
      assert(got.getLong(2) == bytes.length.toLong)
      assert(got.getInt(4) == ref.width && got.getInt(5) == ref.height)
    }
  }

  test("feature vectors are 8-dim unit-interval floats") {
    val feats = MediaPipeline.pipeline(Tables.documents(spark, sf0001))
      .select("feature").collect().map(_.getSeq[Float](0))
    assert(feats.forall(f => f.length == 8 && f.forall(x => x >= 0.0f && x <= 1.0f)))
  }

  test("resize fits the 64-box, preserves aspect ratio, and is a no-op inside it") {
    val decoded = MediaPipeline.pipelineTyped(Tables.documents(spark, sf0001))
    val rows = MediaPipeline.resize(decoded, 64).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.out_w >= 1 && r.out_w <= 64 && r.out_h >= 1 && r.out_h <= 64,
        s"media ${r.id}: ${r.out_w}x${r.out_h} escapes the box")
      if (!r.resized) {
        assert(r.out_w == r.width && r.out_h == r.height, s"media ${r.id}: no-op path rescaled")
        assert(math.max(r.width, r.height) <= 64)
      } else {
        val big = math.max(r.width, r.height)
        assert(big > 64)
        // integer-truncated aspect preservation: out = in * 64 div big
        assert(r.out_w == math.max(1, r.width * 64 / big), s"media ${r.id}: width scale off")
        assert(r.out_h == math.max(1, r.height * 64 / big), s"media ${r.id}: height scale off")
        assert(math.max(r.out_w, r.out_h) == 64, s"media ${r.id}: longest side must hit the box edge")
      }
    }
    // the stub's dims are 16..143, so both branches must actually occur
    assert(rows.exists(_.resized) && rows.exists(!_.resized), "one resize branch untested")
  }
}
