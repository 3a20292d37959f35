package graft

import graft.ext.Multimodal

/** Multimodal plumbing behavior: codec determinism, schema contract,
  * frame-sample bounds. */
class MultimodalSpec extends SparkSpecBase {

  test("FakeCodec is deterministic and metadata is in declared ranges") {
    val bytes = "some payload bytes".getBytes("UTF-8")
    val ctx = new Multimodal.FakeCodec.Context
    val a = ctx.decode(bytes)
    val b = ctx.decode(bytes) // same context: md.reset() isolates calls
    assert(a == b)
    assert(a == (new Multimodal.FakeCodec.Context).decode(bytes))
    val (w, h, f, c) = a
    assert(w >= 64 && w < 64 + 1024)
    assert(h >= 64 && h < 64 + 1024)
    assert(f >= 1 && f <= 300)
    assert(c >= 0L) // 60-bit md5 prefix: always BIGINT-safe
  }

  test("mm_decode_features: one row per media item, stable across runs") {
    val r1 = SparkEntry.queries("mm_decode_features")(spark, sfDir).collect()
    val r2 = SparkEntry.queries("mm_decode_features")(spark, sfDir).collect()
    assert(r1.length == 500)
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
  }

  test("mm_resize_plan: letterbox geometry fits the 224 target") {
    SparkEntry.queries("mm_resize_plan")(spark, sfDir).collect().foreach { r =>
      val (dw, dh, px, py) = (r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))
      assert(dw <= 224 && dh <= 224 && (dw == 224 || dh == 224))
      assert(px >= 0 && py >= 0 && px * 2 <= 224 && py * 2 <= 224)
    }
  }

  test("mm_frame_sample: frame numbers within the per-item frame count") {
    val rows = SparkEntry.queries("mm_frame_sample")(spark, sfDir)
      .groupBy("media_id").count().collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) >= 1))
  }
}
