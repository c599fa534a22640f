package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.syntheticMedia(
    Seq((1L, "hello world"), (2L, "hello world"), (3L, "different bytes here"))
      .toDF("id", "payload"), "id", "payload", kind = "image")

  "syntheticMedia" should "produce the canonical media schema" in {
    media.toDF().schema.fieldNames shouldBe Array("media_id", "meta", "content")
    media.toDF().schema("content").dataType.typeName shouldBe "binary"
  }

  "fakeDecodeFeatures" should "extract deterministic per-row features partition-wise" in {
    val feats = Multimodal.fakeDecodeFeatures(media, dims = 16)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    feats(1L) shouldBe feats(2L) // same bytes → same features
    feats(1L) should not be feats(3L)
    feats(1L).sum shouldBe 1.0f +- 1e-5f // normalized histogram
    feats(1L).length shouldBe 16
  }

  it should "handle empty payloads without NaNs" in {
    val empty = Multimodal.stubFeatures(Array.emptyByteArray)
    empty.forall(_ == 0f) shouldBe true
  }

  "sampleFrames" should "emit every step-th frame index for video only" in {
    val video = Multimodal.syntheticMedia(
      Seq((9L, "vid")).toDF("id", "payload"), "id", "payload", kind = "video")
    val frames = Multimodal.sampleFrames(video, step = 4)
      .select("frame_idx").as[Int].collect().sorted
    frames shouldBe Array(0, 4, 8, 12) // nFrames = 16
    Multimodal.sampleFrames(media, step = 4).count() shouldBe 0 // images skipped
  }

  "pixelStats" should "compute exact stats from real scanline decode, dropping non-PNGs" in {
    val ids = Seq(4L, 12L, 5L, 6L).toDS() // 4,12 → RGB PNG; 5 → WAV; 6 → JPEG
    val rows = Multimodal.pixelStats(Multimodal.synthesizeContainers(ids))
      .collect().map(p => p.media_id -> p).toMap
    rows.keySet shouldBe Set(4L, 12L) // WAV/JPEG quarantined by omission
    val p4 = rows(4L) // w=5, h=5, v=(4+31x+17y)%256, all <256 → no wrap
    (p4.width, p4.height, p4.channels) shouldBe ((5L, 5L, 3L))
    p4.n_pixels shouldBe 25L
    p4.n_samples shouldBe 75L
    p4.px_sum shouldBe 7500L // 3 * (25*4 + 31*10*5 + 17*10*5)
    (p4.px_min, p4.px_max) shouldBe ((4L, 196L))
  }

  "resizeMeta" should "rewrite dimensions keeping payload" in {
    val resized = Multimodal.resizeMeta(media, 32, 32).collect().head
    (resized.meta.width, resized.meta.height) shouldBe ((32, 32))
    resized.content should not be empty
  }
}
