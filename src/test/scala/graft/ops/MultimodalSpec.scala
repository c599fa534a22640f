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

  "byteHistogramFeatures" should "extract deterministic per-row features partition-wise" in {
    val feats = Multimodal.byteHistogramFeatures(media, dims = 16)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    feats(1L) shouldBe feats(2L) // same bytes → same features
    feats(1L) should not be feats(3L)
    feats(1L).sum shouldBe 1.0f +- 1e-5f // normalized histogram
    feats(1L).length shouldBe 16
  }

  it should "handle empty payloads without NaNs" in {
    val empty = Multimodal.byteHistogram(Array.emptyByteArray)
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

  "pixelStats" should "compute exact stats from real scanline decode, dropping non-images" in {
    val ids = Seq(4L, 12L, 5L, 6L).toDS() // 4,12 → RGB PNG; 5 → WAV; 6 → JPEG
    val rows = Multimodal.pixelStats(Multimodal.synthesizeContainers(ids))
      .collect().map(p => p.media_id -> p).toMap
    // WAV quarantined by omission; baseline JPEG DECODES since round 15
    rows.keySet shouldBe Set(4L, 12L, 6L)
    // id 6 is a lossy JDK-encoded 7x7 RGB JPEG: dims/shape are exact, pixel
    // values are codec-dependent — exact JPEG pixel prediction lives in
    // JpegCodecSpec's DC-only fixtures and the q_ext_multimodal_jpeg oracle
    val p6 = rows(6L)
    (p6.width, p6.height, p6.channels) shouldBe ((7L, 7L, 3L))
    p6.n_pixels shouldBe 49L
    p6.n_samples shouldBe 147L
    p6.px_min should be >= 0L
    p6.px_max should be <= 255L
    val p4 = rows(4L) // w=5, h=5, v=(4+31x+17y)%256, all <256 → no wrap
    (p4.width, p4.height, p4.channels) shouldBe ((5L, 5L, 3L))
    p4.n_pixels shouldBe 25L
    p4.n_samples shouldBe 75L
    p4.px_sum shouldBe 7500L // 3 * (25*4 + 31*10*5 + 17*10*5)
    (p4.px_min, p4.px_max) shouldBe ((4L, 196L))
  }

  "pixelFeatures" should "histogram DECODED samples for PNGs and raw bytes otherwise" in {
    val ids = Seq(4L, 5L).toDS() // 4 → RGB PNG; 5 → WAV
    val media = Multimodal.synthesizeContainers(ids)
    val feats = Multimodal.pixelFeatures(media, dims = 16)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    // PNG: histogram of the GENERATED pixel values v=(4+31x+17y)%256 over
    // the 5×5 grid × 3 channels — computed independently here
    val vals = for (y <- 0 until 5; x <- 0 until 5; _ <- 0 until 3)
      yield (4 + 31 * x + 17 * y) % 256
    val expect = new Array[Float](16)
    vals.foreach(v => expect(v * 16 / 256) += 1f)
    (0 until 16).foreach(i => expect(i) /= vals.size) // count-then-divide, like byteHistogram
    feats(4L) shouldBe expect.toSeq
    // WAV: falls back to the raw-byte stub histogram
    val raw = media.filter(_.media_id == 5L).collect().head.content
    feats(5L) shouldBe Multimodal.byteHistogram(raw, 16).toSeq
  }

  "resizePng" should "produce real PNGs whose pixels are the NN-sampled sources" in {
    val ids = Seq(4L, 5L).toDS() // 4 → RGB PNG (5×5); 5 → WAV (dropped)
    val out = Multimodal.resizePng(Multimodal.synthesizeContainers(ids), 2, 2)
      .collect()
    out.map(_.media_id).toSeq shouldBe Seq(4L)
    val r = out.head
    (r.meta.width, r.meta.height) shouldBe ((2, 2))
    val px = MediaCodec.decodePng(r.content)
    px should not be empty
    px.get.info.channels shouldBe 3 // RGB preserved
    // src(x,y) = (x*5/2, y*5/2) = (0,0),(2,0),(0,2),(2,2); v=(4+31sx+17sy)%256
    val expect = Seq((0, 0), (2, 0), (0, 2), (2, 2))
      .map { case (sx, sy) => (4 + 31 * sx + 17 * sy) % 256 }
    val got = (0 until 4).map(i => px.get.samples(i * 3) & 0xFF)
    got shouldBe expect
  }

  it should "preserve gray channels through the raw-sample path" in {
    // gray PNG built via raster.setSample (raw bytes, no colorspace
    // transform) — resize must keep 1 channel and exact sample values
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 4)
      img.getRaster.setSample(x, y, 0, 10 * x + y)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val media = Seq(Multimodal.MediaRow(7L,
      Multimodal.MediaMeta("image/png", 4, 4, 1, 0), baos.toByteArray)).toDS()
    val out = Multimodal.resizePng(media, 2, 2).collect().head
    val px = MediaCodec.decodePng(out.content).get
    px.info.channels shouldBe 1
    // src = (0,0),(2,0),(0,2),(2,2) → 0, 20, 2, 22
    px.samples.map(_ & 0xFF).toSeq shouldBe Seq(0, 20, 2, 22)
  }

  "resizeMeta" should "rewrite dimensions keeping payload" in {
    val resized = Multimodal.resizeMeta(media, 32, 32).collect().head
    (resized.meta.width, resized.meta.height) shouldBe ((32, 32))
    resized.content should not be empty
  }
}
