package graft.ops

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Baseline JPEG pixel decode ([[MediaCodec.decodeJpeg]], round 15) —
  * the same contract family as the PNG/GIF decoders:
  *
  *   - EXACTNESS on DC-only fixtures: a block whose only coefficient is
  *     F(0,0)=8k reconstructs as the flat value 128+k on ANY compliant
  *     IDCT (no AC → no IDCT-flavor variance), so every pixel of an
  *     [[Multimodal.encodeJpegDc]] payload is predicted by arithmetic —
  *     the basis of the q_ext_multimodal_jpeg oracle. Checked here for
  *     all three layouts (gray, 4:4:4, 4:2:0) plus restart markers, and
  *     cross-checked against the JDK's INDEPENDENT reader on the same
  *     bytes.
  *   - JDK PARITY on real lossy streams: the luma path (Huffman, dequant,
  *     islow IDCT) is BIT-EXACT against ImageIO's libjpeg-based reader;
  *     color channels agree within a small bound — chroma upsampling
  *     flavor (libjpeg's fancy triangular vs this decoder's normative
  *     replication) is the one place T.81 leaves open, and it only
  *     diverges where chroma has local gradient.
  *   - TOTALITY under corruption: truncation at every boundary, bit
  *     flips, and forged dimensions return None (or a valid decode for
  *     corruptions that stay legal) — never a throw, never an unbounded
  *     allocation (maxPixels guard covers the MCU-padded planes too).
  */
class JpegCodecSpec extends AnyFlatSpec with Matchers {

  private def kY(seed: Long, bx: Int, by: Int): Int =
    ((((seed + 7L * bx + 13L * by) % 33) + 33) % 33).toInt - 16
  private def kCb(seed: Long, bx: Int, by: Int): Int =
    ((((3L * seed + 5L * bx + 11L * by) % 33) + 33) % 33).toInt - 16
  private def kCr(seed: Long, bx: Int, by: Int): Int =
    ((((5L * seed + 3L * bx + 17L * by) % 33) + 33) % 33).toInt - 16

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** The decoder's normative YCbCr->RGB (16-bit fixed point, floor). */
  private def rgbOf(y: Int, cb0: Int, cr0: Int): (Int, Int, Int) = {
    val cb = cb0 - 128
    val cr = cr0 - 128
    (clamp(y + ((91881 * cr + 32768) >> 16)),
      clamp(y + ((-22554 * cb - 46802 * cr + 32768) >> 16)),
      clamp(y + ((116130 * cb + 32768) >> 16)))
  }

  /** Expected samples of an encodeJpegDc payload, from the contract
    * arithmetic alone (independent of encoder AND decoder).
    */
  private def predict(w: Int, h: Int, chroma: Int, seed: Long): Array[Int] = {
    if (chroma == 0) {
      val out = new Array[Int](w * h)
      for (y <- 0 until h; x <- 0 until w)
        out(y * w + x) = clamp(128 + kY(seed, x / 8, y / 8))
      out
    } else {
      val out = new Array[Int](w * h * 3)
      val cDiv = if (chroma == 2) 16 else 8
      for (y <- 0 until h; x <- 0 until w) {
        val yv = clamp(128 + kY(seed, x / 8, y / 8))
        val cb = clamp(128 + kCb(seed, x / cDiv, y / cDiv))
        val cr = clamp(128 + kCr(seed, x / cDiv, y / cDiv))
        val (r, g, b) = rgbOf(yv, cb, cr)
        val o = (y * w + x) * 3
        out(o) = r; out(o + 1) = g; out(o + 2) = b
      }
      out
    }
  }

  private def decodeOurs(bytes: Array[Byte]): MediaCodec.JpegPixels =
    MediaCodec.decodeJpeg(bytes).getOrElse(fail("decodeJpeg returned None"))

  "DC-only fixtures" should "decode to the EXACT predicted pixels (gray, 4:4:4, 4:2:0)" in {
    for ((chroma, w, h, seed) <- Seq((0, 24, 16, 5L), (1, 16, 24, 9L),
        (2, 32, 16, 3L), (0, 8, 8, 0L), (2, 48, 32, 11L))) {
      val bytes = Multimodal.encodeJpegDc(w, h, chroma, seed)
      val px = decodeOurs(bytes)
      px.info.width shouldBe w
      px.info.height shouldBe h
      px.channels shouldBe (if (chroma == 0) 1 else 3)
      val expect = predict(w, h, chroma, seed)
      withClue(s"layout $chroma ${w}x$h seed $seed: ") {
        px.samples.map(_ & 0xFF).toSeq shouldBe expect.toSeq
      }
    }
  }

  it should "decode identically with restart markers at several intervals" in {
    for (interval <- Seq(1, 2, 3, 7)) {
      val plain = decodeOurs(Multimodal.encodeJpegDc(32, 16, 2, 4L))
      val rst = decodeOurs(Multimodal.encodeJpegDc(32, 16, 2, 4L,
        restartEvery = interval))
      withClue(s"restartEvery=$interval: ") {
        rst.samples.toSeq shouldBe plain.samples.toSeq
      }
    }
  }

  it should "be decoded to the same pixels by the JDK's independent reader" in {
    // gray: JDK raster samples must equal ours exactly (getRGB would run
    // TYPE_BYTE_GRAY through color management — probed in the PNG round)
    val gBytes = Multimodal.encodeJpegDc(24, 16, 0, 7L)
    val gOurs = decodeOurs(gBytes)
    val gJdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gBytes))
    (gJdk should not be null)
    for (y <- 0 until 16; x <- 0 until 24)
      withClue(s"gray ($x,$y): ") {
        (gOurs.samples(y * 24 + x) & 0xFF) shouldBe
          gJdk.getRaster.getSample(x, y, 0)
      }
    // 4:4:4 color: flat chroma per block means replication == any legal
    // upsampling; the JDK reader must agree exactly on every channel
    val cBytes = Multimodal.encodeJpegDc(16, 16, 1, 2L)
    val cOurs = decodeOurs(cBytes)
    val cJdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cBytes))
    for (y <- 0 until 16; x <- 0 until 16) {
      val rgb = cJdk.getRGB(x, y)
      val o = (y * 16 + x) * 3
      withClue(s"color ($x,$y): ") {
        (cOurs.samples(o) & 0xFF) shouldBe ((rgb >> 16) & 0xFF)
        (cOurs.samples(o + 1) & 0xFF) shouldBe ((rgb >> 8) & 0xFF)
        (cOurs.samples(o + 2) & 0xFF) shouldBe (rgb & 0xFF)
      }
    }
  }

  private def jdkEncode(w: Int, h: Int, gray: Boolean, q: Float,
                        progressive: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // smooth wrap-free gradients: chroma step edges are where the two
      // LEGAL upsampling flavors diverge by design — not a decode defect
      val r = (x * 2 + y) * 255 / (2 * w + h)
      val g = (x + y * 2 + 50) * 255 / (w + 2 * h + 50)
      val b = (x + y + 120) * 255 / (w + h + 120)
      img.setRGB(x, y, if (gray) (r << 16) | (r << 8) | r
                       else (r << 16) | (g << 8) | b)
    }
    val baos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(q)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    baos.toByteArray
  }

  "JDK-encoded grayscale" should "decode BIT-EXACTLY against the JDK reader" in {
    for ((w, h) <- Seq((64, 48), (33, 17), (8, 8), (160, 120));
         q <- Seq(0.9f, 0.6f)) {
      val bytes = jdkEncode(w, h, gray = true, q)
      val ours = decodeOurs(bytes)
      ours.channels shouldBe 1
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var diff = 0
      for (y <- 0 until h; x <- 0 until w)
        if ((ours.samples(y * w + x) & 0xFF) != jdk.getRaster.getSample(x, y, 0))
          diff += 1
      withClue(s"${w}x$h q=$q differing samples: ") { diff shouldBe 0 }
    }
  }

  "JDK-encoded color (4:2:0)" should "agree within the upsampling-flavor bound" in {
    for ((w, h) <- Seq((64, 48), (33, 17), (160, 120)); q <- Seq(0.9f, 0.6f)) {
      val bytes = jdkEncode(w, h, gray = false, q)
      val ours = decodeOurs(bytes)
      ours.channels shouldBe 3
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var maxd = 0
      var sumd = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = jdk.getRGB(x, y)
        val o = (y * w + x) * 3
        for ((a, b) <- Seq((ours.samples(o) & 0xFF, (rgb >> 16) & 0xFF),
            (ours.samples(o + 1) & 0xFF, (rgb >> 8) & 0xFF),
            (ours.samples(o + 2) & 0xFF, rgb & 0xFF))) {
          val d = math.abs(a - b)
          if (d > maxd) maxd = d
          sumd += d
        }
      }
      val mean = sumd.toDouble / (w * h * 3)
      withClue(s"${w}x$h q=$q max=$maxd mean=$mean: ") {
        maxd should be <= 8 // measured ≤4 on smooth gradients; margin 2x
        mean should be <= 1.5
      }
    }
  }

  "progressive (SOF2) streams" should "decode BIT-EXACTLY against the JDK reader (gray)" in {
    // round-15 continuation: the multi-scan Annex-G path (DC first/refine
    // interleaved, AC first/refine per-component with EOB runs) assembles
    // the same coefficients the JDK reader sees, and the shared IDCT
    // makes gray parity exact — any coefficient-assembly defect would
    // show as large errors, not rounding
    for ((w, h) <- Seq((64, 48), (33, 17), (160, 120)); q <- Seq(0.9f, 0.6f)) {
      val bytes = jdkEncode(w, h, gray = true, q, progressive = true)
      MediaCodec.parseJpeg(bytes).map(_.progressive) shouldBe Some(true)
      val ours = decodeOurs(bytes)
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var diff = 0
      for (y <- 0 until h; x <- 0 until w)
        if ((ours.samples(y * w + x) & 0xFF) != jdk.getRaster.getSample(x, y, 0))
          diff += 1
      withClue(s"progressive ${w}x$h q=$q differing samples: ") { diff shouldBe 0 }
    }
  }

  it should "agree on color within the upsampling-flavor bound" in {
    for ((w, h) <- Seq((64, 48), (160, 120)); q <- Seq(0.9f, 0.6f)) {
      val bytes = jdkEncode(w, h, gray = false, q, progressive = true)
      MediaCodec.parseJpeg(bytes).map(_.progressive) shouldBe Some(true)
      val ours = decodeOurs(bytes)
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var maxd = 0
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = jdk.getRGB(x, y)
        val o = (y * w + x) * 3
        for ((a, b) <- Seq((ours.samples(o) & 0xFF, (rgb >> 16) & 0xFF),
            (ours.samples(o + 1) & 0xFF, (rgb >> 8) & 0xFF),
            (ours.samples(o + 2) & 0xFF, rgb & 0xFF)))
          maxd = math.max(maxd, math.abs(a - b))
      }
      withClue(s"progressive color ${w}x$h q=$q max=$maxd: ") {
        maxd should be <= 8
      }
    }
  }

  it should "never throw under truncation or forgery" in {
    val bytes = jdkEncode(48, 32, gray = false, 0.8f, progressive = true)
    // truncation at every 7th boundary (full sweep is slow at SOF2 sizes)
    for (cut <- 0 until bytes.length by 7) {
      val t = java.util.Arrays.copyOf(bytes, cut)
      noException should be thrownBy MediaCodec.decodeJpeg(t)
      withClue(s"truncated at $cut decoded as complete: ") {
        MediaCodec.decodeJpeg(t) shouldBe None
      }
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val m = bytes.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      noException should be thrownBy MediaCodec.decodeJpeg(m)
    }
  }

  "unsupported streams" should "return None, not wrong pixels" in {
    // non-JPEG prefixes and unsupported coding families
    MediaCodec.decodeJpeg(null) shouldBe None
    MediaCodec.decodeJpeg(Array[Byte]()) shouldBe None
    MediaCodec.decodeJpeg("not a jpeg at all".getBytes) shouldBe None
    // forge a lossless SOF3 from a baseline stream: must quarantine
    val base = Multimodal.encodeJpegDc(16, 16, 0, 1L)
    var i = 2
    var sof = -1
    while (sof < 0 && i + 3 < base.length) {
      if ((base(i) & 0xFF) == 0xFF && (base(i + 1) & 0xFF) == 0xC0) sof = i
      else i += 1
    }
    val forged = base.clone()
    forged(sof + 1) = 0xC3.toByte
    MediaCodec.decodeJpeg(forged) shouldBe None
  }

  "corrupted streams" should "never throw: truncation at every boundary" in {
    val bytes = Multimodal.encodeJpegDc(32, 16, 2, 4L, restartEvery = 2)
    for (cut <- 0 until bytes.length) {
      val t = java.util.Arrays.copyOf(bytes, cut)
      noException should be thrownBy MediaCodec.decodeJpeg(t)
      withClue(s"truncated at $cut decoded as complete: ") {
        MediaCodec.decodeJpeg(t) shouldBe None
      }
    }
  }

  it should "never throw under single-byte forgery" in {
    val bytes = jdkEncode(32, 24, gray = true, 0.8f)
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 300) {
      val m = bytes.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      noException should be thrownBy MediaCodec.decodeJpeg(m)
      // a corrupted stream may still decode (wrong pixels are fine for
      // lossy garbage-in); it must never allocate past the guard or throw
    }
  }

  "the allocation guard" should "reject forged dimensions before allocating" in {
    val bytes = Multimodal.encodeJpegDc(16, 16, 0, 1L)
    // find SOF0 and forge 65500x65500 (4.3G pixels)
    var i = 2
    var sof = -1
    while (sof < 0 && i + 3 < bytes.length) {
      if ((bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xC0) sof = i
      else i += 1
    }
    sof should be > 0
    val forged = bytes.clone()
    forged(sof + 5) = 0xFF.toByte; forged(sof + 6) = 0xDC.toByte // height
    forged(sof + 7) = 0xFF.toByte; forged(sof + 8) = 0xDC.toByte // width
    MediaCodec.decodeJpeg(forged) shouldBe None
  }
}
