package graft.ops

import org.scalacheck.Gen
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Property-based checks over the dependency-free media decoders: random
  * images of every supported raster shape round-trip through the JDK's
  * OWN encoders and must come back bit-exact from OUR decoders — the
  * decoders never see the generator, the JDK encoder shares no code with
  * them, and the JDK READER double-checks gray/RGBA. The resize property
  * composes decode → NN-sample → encode → decode and pins every output
  * sample to its source coordinate.
  */
class MediaPropertySpec extends AnyFlatSpec with Matchers {

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val rnd = new scala.util.Random(4711)
  private val dimGen = Gen.chooseNum(1, 40)

  private def pngOf(w: Int, h: Int, kind: Int): (Array[Byte], (Int, Int, Int) => Int, Int) = {
    // kind 0: gray via setSample; 1: RGB via setRGB; 2: RGBA via setSample
    val px = Array.fill(w * h * 4)(rnd.nextInt(256))
    val (img, bands) = kind match {
      case 0 =>
        val i = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        for (y <- 0 until h; x <- 0 until w)
          i.getRaster.setSample(x, y, 0, px((y * w + x) * 4))
        (i, 1)
      case 1 =>
        val i = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) {
          val b = (y * w + x) * 4
          i.setRGB(x, y, (px(b) << 16) | (px(b + 1) << 8) | px(b + 2))
        }
        (i, 3)
      case _ =>
        val i = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_4BYTE_ABGR)
        for (y <- 0 until h; x <- 0 until w; c <- 0 until 4)
          i.getRaster.setSample(x, y, c, px((y * w + x) * 4 + c))
        (i, 4)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    (baos.toByteArray, (x, y, c) => px((y * w + x) * 4 + c), bands)
  }

  "decodePng" should "round-trip random images of every supported raster shape bit-exactly" in {
    for (((w, h), kind) <- sample(Gen.zip(dimGen, dimGen), 12).zipWithIndex) {
      val (bytes, src, bands) = pngOf(w, h, kind % 3)
      val px = MediaCodec.decodePng(bytes)
      withClue(s"($w,$h,kind=${kind % 3}): ") {
        px should not be empty
        px.get.info.channels shouldBe bands
        val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        for (y <- 0 until h; x <- 0 until w; c <- 0 until bands) {
          val ours = px.get.samples((y * w + x) * bands + c) & 0xFF
          withClue(s"($x,$y,$c): ") {
            ours shouldBe src(x, y, c)
            ours shouldBe jdk.getRaster.getSample(x, y, c)
          }
        }
      }
    }
  }

  it should "round-trip random ADAM7-INTERLACED images bit-exactly" in {
    // the JDK PNG writer emits Adam7 in progressive mode — an independent
    // encoder for the 7-pass scatter path (each reduced image filters
    // independently; tiny dims exercise the empty-pass edge)
    for ((w, h) <- sample(Gen.zip(Gen.chooseNum(1, 25), Gen.chooseNum(1, 25)), 10)) {
      val px = Array.fill(w * h * 3)(rnd.nextInt(256))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val b = (y * w + x) * 3
        img.setRGB(x, y, (px(b) << 16) | (px(b + 1) << 8) | px(b + 2))
      }
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val p = wr.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close() // ImageOutputStream buffers: unclosed, the tail is cut
      wr.dispose()
      val bytes = baos.toByteArray
      val dec = MediaCodec.decodePng(bytes)
      withClue(s"($w,$h) interlaced: ") {
        dec should not be empty
        dec.get.info.interlace shouldBe 1
        for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
          withClue(s"($x,$y,$c): ") {
            (dec.get.samples((y * w + x) * 3 + c) & 0xFF) shouldBe
              px((y * w + x) * 3 + c)
          }
      }
    }
  }

  "decodeGif" should "round-trip random 4-color index rasters bit-exactly" in {
    val icm = new java.awt.image.IndexColorModel(2, 4,
      Array[Byte](0, -1, 0, 127), Array[Byte](0, 0, -1, 127),
      Array[Byte](0, 0, 0, 127))
    for ((w, h) <- sample(Gen.zip(dimGen, dimGen), 10)) {
      val idx = Array.fill(w * h)(rnd.nextInt(4))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, idx(y * w + x))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "gif", baos)
      val px = MediaCodec.decodeGif(baos.toByteArray)
      withClue(s"($w,$h): ") {
        px should not be empty
        px.get.indices.map(_ & 0xFF).toSeq shouldBe idx.toSeq
      }
    }
  }

  it should "round-trip random INTERLACED GIFs bit-exactly" in {
    // the JDK GIF writer interlaces in progressive mode — independent
    // coverage for the 4-pass reorder
    val icm = new java.awt.image.IndexColorModel(2, 4,
      Array[Byte](0, -1, 0, 127), Array[Byte](0, 0, -1, 127),
      Array[Byte](0, 0, 0, 127))
    for ((w, h) <- sample(Gen.zip(dimGen, dimGen), 8)) {
      val idx = Array.fill(w * h)(rnd.nextInt(4))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, idx(y * w + x))
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val p = wr.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close() // ImageOutputStream buffers: unclosed, the tail is cut
      wr.dispose()
      val px = MediaCodec.decodeGif(baos.toByteArray)
      withClue(s"($w,$h) interlaced: ") {
        px should not be empty
        px.get.indices.map(_ & 0xFF).toSeq shouldBe idx.toSeq
      }
    }
  }

  "the LZW decoder" should "survive random byte garbage totally" in {
    // fuzz both raw garbage and corrupted valid GIFs: None or Some, never
    // a throw, never an over-long output
    for (_ <- 1 to 200) {
      val junk = Array.fill(rnd.nextInt(200) + 13)(rnd.nextInt(256).toByte)
      "GIF89a".getBytes("US-ASCII").copyToArray(junk) // force the magic
      MediaCodec.decodeGif(junk).foreach { g =>
        g.indices.length shouldBe g.info.width * g.info.height
      }
    }
    val good = Multimodal.encodeGif(17, 9, seed = 5)
    for (_ <- 1 to 200) {
      val c = good.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      MediaCodec.decodeGif(c).foreach { g =>
        g.indices.length shouldBe g.info.width * g.info.height
      }
    }
  }

  "the PNG decoder" should "survive random corruption totally" in {
    val good = Multimodal.encodePng(23, 11, gray = false, seed = 5)
    for (_ <- 1 to 200) {
      val c = good.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      MediaCodec.decodePng(c).foreach { p =>
        p.samples.length shouldBe
          p.info.width * p.info.height * p.info.channels
      }
    }
  }
}
