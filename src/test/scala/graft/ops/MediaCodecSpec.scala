package graft.ops

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** [[MediaCodec]] against payloads from the JDK's OWN encoders — ImageIO
  * (PNG/JPEG) and javax.sound.sampled (WAVE) — which share no code with the
  * parsers: a passing round trip means the parsers read genuine container
  * structures, not an inverse of a sibling builder. Malformed-input totality
  * (truncation, CRC flips, wrong magic) is locked too: corpus blobs are
  * untrusted.
  */
class MediaCodecSpec extends AnyFlatSpec with Matchers {

  "parsePng" should "read dimensions, depth, and channels from ImageIO-encoded PNGs" in {
    for ((w, h, gray) <- Seq((1, 1, true), (64, 32, false), (61, 29, true),
                             (7, 23, false))) {
      val bytes = Multimodal.encodePng(w, h, gray, seed = 42)
      val info = MediaCodec.parsePng(bytes)
      withClue(s"($w,$h,gray=$gray): ") {
        info should not be empty
        info.get.width shouldBe w
        info.get.height shouldBe h
        info.get.bitDepth shouldBe 8
        info.get.channels shouldBe (if (gray) 1 else 3)
        info.get.colorType shouldBe (if (gray) 0 else 2)
        info.get.interlace shouldBe 0
      }
    }
  }

  it should "reject truncation, CRC corruption, and wrong magic" in {
    val good = Multimodal.encodePng(16, 8, gray = false, seed = 7)
    MediaCodec.parsePng(good.take(20)) shouldBe None
    val crcFlipped = good.clone()
    crcFlipped(16 + 13) = (crcFlipped(16 + 13) ^ 0x01).toByte // IHDR CRC byte
    MediaCodec.parsePng(crcFlipped) shouldBe None
    val fieldFlipped = good.clone()
    fieldFlipped(19) = (fieldFlipped(19) ^ 0x01).toByte // width byte, CRC now stale
    MediaCodec.parsePng(fieldFlipped) shouldBe None
    MediaCodec.parsePng(Multimodal.encodeJpeg(8, 8, gray = false, seed = 1)) shouldBe None
    MediaCodec.parsePng(null) shouldBe None
    MediaCodec.parsePng(Array.emptyByteArray) shouldBe None
  }

  "decodePng" should "reconstruct exact RGB samples from ImageIO-encoded PNGs" in {
    // the generator stores v = (seed + 31x + 17y) % 256 in all three
    // channels of TYPE_INT_RGB (stored verbatim — probed); a correct
    // inflate + unfilter walk must recover every sample exactly
    for ((w, h, seed) <- Seq((1, 1, 0L), (5, 5, 4L), (61, 29, 42L), (64, 32, 999L))) {
      val px = MediaCodec.decodePng(Multimodal.encodePng(w, h, gray = false, seed))
      withClue(s"($w,$h,seed=$seed): ") {
        px should not be empty
        val s = px.get.samples
        s.length shouldBe w * h * 3
        for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
          val expect = ((seed + x * 31L + y * 17L) % 256).toInt
          withClue(s"($x,$y,c=$c): ") { (s((y * w + x) * 3 + c) & 0xFF) shouldBe expect }
        }
      }
    }
  }

  it should "decode gray and RGBA rasters bit-exactly vs ImageIO's own reader" in {
    // raster.setSample writes raw bytes (no colorspace transform), so the
    // JDK's INDEPENDENT decoder is a second ground truth for our walk
    def viaSetSample(w: Int, h: Int, imgType: Int, bands: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w; b <- 0 until bands)
        img.getRaster.setSample(x, y, b, (x * 7 + y * 13 + b * 29) % 256)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    for ((imgType, bands) <- Seq(
        (java.awt.image.BufferedImage.TYPE_BYTE_GRAY, 1),
        (java.awt.image.BufferedImage.TYPE_4BYTE_ABGR, 4))) {
      val bytes = viaSetSample(23, 11, imgType, bands)
      val px = MediaCodec.decodePng(bytes)
      withClue(s"type=$imgType: ") {
        px should not be empty
        px.get.info.channels shouldBe bands
        val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        for (y <- 0 until 11; x <- 0 until 23; b <- 0 until bands) {
          val ours = px.get.samples((y * 23 + x) * bands + b) & 0xFF
          // raster bands are LOGICAL (0=R,1=G,2=B,3=A even for the ABGR byte
          // layout), matching PNG's RGBA sample order — so both the JDK
          // reader and the generating arithmetic must agree with our walk
          withClue(s"($x,$y,b=$b): ") {
            ours shouldBe jdk.getRaster.getSample(x, y, b)
            ours shouldBe (x * 7 + y * 13 + b * 29) % 256
          }
        }
      }
    }
  }

  it should "reject indexed, interlaced, truncated, and corrupt streams totally" in {
    MediaCodec.decodePng(Multimodal.encodeGif(8, 8, seed = 1)) shouldBe None // not a PNG
    val good = Multimodal.encodePng(16, 8, gray = false, seed = 7)
    MediaCodec.decodePng(good) should not be empty
    MediaCodec.decodePng(good.take(good.length - 20)) shouldBe None // truncated IDAT
    val corrupt = good.clone()
    // flip a byte mid-IDAT: inflate must fail or the length check must catch it
    corrupt(good.length / 2) = (corrupt(good.length / 2) ^ 0x55).toByte
    MediaCodec.decodePng(corrupt) // must not throw; any Option is acceptable
    // forged IHDR dimensions past the pixel guard
    MediaCodec.decodePng(Multimodal.encodePng(8, 8, gray = true, seed = 1),
      maxPixels = 10) shouldBe None
    MediaCodec.decodePng(null) shouldBe None
  }

  it should "reject (not hang on) a forged FDICT zlib header in IDAT" in {
    // 0x78 0x20 passes the zlib %31 header check but sets the FDICT bit:
    // Inflater then returns 0 from inflate() with needsDictionary()==true
    // and needsInput()==false — a loop that only bails on needsInput spins
    // forever. The decoder must treat ANY zero-byte step as failure.
    val good = Multimodal.encodePng(16, 8, gray = false, seed = 7)
    // locate the first IDAT chunk (payload starts 4 bytes past the type tag)
    var i = 8
    var idatPayload = -1
    while (idatPayload < 0 && i + 8 <= good.length) {
      val len = ((good(i) & 0xFF) << 24) | ((good(i + 1) & 0xFF) << 16) |
        ((good(i + 2) & 0xFF) << 8) | (good(i + 3) & 0xFF)
      if (new String(good, i + 4, 4, "US-ASCII") == "IDAT") idatPayload = i + 8
      i += 12 + len
    }
    idatPayload should be > 0
    val forged = good.clone()
    forged(idatPayload) = 0x78.toByte
    forged(idatPayload + 1) = 0x20.toByte
    // must return None promptly instead of looping on needsDictionary()
    val t0 = System.nanoTime()
    MediaCodec.decodePng(forged) shouldBe None
    (System.nanoTime() - t0) should be < 5_000_000_000L
  }

  "parseJpeg" should "read SOF dimensions and components from ImageIO-encoded JPEGs" in {
    for ((w, h, gray) <- Seq((1, 1, true), (47, 23, false), (64, 32, true))) {
      val bytes = Multimodal.encodeJpeg(w, h, gray, seed = 42)
      val info = MediaCodec.parseJpeg(bytes)
      withClue(s"($w,$h,gray=$gray): ") {
        info should not be empty
        info.get.width shouldBe w
        info.get.height shouldBe h
        info.get.precision shouldBe 8
        info.get.components shouldBe (if (gray) 1 else 3)
        info.get.progressive shouldBe false
      }
    }
  }

  it should "reject truncation and non-JPEG payloads" in {
    val good = Multimodal.encodeJpeg(16, 8, gray = false, seed = 7)
    MediaCodec.parseJpeg(good.take(6)) shouldBe None
    MediaCodec.parseJpeg(Multimodal.encodePng(8, 8, gray = false, seed = 1)) shouldBe None
    MediaCodec.parseJpeg(null) shouldBe None
  }

  "parseGif" should "read LSD dimensions and the palette-sized GCT from ImageIO-encoded GIFs" in {
    for ((w, h) <- Seq((1, 1), (31, 17), (13, 7), (64, 32))) {
      val bytes = Multimodal.encodeGif(w, h, seed = 9)
      val info = MediaCodec.parseGif(bytes)
      withClue(s"($w,$h): ") {
        info should not be empty
        info.get.width shouldBe w
        info.get.height shouldBe h
        info.get.hasGct shouldBe true
        // the JDK writer sizes the GCT to the explicit 4-entry palette
        info.get.gctBits shouldBe 2
      }
    }
  }

  it should "reject truncation, a lying GCT flag, and wrong magic" in {
    val good = Multimodal.encodeGif(10, 5, seed = 3)
    MediaCodec.parseGif(good.take(10)) shouldBe None
    val lyingGct = good.take(13).toArray // declared GCT, payload cut before it
    lyingGct(10) = (lyingGct(10) | 0x80).toByte
    MediaCodec.parseGif(lyingGct) shouldBe None
    MediaCodec.parseGif(Multimodal.encodePng(8, 8, gray = true, seed = 1)) shouldBe None
    MediaCodec.parseGif(null) shouldBe None
  }

  "decodeGif" should "reconstruct exact palette indices vs both the arithmetic and ImageIO's reader" in {
    for ((w, h, seed) <- Seq((1, 1, 0L), (31, 17, 7L), (13, 5, 42L), (64, 32, 999L))) {
      val bytes = Multimodal.encodeGif(w, h, seed)
      val px = MediaCodec.decodeGif(bytes)
      withClue(s"($w,$h,seed=$seed): ") {
        px should not be empty
        val s = px.get.indices
        s.length shouldBe w * h
        val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        for (y <- 0 until h; x <- 0 until w) {
          val got = s(y * w + x) & 0xFF
          withClue(s"($x,$y): ") {
            got shouldBe ((seed + x + y * 31L) % 4).toInt // generator arithmetic
            got shouldBe jdk.getRaster.getSample(x, y, 0) // independent decoder
          }
        }
      }
    }
  }

  "decodeGifFrames" should "decode every frame of a JDK-written animation bit-exactly" in {
    for ((w, h, n, seed) <- Seq((13, 7, 4, 5L), (1, 1, 2, 0L), (31, 17, 6, 42L))) {
      val bytes = Multimodal.encodeGifAnimated(w, h, n, seed)
      val frames = MediaCodec.decodeGifFrames(bytes)
      withClue(s"($w,$h,n=$n,seed=$seed): ") {
        frames should not be empty
        frames.get.frames.size shouldBe n
        // second witness: the JDK's own multi-frame reader
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        reader.setInput(javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
        for (f <- 0 until n) {
          val ours = frames.get.frames(f)
          val jdk = reader.read(f)
          for (y <- 0 until h; x <- 0 until w) {
            val expect = ((seed + x + y * 31L + f * 7L) % 4).toInt
            withClue(s"f=$f ($x,$y): ") {
              (ours(y * w + x) & 0xFF) shouldBe expect
              jdk.getRaster.getSample(x, y, 0) shouldBe expect
            }
          }
        }
        reader.dispose()
      }
    }
  }

  it should "honor the maxFrames guard" in {
    val bytes = Multimodal.encodeGifAnimated(5, 5, 6, seed = 1)
    MediaCodec.decodeGifFrames(bytes, maxFrames = 2).get.frames.size shouldBe 2
  }

  /** Independent compositor over the JDK reader: rect rasters + the JDK's
    * OWN per-frame metadata (left/top, disposal, transparency) composed by
    * test-local code — nothing shared with MediaCodec's walk.
    */
  private def child(n: org.w3c.dom.Node, name: String): Option[org.w3c.dom.Element] = {
    var c = n.getFirstChild
    while (c != null && c.getNodeName != name) c = c.getNextSibling
    Option(c).map(_.asInstanceOf[org.w3c.dom.Element])
  }

  private def composeViaJdk(bytes: Array[Byte]): IndexedSeq[Array[Int]] = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    val sm = reader.getStreamMetadata.getAsTree("javax_imageio_gif_stream_1.0")
    val lsd = child(sm, "LogicalScreenDescriptor").get
    val w = lsd.getAttribute("logicalScreenWidth").toInt
    val h = lsd.getAttribute("logicalScreenHeight").toInt
    val bg = child(sm, "GlobalColorTable")
      .map(_.getAttribute("backgroundColorIndex").toInt).getOrElse(0)
    val canvas = Array.fill(w * h)(bg)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    for (f <- 0 until reader.getNumImages(true)) {
      val md = reader.getImageMetadata(f).getAsTree("javax_imageio_gif_image_1.0")
      val desc = child(md, "ImageDescriptor").get
      val left = desc.getAttribute("imageLeftPosition").toInt
      val top = desc.getAttribute("imageTopPosition").toInt
      val gce = child(md, "GraphicControlExtension")
      val disposal = gce.map(_.getAttribute("disposalMethod")).getOrElse("none")
      val trans = gce.filter(_.getAttribute("transparentColorFlag") == "TRUE")
        .map(_.getAttribute("transparentColorIndex").toInt).getOrElse(-1)
      val img = reader.read(f)
      val before = if (disposal == "restoreToPrevious") canvas.clone() else null
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val v = img.getRaster.getSample(x, y, 0)
        if (v != trans) canvas((top + y) * w + left + x) = v
      }
      out += canvas.clone()
      disposal match {
        case "restoreToBackgroundColor" =>
          for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
            canvas((top + y) * w + left + x) = bg
        case "restoreToPrevious" =>
          System.arraycopy(before, 0, canvas, 0, canvas.length)
        case _ => ()
      }
    }
    reader.dispose()
    out.toIndexedSeq
  }

  it should "compose delta rects, transparency, and disposal like the JDK metadata says" in {
    import Multimodal.GifDeltaFrame
    val cases = Seq(
      // plain overlay chain: full frame, two offset opaque rects
      ("overlay", Seq(GifDeltaFrame(0, 0, 9, 7), GifDeltaFrame(2, 1, 5, 4),
        GifDeltaFrame(4, 3, 3, 2))),
      // transparency: index-2 pixels of the delta leave the canvas showing
      ("transparent", Seq(GifDeltaFrame(0, 0, 8, 8),
        GifDeltaFrame(1, 1, 6, 5, transparentIdx = 2))),
      // restore-to-background: frame 2 composes onto a bg-cleared rect
      ("dispose-bg", Seq(GifDeltaFrame(0, 0, 8, 6),
        GifDeltaFrame(1, 1, 5, 3, disposal = "restoreToBackgroundColor"),
        GifDeltaFrame(3, 2, 4, 3))),
      // restore-to-previous: frame 3 composes onto the pre-frame-2 canvas
      ("dispose-prev", Seq(GifDeltaFrame(0, 0, 8, 6),
        GifDeltaFrame(1, 1, 5, 3, disposal = "restoreToPrevious"),
        GifDeltaFrame(2, 2, 4, 2))))
    for ((name, frames) <- cases; seed <- Seq(0L, 5L)) {
      val bytes = Multimodal.encodeGifDelta(frames, seed)
      val ours = MediaCodec.decodeGifFrames(bytes)
      withClue(s"$name seed=$seed: ") {
        ours should not be empty
        val jdk = composeViaJdk(bytes)
        ours.get.frames.size shouldBe jdk.size
        for (f <- jdk.indices) {
          withClue(s"frame $f: ") {
            ours.get.frames(f).map(_ & 0xFF).toSeq shouldBe jdk(f).toSeq
          }
        }
        // guard against silent degeneration: the written stream must
        // actually CARRY the authored transparency (the JDK writer derives
        // the GCE flag from the frame's color model and once silently
        // cleared it — both compositors then agreed on the WRONG stream)
        if (name == "transparent") {
          val r = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          r.setInput(javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes)))
          val md = r.getImageMetadata(1).getAsTree("javax_imageio_gif_image_1.0")
          child(md, "GraphicControlExtension").get
            .getAttribute("transparentColorFlag") shouldBe "TRUE"
          r.dispose()
        }
      }
    }
  }

  it should "reject a delta rect that exceeds the logical screen" in {
    // forge the descriptor of a valid single-frame GIF: claim left=200
    val good = Multimodal.encodeGif(10, 6, seed = 3)
    // find the image descriptor (0x2C introducer)
    var i = 13 + 3 * 4 // header + LSD + 4-entry GCT
    while (i < good.length && (good(i) & 0xFF) != 0x2C) {
      if ((good(i) & 0xFF) == 0x21) {
        i += 2
        while ((good(i) & 0xFF) != 0) i += 1 + (good(i) & 0xFF)
        i += 1
      } else i += 1
    }
    (good(i) & 0xFF) shouldBe 0x2C
    val forged = good.clone()
    forged(i + 1) = 200.toByte // imageLeftPosition LE16 low byte
    MediaCodec.decodeGifFrames(forged) shouldBe None
  }

  it should "reject truncation and trailing garbage totally" in {
    val good = Multimodal.encodeGif(10, 6, seed = 3)
    MediaCodec.decodeGif(good) should not be empty
    MediaCodec.decodeGif(good.take(good.length - 10)) shouldBe None // cut LZW stream
    MediaCodec.decodeGif(Multimodal.encodePng(8, 8, gray = true, seed = 1)) shouldBe None
    MediaCodec.decodeGif(null) shouldBe None
    MediaCodec.decodeGif(Multimodal.encodeGif(64, 64, 1), maxPixels = 100) shouldBe None
    // corrupt a byte mid-stream: must not throw, any Option acceptable
    val corrupt = good.clone()
    corrupt(good.length / 2) = (corrupt(good.length / 2) ^ 0x5A).toByte
    MediaCodec.decodeGif(corrupt)
  }

  "parseMp3" should "decode hand-assembled frame headers per the published bit layout" in {
    // header assembled field-by-field (independent of the parser's table
    // lookups): sync=11 bits, version, layer, protection, bitrate idx,
    // samplerate idx, padding, private, channel mode
    def header(verBits: Int, layerBits: Int, brIdx: Int, srIdx: Int,
               padding: Int, chanBits: Int, frameLen: Int): Array[Byte] = {
      val b = new Array[Byte](frameLen)
      b(0) = 0xFF.toByte
      b(1) = (0xE0 | (verBits << 3) | (layerBits << 1) | 1).toByte
      b(2) = ((brIdx << 4) | (srIdx << 2) | (padding << 1)).toByte
      b(3) = (chanBits << 6).toByte
      b
    }
    // MPEG1 Layer III, idx 9 → 128 kbps, sr idx 0 → 44100, stereo:
    // frame = 144·128000/44100 = 417 (+1 padded)
    val v1l3 = MediaCodec.parseMp3(header(3, 1, 9, 0, 0, 0, 417))
    v1l3 shouldBe Some(MediaCodec.Mp3Info("MPEG1", 3, 128, 44100, 2, 417))
    val padded = MediaCodec.parseMp3(header(3, 1, 9, 0, 1, 3, 418))
    padded shouldBe Some(MediaCodec.Mp3Info("MPEG1", 3, 128, 44100, 1, 418))
    // MPEG2 Layer III, idx 4 → 32 kbps, sr idx 1 → 24000: 72·32000/24000=96
    MediaCodec.parseMp3(header(2, 1, 4, 1, 0, 0, 96)) shouldBe
      Some(MediaCodec.Mp3Info("MPEG2", 3, 32, 24000, 2, 96))
    // MPEG1 Layer I, idx 1 → 32 kbps, sr idx 2 → 32000: (12·32000/32000+0)·4=48
    MediaCodec.parseMp3(header(3, 3, 1, 2, 0, 0, 48)) shouldBe
      Some(MediaCodec.Mp3Info("MPEG1", 1, 32, 32000, 2, 48))
    // ID3v2 tag skip: 10-byte tag header + 5 tag bytes, then the frame
    val tagged = "ID3".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 0, 0, 5) ++
      new Array[Byte](5) ++ header(3, 1, 9, 0, 0, 0, 417)
    MediaCodec.parseMp3(tagged).map(_.bitrateKbps) shouldBe Some(128)
  }

  it should "reject reserved/free encodings, lying lengths, and wrong magic" in {
    def header(verBits: Int, layerBits: Int, brIdx: Int, srIdx: Int,
               len: Int): Array[Byte] = {
      val b = new Array[Byte](len)
      b(0) = 0xFF.toByte
      b(1) = (0xE0 | (verBits << 3) | (layerBits << 1)).toByte
      b(2) = ((brIdx << 4) | (srIdx << 2)).toByte
      b
    }
    MediaCodec.parseMp3(header(1, 1, 9, 0, 500)) shouldBe None // reserved version
    MediaCodec.parseMp3(header(3, 0, 9, 0, 500)) shouldBe None // reserved layer
    MediaCodec.parseMp3(header(3, 1, 0, 0, 500)) shouldBe None // free format
    MediaCodec.parseMp3(header(3, 1, 15, 0, 500)) shouldBe None // forbidden bitrate
    MediaCodec.parseMp3(header(3, 1, 9, 3, 500)) shouldBe None // reserved samplerate
    MediaCodec.parseMp3(header(3, 1, 9, 0, 100)) shouldBe None // frame exceeds payload
    MediaCodec.parseMp3(Multimodal.encodeWav(8000, 1, 5, 1)) shouldBe None
    MediaCodec.parseMp3(null) shouldBe None
  }

  "parseWav" should "read fmt/data fields from AudioSystem-encoded WAVEs" in {
    for ((rate, ch, frames) <- Seq((8000, 1, 1), (16000, 2, 97), (24000, 1, 50))) {
      val bytes = Multimodal.encodeWav(rate, ch, frames, seed = 42)
      val info = MediaCodec.parseWav(bytes)
      withClue(s"($rate,$ch,$frames): ") {
        info should not be empty
        info.get.audioFormat shouldBe 1 // PCM
        info.get.channels shouldBe ch
        info.get.sampleRateHz shouldBe rate
        info.get.bitsPerSample shouldBe 16
        info.get.byteRate shouldBe rate * ch * 2
        info.get.blockAlign shouldBe ch * 2
        info.get.dataBytes shouldBe frames.toLong * ch * 2
        info.get.durationMicros shouldBe frames.toLong * 1000000L / rate
      }
    }
  }

  it should "walk chunks in any order and honor odd-size padding" in {
    // hand-crafted RIFF: a 3-byte LIST chunk (odd size → 1 pad byte)
    // BEFORE fmt/data — the in-the-wild layout a fixed-offset reader breaks on
    val fmtData = {
      val b = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(1.toShort).putShort(1.toShort).putInt(8000)
        .putInt(16000).putShort(2.toShort).putShort(16.toShort)
      b.array()
    }
    val data = Array.fill[Byte](10)(3)
    val body = new java.io.ByteArrayOutputStream()
    def chunk(id: String, payload: Array[Byte]): Unit = {
      body.write(id.getBytes("US-ASCII"))
      val sz = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(payload.length).array()
      body.write(sz); body.write(payload)
      if (payload.length % 2 == 1) body.write(0)
    }
    body.write("WAVE".getBytes("US-ASCII"))
    chunk("LIST", Array[Byte](1, 2, 3))
    chunk("fmt ", fmtData)
    chunk("data", data)
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(body.size()).array())
    out.write(body.toByteArray)
    val info = MediaCodec.parseWav(out.toByteArray)
    info should not be empty
    info.get.sampleRateHz shouldBe 8000
    info.get.dataBytes shouldBe 10L
    info.get.durationMicros shouldBe 10L * 1000000L / 16000L
  }

  it should "reject truncation and non-RIFF payloads" in {
    val good = Multimodal.encodeWav(8000, 1, 10, seed = 7)
    MediaCodec.parseWav(good.take(30)) shouldBe None
    MediaCodec.parseWav(Multimodal.encodePng(8, 8, gray = true, seed = 1)) shouldBe None
    MediaCodec.parseWav(null) shouldBe None
  }
}
