package graft.ops

import java.util.zip.CRC32

/** Real, dependency-free container parsing for the multimodal tier: PNG
  * (ISO/IEC 15948 signature + IHDR, CRC-verified), JPEG/JFIF (marker walk to
  * the start-of-frame segment), and WAV (RIFF chunk walk to `fmt ` and
  * `data`). Pure JDK byte arithmetic — no image/audio libraries — so the
  * decode step runs identically on any executor.
  *
  * These are header/metadata decoders, not pixel/sample decoders: the fields
  * a curation pipeline filters and buckets on (dimensions, channels, bit
  * depth, sample rate, duration) come from genuine container structures.
  * Every parser is total — malformed, truncated, or mis-CRC'd payloads
  * return None, never throw — because corpus blobs are untrusted by
  * definition.
  *
  * MediaCodecSpec validates the parsers against payloads produced by the
  * JDK's own independent encoders (javax.imageio for PNG/JPEG,
  * javax.sound.sampled for WAV), not by this file's siblings.
  */
object MediaCodec {

  /** Parsed PNG IHDR fields. `channels` derives from colorType per the PNG
    * spec: 0 gray=1, 2 truecolor=3, 3 indexed=1, 4 gray+alpha=2, 6 rgba=4.
    */
  final case class PngInfo(width: Int, height: Int, bitDepth: Int,
                           colorType: Int, channels: Int, interlace: Int)

  /** Parsed JPEG start-of-frame fields. `components` is 1 for grayscale,
    * 3 for YCbCr/RGB.
    */
  final case class JpegInfo(width: Int, height: Int, precision: Int,
                            components: Int, progressive: Boolean)

  /** Parsed WAV RIFF fields. `durationMicros` = dataBytes * 1_000_000 /
    * byteRate, exact integer arithmetic.
    */
  final case class WavInfo(audioFormat: Int, channels: Int, sampleRateHz: Int,
                           byteRate: Int, blockAlign: Int, bitsPerSample: Int,
                           dataBytes: Long, durationMicros: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, java.nio.charset.StandardCharsets.US_ASCII)

  private val PngSignature =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Parse a PNG header: 8-byte signature, then IHDR — which the spec
    * requires to be the FIRST chunk — with its CRC32 verified (the CRC
    * covers the chunk type + data). Returns None for anything that is not
    * a well-formed PNG prefix.
    */
  def parsePng(bytes: Array[Byte]): Option[PngInfo] = {
    if (bytes == null || bytes.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if (bytes(i) != PngSignature(i)) return None; i += 1 }
    val len = be32(bytes, 8)
    if (len != 13L || ascii(bytes, 12, 4) != "IHDR") return None
    if (bytes.length < 16 + 13 + 4) return None
    val crc = new CRC32()
    crc.update(bytes, 12, 4 + 13)
    if (crc.getValue != be32(bytes, 16 + 13)) return None
    val width = be32(bytes, 16)
    val height = be32(bytes, 20)
    if (width <= 0 || height <= 0 || width > Int.MaxValue || height > Int.MaxValue)
      return None
    val bitDepth = u8(bytes, 24)
    val colorType = u8(bytes, 25)
    val interlace = u8(bytes, 28)
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    Some(PngInfo(width.toInt, height.toInt, bitDepth, colorType, channels,
      interlace))
  }

  /** Parse a JPEG header: SOI, then walk marker segments to the first
    * start-of-frame (SOF0–SOF15 minus DHT/JPG/DAC ranges) and read
    * precision, dimensions, and component count. Standalone markers
    * (RSTn, TEM) and fill bytes are skipped per the spec.
    */
  def parseJpeg(bytes: Array[Byte]): Option[JpegInfo] = {
    if (bytes == null || bytes.length < 4) return None
    if (u8(bytes, 0) != 0xFF || u8(bytes, 1) != 0xD8) return None // SOI
    var i = 2
    while (i + 3 < bytes.length) {
      if (u8(bytes, i) != 0xFF) return None // marker misalignment
      var m = u8(bytes, i + 1)
      // fill bytes: any number of 0xFF before the marker code
      while (m == 0xFF && i + 2 < bytes.length) { i += 1; m = u8(bytes, i + 1) }
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) { i += 2 }
      else if (m == 0xD9) return None // EOI before any SOF
      else {
        if (i + 3 >= bytes.length) return None
        val segLen = be16(bytes, i + 2)
        if (segLen < 2 || i + 2 + segLen > bytes.length) return None
        val isSof = (m >= 0xC0 && m <= 0xCF) &&
          m != 0xC4 && m != 0xC8 && m != 0xCC // not DHT/JPG/DAC
        if (isSof) {
          if (segLen < 8) return None
          val precision = u8(bytes, i + 4)
          val height = be16(bytes, i + 5)
          val width = be16(bytes, i + 7)
          val comps = u8(bytes, i + 9)
          if (width <= 0 || height <= 0 || comps <= 0) return None
          return Some(JpegInfo(width, height, precision, comps,
            progressive = m == 0xC2 || m == 0xC6 || m == 0xCA || m == 0xCE))
        }
        i += 2 + segLen
      }
    }
    None
  }

  /** Parsed GIF logical-screen-descriptor fields. `gctBits` is the global
    * color table's size exponent (table holds 2^gctBits entries) when
    * `hasGct`, else 0.
    */
  final case class GifInfo(width: Int, height: Int, hasGct: Boolean,
                           gctBits: Int, colorResolution: Int)

  /** Parse a GIF header: GIF87a/GIF89a signature, then the logical screen
    * descriptor (width/height LE16, packed global-color-table fields).
    * Returns None for anything that is not a well-formed GIF prefix.
    */
  def parseGif(bytes: Array[Byte]): Option[GifInfo] = {
    if (bytes == null || bytes.length < 13) return None
    val sig = ascii(bytes, 0, 6)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val width = le16(bytes, 6)
    val height = le16(bytes, 8)
    if (width <= 0 || height <= 0) return None
    val packed = u8(bytes, 10)
    val hasGct = (packed & 0x80) != 0
    val gctBits = if (hasGct) (packed & 0x07) + 1 else 0
    // a declared GCT must actually fit in the payload (3 bytes/entry)
    if (hasGct && 13 + 3 * (1 << gctBits) > bytes.length) return None
    Some(GifInfo(width, height, hasGct, gctBits, ((packed >> 4) & 0x07) + 1))
  }

  /** Fully decoded PNG image: IHDR fields plus the raw 8-bit samples,
    * row-major and channel-interleaved (`samples.length == width * height *
    * info.channels`). Produced by [[decodePng]].
    */
  final case class PngPixels(info: PngInfo, samples: Array[Byte])

  // Adam7 pass grid: (xStart, yStart, xStep, yStep) per ISO 15948 §8.2
  private val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** FULL PNG pixel decode, dependency-free: chunk walk collecting IDAT,
    * `java.util.zip.Inflater` on the concatenated zlib stream, then
    * scanline unfiltering per ISO/IEC 15948 §9 (filters None/Sub/Up/
    * Average/Paeth) — for BOTH progressive layouts: sequential and Adam7
    * (each of the seven reduced images filters independently and scatters
    * onto the output grid per §8.2). Scope: 8-bit gray (0), truecolor (2),
    * gray+alpha (4) and RGBA (6); indexed (3) and sub-byte depths return
    * None (a curation pipeline quarantines those rather than mis-reading
    * them). Total like the header parsers: malformed streams yield None.
    *
    * Decoded output is capped at `maxPixels` (default 2^24 samples·channels
    * guard below) so a forged IHDR cannot allocate unbounded executor
    * memory — corpus blobs are untrusted by definition.
    */
  def decodePng(bytes: Array[Byte], maxPixels: Long = 1L << 24): Option[PngPixels] = {
    val info = parsePng(bytes) match {
      case Some(p) if p.bitDepth == 8 && p.interlace <= 1 && p.colorType != 3 => p
      case _ => return None
    }
    val nSamples = info.width.toLong * info.height * info.channels
    if (nSamples <= 0 || nSamples > maxPixels) return None
    // chunk walk: concatenate IDAT payloads until IEND
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var ended = false
    while (!ended && i + 8 <= bytes.length) {
      val len = be32(bytes, i)
      if (len < 0 || i + 12 + len > bytes.length) return None
      val typ = ascii(bytes, i + 4, 4)
      if (typ == "IDAT") idat.write(bytes, i + 8, len.toInt)
      else if (typ == "IEND") ended = true
      i += 12 + len.toInt
    }
    if (!ended || idat.size == 0) return None
    val bpp = info.channels
    // pass list: the full image (sequential) or the seven reduced images
    // (Adam7), each ph rows of (1 + pw*bpp) filtered bytes, concatenated
    val passes: Seq[(Int, Int, Int, Int, Int, Int)] = // (pw, ph, x0, y0, dx, dy)
      if (info.interlace == 0) Seq((info.width, info.height, 0, 0, 1, 1))
      else Adam7.map { case (x0, y0, dx, dy) =>
        (((info.width - x0 + dx - 1) / dx), ((info.height - y0 + dy - 1) / dy),
          x0, y0, dx, dy)
      }.toSeq
    val rawLen = passes.map { case (pw, ph, _, _, _, _) =>
      if (pw > 0 && ph > 0) ph.toLong * (1 + pw * bpp) else 0L
    }.sum
    if (rawLen > Int.MaxValue) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        // Any zero-byte step is failure: truncated stream (needsInput), a
        // preset-dictionary demand (FDICT bit set — needsDictionary, which
        // would otherwise spin this loop forever), or any other stall.
        if (n == 0) return None
        off += n
      }
      if (off != raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    val out = new Array[Byte](info.height * info.width * bpp)
    var rawOff = 0
    passes.foreach { case (pw, ph, x0, y0, dx, dy) =>
      if (pw > 0 && ph > 0) {
        val pass = unfilterPass(raw, rawOff, pw, ph, bpp).getOrElse(return None)
        rawOff += ph * (1 + pw * bpp)
        // scatter the reduced image onto the output grid
        var py = 0
        while (py < ph) {
          val oy = y0 + py * dy
          var px = 0
          while (px < pw) {
            val src = (py * pw + px) * bpp
            val dst = (oy * info.width + (x0 + px * dx)) * bpp
            var c = 0
            while (c < bpp) { out(dst + c) = pass(src + c); c += 1 }
            px += 1
          }
          py += 1
        }
      }
    }
    Some(PngPixels(info, out))
  }

  /** Unfilter one (reduced) image of `h` rows × `w` pixels starting at
    * `off` in the inflated stream (ISO 15948 §9.2): a is the byte bpp to
    * the left, b directly above, c above-left; all 0 off-edge. Each Adam7
    * pass filters independently, so the previous row is the previous row
    * OF THE PASS.
    */
  private def unfilterPass(raw: Array[Byte], off: Int, w: Int, h: Int,
                           bpp: Int): Option[Array[Byte]] = {
    val stride = w * bpp
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(off + y * (1 + stride)) & 0xFF
      if (ft > 4) return None
      val rowIn = off + y * (1 + stride) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xFF
        val a = if (x >= bpp) out(rowOut + x - bpp) & 0xFF else 0
        val b = if (y > 0) out(rowOut - stride + x) & 0xFF else 0
        val c = if (y > 0 && x >= bpp) out(rowOut - stride + x - bpp) & 0xFF else 0
        val rec = ft match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + ((a + b) >> 1)
          case 4 => // Paeth predictor, exact integer arithmetic per spec
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        out(rowOut + x) = (rec & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  /** Fully decoded GIF frame: LSD fields plus the raw PALETTE INDICES of
    * the first image, row-major (`indices.length == width * height`).
    * Indices, not colors — the curation-side stats a pipeline buckets on
    * (and the only thing the container actually stores per pixel).
    */
  final case class GifPixels(info: GifInfo, indices: Array[Byte])

  /** FULL GIF pixel decode, dependency-free: the first frame of
    * [[decodeGifFrames]]. Total like the other parsers.
    */
  def decodeGif(bytes: Array[Byte], maxPixels: Long = 1L << 24): Option[GifPixels] =
    decodeGifFrames(bytes, maxFrames = 1, maxPixels)
      .map(f => GifPixels(f.info, f.frames.head))

  /** All decoded frames of a (possibly animated) GIF, in stream order. */
  final case class GifFrames(info: GifInfo, frames: IndexedSeq[Array[Byte]])

  /** Multi-frame GIF pixel decode WITH animation composition: block walk
    * over every image descriptor, GIF-flavor LZW (GIF89a spec appendix F:
    * LSB-first codes, clear/end codes, 12-bit dictionary cap, deferred
    * growth) per frame over its concatenated data sub-blocks, 4-pass
    * de-interlace when flagged — then each decoded rect COMPOSES onto the
    * logical-screen canvas per the Graphics Control Extension (89a §23):
    * delta rects render at (left, top); transparent-index pixels leave the
    * canvas untouched; disposal 2 restores the frame's rect to the LSD
    * background index before the next frame, disposal 3 restores the
    * canvas snapshot from before the frame. Each emitted frame is the
    * full-screen canvas AFTER that frame — what a viewer shows.
    *
    * Composition happens in PALETTE-INDEX space (the only thing the
    * container stores per pixel): exact for the common GCT-only
    * animations (the JDK writes these; ImageIO parity is spec-locked);
    * frames carrying a local color table compose index-correctly but
    * their indices name per-frame colors — color-space analytics over
    * LCT animations should decode per-frame via palette lookup instead.
    * A rect that exceeds the logical screen fails the whole decode
    * (forged descriptors must not write out of bounds). Decoding stops at
    * `maxFrames` (allocation guard; 0 = unbounded up to the trailer).
    * Total — truncation and corruption yield None, never a throw.
    */
  def decodeGifFrames(bytes: Array[Byte], maxFrames: Int = 0,
                      maxPixels: Long = 1L << 24): Option[GifFrames] = {
    val info = parseGif(bytes) match {
      case Some(g) => g
      case None => return None
    }
    if (info.width.toLong * info.height > maxPixels) return None
    // LSD byte 11: background color index (meaningful with a GCT; 0 otherwise)
    val bg: Byte = if (info.hasGct) bytes(11) else 0
    val canvas = Array.fill[Byte](info.width * info.height)(bg)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // pending Graphics Control fields — apply to the NEXT image only
    var disposal = 0
    var transIdx = -1
    var i = 13 + (if (info.hasGct) 3 * (1 << info.gctBits) else 0)
    var done = false
    while (!done && i < bytes.length &&
        (maxFrames == 0 || frames.size < maxFrames)) {
      u8(bytes, i) match {
        case 0x21 => // extension: label byte, then sub-blocks to a 0 terminator
          val label = if (i + 1 < bytes.length) u8(bytes, i + 1) else -1
          // Graphics Control (0xF9): packed disposal bits + transparency
          if (label == 0xF9 && i + 7 < bytes.length && u8(bytes, i + 2) == 4) {
            val packed = u8(bytes, i + 3)
            disposal = (packed >> 2) & 0x07
            transIdx = if ((packed & 1) != 0) u8(bytes, i + 6) else -1
          }
          i += 2
          while (i < bytes.length && u8(bytes, i) != 0) i += 1 + u8(bytes, i)
          i += 1
        case 0x2C => // image descriptor
          if (i + 10 > bytes.length) return None
          val left = le16(bytes, i + 1); val top = le16(bytes, i + 3)
          val w = le16(bytes, i + 5); val h = le16(bytes, i + 7)
          val packed = u8(bytes, i + 9)
          i += 10
          if ((packed & 0x80) != 0) i += 3 * (1 << ((packed & 7) + 1)) // LCT
          if (w <= 0 || h <= 0 || left + w > info.width || top + h > info.height)
            return None
          if (i >= bytes.length) return None
          val minCode = u8(bytes, i); i += 1
          if (minCode < 2 || minCode > 11) return None
          val data = new java.io.ByteArrayOutputStream()
          while (i < bytes.length && u8(bytes, i) != 0) {
            val n = u8(bytes, i)
            if (i + 1 + n > bytes.length) return None
            data.write(bytes, i + 1, n); i += 1 + n
          }
          if (i >= bytes.length) return None
          i += 1 // block terminator
          val px = lzwDecode(data.toByteArray, minCode, w * h) match {
            case Some(p) => if ((packed & 0x40) != 0) deinterlace(p, w, h) else p
            case None => return None
          }
          // compose: snapshot first when disposal 3 will need it
          val before = if (disposal == 3) canvas.clone() else null
          var y = 0
          while (y < h) {
            val src = y * w
            val dst = (top + y) * info.width + left
            var x = 0
            while (x < w) {
              val v = px(src + x)
              if (transIdx < 0 || (v & 0xFF) != transIdx) canvas(dst + x) = v
              x += 1
            }
            y += 1
          }
          frames += canvas.clone()
          disposal match {
            case 2 => // restore the frame's rect to the background index
              var ry = 0
              while (ry < h) {
                java.util.Arrays.fill(canvas, (top + ry) * info.width + left,
                  (top + ry) * info.width + left + w, bg)
                ry += 1
              }
            case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
            case _ => () // 0/1: leave the canvas as rendered
          }
          disposal = 0; transIdx = -1
        case 0x3B => done = true // trailer
        case _ => return None
      }
    }
    if (frames.isEmpty) None else Some(GifFrames(info, frames.toIndexedSeq))
  }

  /** GIF-flavor LZW over a drained sub-block stream: codes LSB-first,
    * dictionary of (prefix, suffix) pairs capped at 4096, code width grows
    * when the dictionary fills its width, clear code resets. Emits exactly
    * `expected` indices or fails (None) — never over-reads or throws.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int,
                        expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val endCode = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expected)
    var outPos = 0
    var dictSize = endCode + 1
    var codeSize = minCode + 1
    var bitPos = 0
    var prev = -1
    var firstOfPrev: Byte = 0
    def readCode(): Int = {
      if (bitPos + codeSize > data.length * 8) return -1
      var v = 0; var got = 0
      while (got < codeSize) {
        v |= (((data(bitPos >> 3) & 0xFF) >> (bitPos & 7)) & 1) << got
        bitPos += 1; got += 1
      }
      v
    }
    while (outPos < expected) {
      val code = readCode()
      if (code < 0 || code == endCode) return None // ran dry before w*h pixels
      if (code == clear) {
        dictSize = endCode + 1; codeSize = minCode + 1; prev = -1
      } else {
        // expand into the stack (reversed); the KwKwK case (code ==
        // dictSize) re-emits prev's expansion plus its own first char
        var sp = 0
        var cur = code
        if (code >= dictSize) {
          if (code != dictSize || prev < 0) return None
          stack(sp) = firstOfPrev; sp += 1; cur = prev
        }
        while (cur >= clear + 2) { // walk the chain down to a root
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
          if (sp > 4096) return None // corrupt cycle
        }
        if (cur >= clear) return None // chain must end at a literal root
        val first = cur.toByte
        stack(sp) = first; sp += 1
        // emit reversed
        while (sp > 0 && outPos < expected) {
          sp -= 1; out(outPos) = stack(sp); outPos += 1
        }
        if (sp > 0) return None // produced MORE than w*h pixels: lying header
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev; suffix(dictSize) = first
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
        firstOfPrev = first
      }
    }
    Some(out)
  }

  /** GIF 4-pass interlace reorder: sequential source rows land on rows
    * 0,8,16… then 4,12… then 2,6,10… then 1,3,5… of the output.
    */
  private def deinterlace(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](px.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) {
        System.arraycopy(px, src * w, out, y * w, w)
        src += 1; y += step
      }
    }
    out
  }

  /** Parsed MPEG audio frame-header fields. `frameBytes` is the spec'd
    * length of the first frame (header + payload), from the published
    * per-layer length formulas.
    */
  final case class Mp3Info(version: String, layer: Int, bitrateKbps: Int,
                           sampleRateHz: Int, channels: Int, frameBytes: Int)

  // ISO/IEC 11172-3 / 13818-3 published tables, indexed [1..14] (0 = free
  // format — rejected, frame length is then undefined; 15 = forbidden)
  private val BitrateV1 = Array(
    Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448), // L1
    Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384), // L2
    Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)) // L3
  private val BitrateV2 = Array(
    Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256), // L1
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160), // L2
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)) // L3
  private val SampleRate = Map(
    "MPEG1" -> Array(44100, 48000, 32000),
    "MPEG2" -> Array(22050, 24000, 16000),
    "MPEG2.5" -> Array(11025, 12000, 8000))

  /** Parse an MPEG audio (MP3-family) frame header: optional ID3v2 tag
    * skip (syncsafe size), then the 4-byte frame header — version/layer
    * bits, bitrate and sample-rate table lookups, padding, channel mode —
    * and the per-layer frame-length formula. Free-format (bitrate index
    * 0) and all reserved encodings return None; the computed first frame
    * must FIT the payload (a lying header on a truncated blob rejects).
    *
    * No JDK MP3 encoder exists, so unlike the PNG/JPEG/WAV parsers this
    * one is validated against HAND-ASSEMBLED headers built from the
    * published bit layout plus rejection fixtures (MediaCodecSpec) — the
    * table constants themselves are the independent ground truth.
    */
  def parseMp3(bytes: Array[Byte]): Option[Mp3Info] = {
    if (bytes == null || bytes.length < 4) return None
    var i = 0
    if (bytes.length >= 10 && ascii(bytes, 0, 3) == "ID3") {
      // syncsafe 28-bit tag size; header is 10 bytes
      val sz = (u8(bytes, 6) << 21) | (u8(bytes, 7) << 14) |
        (u8(bytes, 8) << 7) | u8(bytes, 9)
      if ((u8(bytes, 6) | u8(bytes, 7) | u8(bytes, 8) | u8(bytes, 9)) >= 0x80)
        return None // syncsafe bytes must have bit 7 clear
      i = 10 + sz
      if (i + 4 > bytes.length) return None
    }
    if (u8(bytes, i) != 0xFF || (u8(bytes, i + 1) & 0xE0) != 0xE0) return None
    val b1 = u8(bytes, i + 1); val b2 = u8(bytes, i + 2); val b3 = u8(bytes, i + 3)
    val version = ((b1 >> 3) & 3) match {
      case 0 => "MPEG2.5"; case 2 => "MPEG2"; case 3 => "MPEG1"
      case _ => return None // reserved
    }
    val layer = ((b1 >> 1) & 3) match {
      case 1 => 3; case 2 => 2; case 3 => 1
      case _ => return None // reserved
    }
    val brIdx = (b2 >> 4) & 15
    if (brIdx == 0 || brIdx == 15) return None // free format / forbidden
    val bitrate =
      (if (version == "MPEG1") BitrateV1 else BitrateV2)(layer - 1)(brIdx - 1)
    val srIdx = (b2 >> 2) & 3
    if (srIdx == 3) return None // reserved
    val sampleRate = SampleRate(version)(srIdx)
    val padding = (b2 >> 1) & 1
    val channels = if (((b3 >> 6) & 3) == 3) 1 else 2
    val frameBytes = layer match {
      case 1 => (12 * bitrate * 1000 / sampleRate + padding) * 4
      case 2 => 144 * bitrate * 1000 / sampleRate + padding
      case 3 =>
        val coef = if (version == "MPEG1") 144 else 72
        coef * bitrate * 1000 / sampleRate + padding
    }
    if (i + frameBytes > bytes.length) return None // frame must fit
    Some(Mp3Info(version, layer, bitrate, sampleRate, channels, frameBytes))
  }

  /** Parse a WAV header: RIFF/WAVE container, then a chunk walk to `fmt `
    * (PCM layout fields) and `data` (payload size). Chunk order is NOT
    * assumed — LIST/INFO chunks before `fmt ` occur in the wild — and odd
    * chunk sizes advance by their spec'd pad byte.
    */
  def parseWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes == null || bytes.length < 44) return None
    if (ascii(bytes, 0, 4) != "RIFF" || ascii(bytes, 8, 4) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int, Int, Int)] = None
    var dataBytes = -1L
    while (i + 8 <= bytes.length && (fmt.isEmpty || dataBytes < 0)) {
      val id = ascii(bytes, i, 4)
      val size = le32(bytes, i + 4)
      if (size < 0 || i + 8 + size > bytes.length) return None
      if (id == "fmt " && size >= 16) {
        fmt = Some((le16(bytes, i + 8), le16(bytes, i + 10),
          le32(bytes, i + 12).toInt, le32(bytes, i + 16).toInt,
          le16(bytes, i + 20), le16(bytes, i + 22)))
      } else if (id == "data") {
        dataBytes = size
      }
      i += 8 + size.toInt + (size.toInt & 1) // pad byte on odd sizes
    }
    fmt match {
      case Some((af, ch, sr, br, ba, bps)) if dataBytes >= 0 && br > 0 =>
        Some(WavInfo(af, ch, sr, br, ba, bps, dataBytes,
          dataBytes * 1000000L / br))
      case _ => None
    }
  }

  // ------------------------------------------------------------------- AVI
  // Video container walk (Microsoft "AVI RIFF File Reference", public):
  // RIFF('AVI ') -> LIST(hdrl){avih, LIST(strl){strh, strf}} ->
  // LIST(movi){##dc/##db frames, possibly nested in LIST(rec )}. Frame
  // payloads decode with the existing from-scratch codecs: MJPG chunks
  // are complete JPEG streams ([[decodeJpeg]] — the round-15 Annex-F/G
  // pipeline), BI_RGB chunks are bottom-up 4-byte-padded BGR DIBs. Same
  // contract as the other parsers: total (None on anything malformed,
  // never throws), allocation-guarded against forged headers.

  /** Parsed AVI fields: logical frame size from `avih`, frame count,
    * frame duration, the video stream's handler fourcc (strh) and
    * BITMAPINFOHEADER compression fourcc + bit depth (strf).
    */
  final case class AviInfo(width: Int, height: Int, nFrames: Int,
                           usPerFrame: Int, handler: String,
                           compression: String, bitCount: Int)

  /** Decoded AVI video: every sampled frame as a full-canvas interleaved
    * sample array (`width * height * channels` bytes, top-down row-major
    * — gray or RGB depending on the frame codec's channel count).
    */
  final case class AviFrames(info: AviInfo, channels: Int,
                             frames: IndexedSeq[Array[Byte]])

  /** Header-only AVI parse: the avih main header plus the FIRST `vids`
    * stream's strh/strf fields. Streams other than the first video one
    * (audio, text) are walked over, not rejected.
    */
  def parseAvi(bytes: Array[Byte]): Option[AviInfo] = {
    if (bytes == null || bytes.length < 24) return None
    if (ascii(bytes, 0, 4) != "RIFF" || ascii(bytes, 8, 4) != "AVI ")
      return None
    val riffEnd = {
      val sz = le32(bytes, 4)
      if (sz < 4 || 8 + sz > bytes.length) return None
      (8 + sz).toInt
    }
    var width = -1; var height = -1; var nFrames = -1; var usPf = 0
    var handler = ""; var compression = ""; var bitCount = -1
    var sawVids = false
    // walk the hdrl list: avih, then each LIST(strl)'s strh/strf
    def walkStrl(from: Int, to: Int): Unit = {
      var i = from
      var fccType = ""
      while (i + 8 <= to) {
        val id = ascii(bytes, i, 4)
        val size = le32(bytes, i + 4)
        if (size < 0 || i + 8 + size > to) return
        val d = i + 8
        if (id == "strh" && size >= 8) {
          fccType = ascii(bytes, d, 4)
          if (fccType == "vids" && !sawVids) handler = ascii(bytes, d + 4, 4)
        } else if (id == "strf" && fccType == "vids" && !sawVids &&
            size >= 20) {
          // BITMAPINFOHEADER: biCompression fourcc at 16, biBitCount at 14
          bitCount = le16(bytes, d + 14)
          val comp = le32(bytes, d + 16)
          compression =
            if (comp == 0) "BI_RGB"
            else ascii(bytes, d + 16, 4)
          sawVids = true
        }
        i = d + size.toInt + (size.toInt & 1)
      }
    }
    def walkHdrl(from: Int, to: Int): Unit = {
      var i = from
      while (i + 8 <= to) {
        val id = ascii(bytes, i, 4)
        val size = le32(bytes, i + 4)
        if (size < 0 || i + 8 + size > to) return
        if (id == "avih" && size >= 40) {
          val d = i + 8
          usPf = le32(bytes, d).toInt
          nFrames = le32(bytes, d + 16).toInt
          width = le32(bytes, d + 32).toInt
          height = le32(bytes, d + 36).toInt
        } else if (id == "LIST" && size >= 4 &&
            ascii(bytes, i + 8, 4) == "strl") {
          walkStrl(i + 12, i + 8 + size.toInt)
        }
        i += 8 + size.toInt + (size.toInt & 1)
      }
    }
    var i = 12
    while (i + 8 <= riffEnd) {
      val id = ascii(bytes, i, 4)
      val size = le32(bytes, i + 4)
      if (size < 0 || i + 8 + size > riffEnd) return None
      if (id == "LIST" && size >= 4 && ascii(bytes, i + 8, 4) == "hdrl")
        walkHdrl(i + 12, i + 8 + size.toInt)
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (width <= 0 || height <= 0 || nFrames < 0 || !sawVids) None
    else Some(AviInfo(width, height, nFrames, usPf, handler, compression,
      bitCount))
  }

  /** Full AVI frame decode: walks the movi list (one level of LIST(rec )
    * nesting allowed, per spec) and decodes every video frame chunk —
    * `##dc` MJPEG payloads through [[decodeJpeg]], `##db`/`##dc` BI_RGB
    * payloads as bottom-up padded 24-bit BGR. Every decoded frame must
    * match the container dimensions and the first frame's channel count.
    * Decoding stops at `maxFrames` (allocation guard; 0 = all frames).
    */
  def decodeAviFrames(bytes: Array[Byte], maxFrames: Int = 0,
                      maxPixels: Long = 1L << 24): Option[AviFrames] = {
    val info = parseAvi(bytes) match {
      case Some(a) => a
      case None => return None
    }
    val w = info.width; val h = info.height
    if (w.toLong * h > maxPixels) return None
    val mjpeg = info.compression == "MJPG" || info.handler == "MJPG"
    val rgbDib = info.compression == "BI_RGB" && info.bitCount == 24
    if (!mjpeg && !rgbDib) return None // unsupported codec, not a throw
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var channels = 0
    def decodeFrame(id: String, from: Int, size: Int): Boolean = {
      // stream-number digits + dc (compressed) / db (uncompressed DIB)
      val vid = id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.substring(2) == "dc" || id.substring(2) == "db")
      if (!vid) return true // non-video chunk (audio, index): skip
      if (maxFrames > 0 && frames.size >= maxFrames) return true
      if (size == 0) return true // dropped-frame placeholder, legal
      if (mjpeg && id.substring(2) == "dc") {
        val payload = java.util.Arrays.copyOfRange(bytes, from, from + size)
        decodeJpeg(payload, maxPixels) match {
          case Some(jp) if jp.info.width == w && jp.info.height == h &&
              (channels == 0 || jp.channels == channels) =>
            channels = jp.channels
            frames += jp.samples
            true
          case _ => false
        }
      } else if (rgbDib) {
        val stride = ((w * 3 + 3) / 4) * 4
        if (size != stride * h) return false
        if (channels != 0 && channels != 3) return false
        channels = 3
        val out = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          val src = from + (h - 1 - y) * stride // bottom-up rows
          var x = 0
          while (x < w) {
            val o = (y * w + x) * 3
            out(o) = bytes(src + x * 3 + 2)     // B G R -> R G B
            out(o + 1) = bytes(src + x * 3 + 1)
            out(o + 2) = bytes(src + x * 3)
            x += 1
          }
          y += 1
        }
        frames += out
        true
      } else false
    }
    def walkMovi(from: Int, to: Int, depth: Int): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val id = ascii(bytes, i, 4)
        val size = le32(bytes, i + 4)
        if (size < 0 || i + 8 + size > to) return false
        if (id == "LIST" && size >= 4 && ascii(bytes, i + 8, 4) == "rec ") {
          if (depth >= 1) return false // spec allows ONE rec level
          if (!walkMovi(i + 12, i + 8 + size.toInt, depth + 1)) return false
        } else if (!decodeFrame(id, i + 8, size.toInt)) return false
        i += 8 + size.toInt + (size.toInt & 1)
      }
      true
    }
    val riffEnd = (8 + le32(bytes, 4)).toInt // bounds-checked by parseAvi
    var i = 12
    while (i + 8 <= riffEnd) {
      val id = ascii(bytes, i, 4)
      val size = le32(bytes, i + 4)
      if (size < 0 || i + 8 + size > riffEnd) return None
      if (id == "LIST" && size >= 4 && ascii(bytes, i + 8, 4) == "movi") {
        if (!walkMovi(i + 12, i + 8 + size.toInt, 0)) return None
      }
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (frames.isEmpty || channels == 0) None
    else Some(AviFrames(info, channels, frames.toIndexedSeq))
  }

  // ------------------------------------------------------------------ JPEG
  // Baseline-sequential pixel decode (ITU-T T.81 / ISO 10918-1): marker
  // walk -> canonical Huffman entropy decode (Annex F) -> dequantize ->
  // fixed-point 2-D IDCT -> level shift -> chroma upsample (replication)
  // -> YCbCr->RGB. Same contract as decodePng/decodeGif: total (None on
  // anything malformed, never throws), allocation-guarded against forged
  // headers, pure JDK arithmetic so the decode runs identically on any
  // executor.
  //
  // Determinism note: unlike PNG/GIF, JPEG decode is NOT uniquely defined
  // by its standard — T.81 only bounds IDCT error (IEEE 1180), so two
  // compliant decoders may differ by +-1 in AC-heavy blocks. This decoder
  // therefore NORMATIVELY pins its arithmetic: the 13-bit fixed-point
  // Loeffler-Ligtenberg-Moshovitz IDCT (the classic "islow" constants,
  // published in the JPEG literature), replication (nearest) chroma
  // upsampling, and 16-bit fixed-point CCIR 601 color conversion with
  // floor rounding. Two invariants follow and are spec-locked:
  //   - DC-only blocks decode EXACTLY on any compliant IDCT: coefficient
  //     F(0,0)=8k yields the flat value 128+k bit-for-bit (the basis of
  //     the arithmetic-predicted q_ext_multimodal_jpeg oracle), and
  //   - against the JDK's independent libjpeg-based reader, samples agree
  //     within the IEEE-1180-scale tolerance (JpegCodecSpec's parity
  //     bound), differing only where the standard itself permits.

  /** Fully decoded baseline JPEG: SOF fields plus 8-bit samples, row-major
    * and channel-interleaved (gray: 1 byte/pixel; color: RGB, 3). Produced
    * by [[decodeJpeg]].
    */
  final case class JpegPixels(info: JpegInfo, channels: Int, samples: Array[Byte])

  /** Zigzag index -> natural (row-major) index, T.81 Figure 5. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Entropy-segment bit reader: MSB-first within bytes, 0xFF00 byte
    * UN-stuffing, and non-stuffed markers surfaced (never consumed as
    * data). All reads are total: past-the-end or at-a-marker returns the
    * sentinel instead of throwing.
    */
  private final class JBitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var cnt = 0
    var atMarker = false
    var markerCode = 0

    /** Next bit, or -1 at a marker / end of data. */
    def bit(): Int = {
      if (cnt == 0) {
        if (atMarker || pos >= b.length) { atMarker = true; return -1 }
        val v = b(pos) & 0xFF
        pos += 1
        if (v == 0xFF) {
          if (pos >= b.length) { atMarker = true; return -1 }
          val m = b(pos) & 0xFF
          if (m != 0x00) { atMarker = true; markerCode = m; pos += 1; return -1 }
          pos += 1 // stuffed 0xFF00 -> a literal 0xFF data byte
        }
        cur = v
        cnt = 8
      }
      cnt -= 1
      (cur >> cnt) & 1
    }

    /** `n` bits MSB-first, or Int.MinValue on marker/end. n <= 16. */
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val x = bit()
        if (x < 0) return Int.MinValue
        v = (v << 1) | x
        i += 1
      }
      v
    }

    /** Consume an expected RSTn marker at a restart boundary: drop the
      * byte-padding bits, then require exactly the in-sequence marker.
      */
    def expectRestart(idx: Int): Boolean = expectMarker(0xD0 + idx)

    /** Require the EOI marker after the last MCU: a truncated entropy
      * stream that happened to satisfy every MCU must still quarantine
      * (None), matching the PNG decoder's complete-stream discipline.
      */
    def expectEoi(): Boolean = expectMarker(0xD9)

    private def expectMarker(code: Int): Boolean = {
      cnt = 0 // discard pad bits to the byte boundary
      if (!atMarker) {
        if (pos + 1 >= b.length || (b(pos) & 0xFF) != 0xFF) return false
        markerCode = b(pos + 1) & 0xFF
        atMarker = true
        pos += 2
      }
      if (markerCode == code) { atMarker = false; true } else false
    }
  }

  /** Canonical Huffman table (T.81 Annex C build, F.2.2.3 decode):
    * `counts(l-1)` codes of length l, symbols in code order.
    */
  private final class JHuff(counts: Array[Int], symbols: Array[Int]) {
    private val maxcode = new Array[Int](17)
    private val mincode = new Array[Int](17)
    private val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxcode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    /** Next symbol, or -1 on invalid code / marker / end. */
    def decode(r: JBitReader): Int = {
      var code = 0
      var l = 0
      while (l < 16) {
        val b = r.bit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
        if (maxcode(l) >= 0 && code <= maxcode(l))
          return symbols(valptr(l) + code - mincode(l))
      }
      -1
    }
  }

  /** T.81 F.2.2.1 EXTEND: interpret `v` (`t` bits) as the signed value of
    * category t.
    */
  @inline private def jExtend(v: Int, t: Int): Int =
    if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // 13-bit fixed-point IDCT constants (round(x * 8192)) — the classic
  // Loeffler-Ligtenberg-Moshovitz factorization's multipliers.
  private val FIX_0_298631336 = 2446L
  private val FIX_0_390180644 = 3196L
  private val FIX_0_541196100 = 4433L
  private val FIX_0_765366865 = 6270L
  private val FIX_0_899976223 = 7373L
  private val FIX_1_175875602 = 9633L
  private val FIX_1_501321110 = 12299L
  private val FIX_1_847759065 = 15137L
  private val FIX_1_961570560 = 16069L
  private val FIX_2_053119869 = 16819L
  private val FIX_2_562915447 = 20995L
  private val FIX_3_072711026 = 25172L
  private val ConstBits = 13
  private val Pass1Bits = 2

  @inline private def descale(x: Long, n: Int): Long = (x + (1L << (n - 1))) >> n

  /** 2-D 8x8 inverse DCT over dequantized coefficients (natural order),
    * level-shifted (+128) and clamped into `out` at `off` with row
    * `stride`. Long intermediates: a forged stream can carry coefficient
    * magnitudes beyond the spec range, and the decode must stay total
    * (wrong pixels for out-of-spec inputs are fine; UB is not).
    * DC-only blocks produce EXACTLY descale(dc, 3) + 128 per sample —
    * the exactness the arithmetic-predicted fixtures rely on.
    */
  private def idct8x8(coef: Array[Int], out: Array[Byte], off: Int,
                      stride: Int): Unit = {
    val ws = new Array[Long](64)
    // pass 1: columns (operating on natural-order coefficients)
    var c = 0
    while (c < 8) {
      if (coef(8 + c) == 0 && coef(16 + c) == 0 && coef(24 + c) == 0 &&
          coef(32 + c) == 0 && coef(40 + c) == 0 && coef(48 + c) == 0 &&
          coef(56 + c) == 0) {
        val dcval = coef(c).toLong << Pass1Bits
        var r = 0
        while (r < 8) { ws(r * 8 + c) = dcval; r += 1 }
      } else {
        val z2 = coef(16 + c).toLong
        val z3 = coef(48 + c).toLong
        val z1 = (z2 + z3) * FIX_0_541196100
        val t2 = z1 + z3 * -FIX_1_847759065
        val t3 = z1 + z2 * FIX_0_765366865
        val t0 = (coef(c).toLong + coef(32 + c)) << ConstBits
        val t1 = (coef(c).toLong - coef(32 + c)) << ConstBits
        val t10 = t0 + t3
        val t13 = t0 - t3
        val t11 = t1 + t2
        val t12 = t1 - t2
        var o0 = coef(56 + c).toLong
        var o1 = coef(40 + c).toLong
        var o2 = coef(24 + c).toLong
        var o3 = coef(8 + c).toLong
        var zz1 = o0 + o3
        var zz2 = o1 + o2
        var zz3 = o0 + o2
        var zz4 = o1 + o3
        val z5 = (zz3 + zz4) * FIX_1_175875602
        o0 *= FIX_0_298631336
        o1 *= FIX_2_053119869
        o2 *= FIX_3_072711026
        o3 *= FIX_1_501321110
        zz1 *= -FIX_0_899976223
        zz2 *= -FIX_2_562915447
        zz3 = zz3 * -FIX_1_961570560 + z5
        zz4 = zz4 * -FIX_0_390180644 + z5
        o0 += zz1 + zz3
        o1 += zz2 + zz4
        o2 += zz2 + zz3
        o3 += zz1 + zz4
        ws(c) = descale(t10 + o3, ConstBits - Pass1Bits)
        ws(56 + c) = descale(t10 - o3, ConstBits - Pass1Bits)
        ws(8 + c) = descale(t11 + o2, ConstBits - Pass1Bits)
        ws(48 + c) = descale(t11 - o2, ConstBits - Pass1Bits)
        ws(16 + c) = descale(t12 + o1, ConstBits - Pass1Bits)
        ws(40 + c) = descale(t12 - o1, ConstBits - Pass1Bits)
        ws(24 + c) = descale(t13 + o0, ConstBits - Pass1Bits)
        ws(32 + c) = descale(t13 - o0, ConstBits - Pass1Bits)
      }
      c += 1
    }
    // pass 2: rows, final descale + level shift + clamp
    val finalShift = ConstBits + Pass1Bits + 3
    var r = 0
    while (r < 8) {
      val base = r * 8
      val z2 = ws(base + 2)
      val z3 = ws(base + 6)
      val z1 = (z2 + z3) * FIX_0_541196100
      val t2 = z1 + z3 * -FIX_1_847759065
      val t3 = z1 + z2 * FIX_0_765366865
      val t0 = (ws(base) + ws(base + 4)) << ConstBits
      val t1 = (ws(base) - ws(base + 4)) << ConstBits
      val t10 = t0 + t3
      val t13 = t0 - t3
      val t11 = t1 + t2
      val t12 = t1 - t2
      var o0 = ws(base + 7)
      var o1 = ws(base + 5)
      var o2 = ws(base + 3)
      var o3 = ws(base + 1)
      var zz1 = o0 + o3
      var zz2 = o1 + o2
      var zz3 = o0 + o2
      var zz4 = o1 + o3
      val z5 = (zz3 + zz4) * FIX_1_175875602
      o0 *= FIX_0_298631336
      o1 *= FIX_2_053119869
      o2 *= FIX_3_072711026
      o3 *= FIX_1_501321110
      zz1 *= -FIX_0_899976223
      zz2 *= -FIX_2_562915447
      zz3 = zz3 * -FIX_1_961570560 + z5
      zz4 = zz4 * -FIX_0_390180644 + z5
      o0 += zz1 + zz3
      o1 += zz2 + zz4
      o2 += zz2 + zz3
      o3 += zz1 + zz4
      @inline def px(v: Long): Byte = {
        val s = descale(v, finalShift) + 128
        (if (s < 0) 0 else if (s > 255) 255 else s.toInt).toByte
      }
      val o = off + r * stride
      out(o) = px(t10 + o3)
      out(o + 7) = px(t10 - o3)
      out(o + 1) = px(t11 + o2)
      out(o + 6) = px(t11 - o2)
      out(o + 2) = px(t12 + o1)
      out(o + 5) = px(t12 - o1)
      out(o + 3) = px(t13 + o0)
      out(o + 4) = px(t13 - o0)
      r += 1
    }
  }

  private final case class JComp(id: Int, h: Int, v: Int, tq: Int,
                                 var td: Int = 0, var ta: Int = 0)

  /** FULL baseline JPEG pixel decode, dependency-free. Scope: baseline
    * sequential DCT (SOF0; SOF1 extended-sequential accepted — identical
    * coding at 8-bit precision), 8-bit samples, 1 (grayscale) or 3 (YCbCr)
    * components, any T.81-legal sampling factors (h,v in 1..4 — covers
    * 4:4:4, 4:2:0, 4:2:2, 4:4:0), restart markers, one interleaved scan.
    * Progressive (SOF2), arithmetic coding, hierarchical, 12-bit
    * precision, and multi-scan streams return None (a curation pipeline
    * quarantines them rather than mis-reading). Total like the header
    * parsers; output allocation capped via `maxPixels` (the component
    * planes round up to MCU multiples, bounded by the same cap scaled by
    * the worst-case 4x padding) so a forged SOF cannot allocate unbounded
    * executor memory.
    */
  def decodeJpeg(bytes: Array[Byte], maxPixels: Long = 1L << 24): Option[JpegPixels] = {
    if (bytes == null || bytes.length < 4) return None
    if (u8(bytes, 0) != 0xFF || u8(bytes, 1) != 0xD8) return None // SOI
    // quant tables in ZIGZAG order (dequantization multiplies by zigzag
    // index before the coefficient lands in natural order)
    val quant = Array.ofDim[Int](4, 64)
    val quantSeen = new Array[Boolean](4)
    val dcTables = new Array[JHuff](4)
    val acTables = new Array[JHuff](4)
    var comps: Array[JComp] = null
    var width = 0
    var height = 0
    var progressive = false
    var restartInterval = 0
    var sosAt = -1 // entropy data start, set when SOS parses
    var i = 2
    while (sosAt < 0 && i + 3 < bytes.length) {
      if (u8(bytes, i) != 0xFF) return None
      var m = u8(bytes, i + 1)
      while (m == 0xFF && i + 2 < bytes.length) { i += 1; m = u8(bytes, i + 1) }
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) { i += 2 }
      else if (m == 0xD9) return None // EOI before SOS
      else {
        if (i + 3 >= bytes.length) return None
        val segLen = be16(bytes, i + 2)
        if (segLen < 2 || i + 2 + segLen > bytes.length) return None
        val p0 = i + 4 // segment payload start
        val pEnd = i + 2 + segLen
        m match {
          case 0xDB => // DQT: one or more (Pq|Tq, 64 or 128 bytes) entries
            var p = p0
            while (p < pEnd) {
              val pq = u8(bytes, p) >> 4
              val tq = u8(bytes, p) & 15
              if (tq > 3 || pq > 1) return None
              val need = 1 + (if (pq == 0) 64 else 128)
              if (p + need > pEnd) return None
              var k = 0
              while (k < 64) {
                val v = if (pq == 0) u8(bytes, p + 1 + k)
                        else be16(bytes, p + 1 + 2 * k)
                if (v <= 0) return None
                quant(tq)(k) = v
                k += 1
              }
              quantSeen(tq) = true
              p += need
            }
          case 0xC4 => // DHT: one or more (Tc|Th, 16 counts, symbols)
            var p = p0
            while (p < pEnd) {
              if (p + 17 > pEnd) return None
              val tc = u8(bytes, p) >> 4
              val th = u8(bytes, p) & 15
              if (tc > 1 || th > 3) return None
              val counts = Array.tabulate(16)(l => u8(bytes, p + 1 + l))
              val total = counts.sum
              if (total == 0 || total > 256 || p + 17 + total > pEnd) return None
              val symbols = Array.tabulate(total)(k => u8(bytes, p + 17 + k))
              val huff = new JHuff(counts, symbols)
              if (tc == 0) dcTables(th) = huff else acTables(th) = huff
              p += 17 + total
            }
          case 0xC0 | 0xC1 => // SOF0 baseline / SOF1 extended sequential
            if (comps != null) return None // second frame header
            if (segLen < 8) return None
            val precision = u8(bytes, p0)
            height = be16(bytes, p0 + 1)
            width = be16(bytes, p0 + 3)
            val nf = u8(bytes, p0 + 5)
            if (precision != 8 || width <= 0 || height <= 0) return None
            if (nf != 1 && nf != 3) return None
            if (segLen != 8 + 3 * nf) return None
            comps = Array.tabulate(nf) { ci =>
              val q = p0 + 6 + 3 * ci
              val id = u8(bytes, q)
              val hv = u8(bytes, q + 1)
              val tq = u8(bytes, q + 2)
              JComp(id, hv >> 4, hv & 15, tq)
            }
            if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 ||
                c.tq > 3)) return None
          case 0xC2 => // SOF2 progressive DCT, Huffman (round 15)
            if (comps != null) return None
            if (segLen < 8) return None
            val precision = u8(bytes, p0)
            height = be16(bytes, p0 + 1)
            width = be16(bytes, p0 + 3)
            val nf = u8(bytes, p0 + 5)
            if (precision != 8 || width <= 0 || height <= 0) return None
            if (nf != 1 && nf != 3) return None
            if (segLen != 8 + 3 * nf) return None
            comps = Array.tabulate(nf) { ci =>
              val q = p0 + 6 + 3 * ci
              JComp(u8(bytes, q), u8(bytes, q + 1) >> 4,
                u8(bytes, q + 1) & 15, u8(bytes, q + 2))
            }
            if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 ||
                c.tq > 3)) return None
            progressive = true
          case c if (c >= 0xC3 && c <= 0xCF) && c != 0xC4 && c != 0xC8 =>
            return None // lossless / arithmetic / hierarchical: unsupported
          case 0xDD => // DRI
            if (segLen != 4) return None
            restartInterval = be16(bytes, p0)
          case 0xDA => // SOS
            if (comps == null) return None
            if (progressive) {
              // progressive: the scan loop re-parses from the marker —
              // headers (DHT/DQT/DRI) may also arrive BETWEEN scans
              sosAt = i
            } else {
              val ns = u8(bytes, p0)
              if (ns != comps.length) return None // one interleaved scan only
              if (segLen != 6 + 2 * ns) return None
              var k = 0
              while (k < ns) {
                val cs = u8(bytes, p0 + 1 + 2 * k)
                val tt = u8(bytes, p0 + 2 + 2 * k)
                val comp = comps.find(_.id == cs).getOrElse(return None)
                comp.td = tt >> 4
                comp.ta = tt & 15
                if (comp.td > 3 || comp.ta > 3) return None
                k += 1
              }
              // baseline spectral params must be 0..63 / 0 / 0
              if (u8(bytes, pEnd - 3) != 0 || u8(bytes, pEnd - 2) != 63 ||
                  u8(bytes, pEnd - 1) != 0) return None
              sosAt = pEnd
            }
          case _ => // APPn / COM / others: skip
        }
        if (sosAt < 0) i += 2 + segLen
      }
    }
    if (sosAt < 0 || comps == null) return None
    val channels = comps.length
    val nSamples = width.toLong * height * channels
    if (nSamples <= 0 || nSamples > maxPixels) return None
    comps.foreach { c =>
      if (!quantSeen(c.tq)) return None
      // baseline needs the first scan's tables NOW; progressive scans
      // validate the tables they actually reference, per scan
      if (!progressive &&
          (dcTables(c.td) == null || acTables(c.ta) == null)) return None
    }
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcuW = 8 * hmax
    val mcuH = 8 * vmax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    // component planes round up to whole MCUs: bounded by (w+mcuW)(h+mcuH)
    // per component — enforce against the cap with the padding allowance
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planeBytes = comps.indices.map(ci => planeW(ci).toLong * planeH(ci)).sum
    if (planeBytes > 8L * maxPixels) return None
    val planes = comps.indices.map(ci =>
      new Array[Byte](planeW(ci) * planeH(ci))).toArray
    if (progressive) {
      // coefficient planes hold one INT per padded sample (4x the byte
      // planes): tighter guard than the baseline path's, so a forged
      // SOF2 with extreme sampling factors cannot quadruple its way past
      // the cap
      if (planeBytes > 2L * maxPixels) return None
      val ok = decodeProgressiveScans(bytes, sosAt, comps, width, height,
        quant, dcTables, acTables, restartInterval, mcusX, mcusY,
        planeW, planeH, planes)
      if (!ok) return None
      return Some(assembleJpeg(comps, width, height, hmax, vmax, planeW,
        planes, channels, nSamples.toInt, progressive = true))
    }
    val r = new JBitReader(bytes, sosAt)
    val preds = new Array[Int](channels)
    val coef = new Array[Int](64)
    var rstIdx = 0
    var mcusDone = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcusDone > 0 &&
            mcusDone % restartInterval == 0) {
          if (!r.expectRestart(rstIdx)) return None
          rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(preds, 0)
        }
        var ci = 0
        while (ci < channels) {
          val c = comps(ci)
          val q = quant(c.tq)
          val dcH = dcTables(c.td)
          val acH = acTables(c.ta)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              // one block: DC diff + AC runs, dequantized into natural order
              java.util.Arrays.fill(coef, 0)
              val t = dcH.decode(r)
              if (t < 0 || t > 15) return None
              var diff = 0
              if (t > 0) {
                val v = r.receive(t)
                if (v == Int.MinValue) return None
                diff = jExtend(v, t)
              }
              preds(ci) += diff
              coef(0) = preds(ci) * q(0)
              var k = 1
              var eob = false
              while (!eob && k < 64) {
                val rs = acH.decode(r)
                if (rs < 0) return None
                val run = rs >> 4
                val size = rs & 15
                if (size == 0) {
                  if (run == 15) k += 16 // ZRL
                  else if (run == 0) eob = true
                  else return None
                } else {
                  k += run
                  if (k > 63) return None
                  val v = r.receive(size)
                  if (v == Int.MinValue) return None
                  coef(ZigZag(k)) = jExtend(v, size) * q(k)
                  k += 1
                }
              }
              idct8x8(coef, planes(ci),
                ((my * c.v + by) * 8) * planeW(ci) + (mx * c.h + bx) * 8,
                planeW(ci))
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcusDone += 1
        mx += 1
      }
      my += 1
    }
    if (!r.expectEoi()) return None
    Some(assembleJpeg(comps, width, height, hmax, vmax, planeW, planes,
      channels, nSamples.toInt, progressive = false))
  }

  /** Shared render tail: crop (gray) or replication-upsample + fixed-point
    * CCIR 601 YCbCr->RGB (color) from the decoded byte planes:
    *   r = y + floor((91881 (cr-128) + 32768) / 65536)
    *   g = y + floor((-22554 (cb-128) - 46802 (cr-128) + 32768) / 65536)
    *   b = y + floor((116130 (cb-128) + 32768) / 65536)
    * (floor = arithmetic shift; constants are round(x * 65536) of
    * 1.40200 / 0.34414 / 0.71414 / 1.77200) — normative for this decoder,
    * reproduced verbatim by the q_ext_multimodal_jpeg oracle.
    */
  private def assembleJpeg(comps: Array[JComp], width: Int, height: Int,
                           hmax: Int, vmax: Int, planeW: Seq[Int],
                           planes: Array[Array[Byte]], channels: Int,
                           nSamples: Int, progressive: Boolean): JpegPixels = {
    val out = new Array[Byte](nSamples)
    if (channels == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * pw, out, y * width, width)
        y += 1
      }
    } else {
      @inline def clamp(v: Int): Byte =
        (if (v < 0) 0 else if (v > 255) 255 else v).toByte
      val hY = comps(0).h; val vY = comps(0).v
      val hCb = comps(1).h; val vCb = comps(1).v
      val hCr = comps(2).h; val vCr = comps(2).v
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = planes(0)((y * vY / vmax) * planeW(0) + (x * hY / hmax)) & 0xFF
          val cb = (planes(1)((y * vCb / vmax) * planeW(1) + (x * hCb / hmax)) & 0xFF) - 128
          val cr = (planes(2)((y * vCr / vmax) * planeW(2) + (x * hCr / hmax)) & 0xFF) - 128
          val o = (y * width + x) * 3
          out(o) = clamp(yv + ((91881 * cr + 32768) >> 16))
          out(o + 1) = clamp(yv + ((-22554 * cb - 46802 * cr + 32768) >> 16))
          out(o + 2) = clamp(yv + ((116130 * cb + 32768) >> 16))
          x += 1
        }
        y += 1
      }
    }
    JpegPixels(JpegInfo(width, height, 8, channels, progressive),
      channels, out)
  }

  /** Natural index -> zigzag position (inverse of [[ZigZag]]): progressive
    * coefficients store in natural order; dequantization at render maps
    * back to the zigzag-ordered quant table.
    */
  private lazy val NatToZig: Array[Int] = {
    val inv = new Array[Int](64)
    var k = 0
    while (k < 64) { inv(ZigZag(k)) = k; k += 1 }
    inv
  }

  /** Progressive (SOF2) scan loop, T.81 Annex G decode: coefficient
    * planes accumulate across scans — DC first/refine (interleaved or
    * single-component), AC first/refine (single-component, spectral band
    * Ss..Se, successive approximation via Al/Ah, EOB-run codes) — with
    * DHT/DQT/DRI segments honored BETWEEN scans and restart markers
    * inside them; after EOI every padded block dequantizes and runs the
    * same fixed-point IDCT as the baseline path. Returns false on any
    * malformed structure (the caller quarantines). All reads are bounded;
    * coefficient memory is guarded by the caller's plane cap.
    */
  private def decodeProgressiveScans(bytes: Array[Byte], sosMarkerAt: Int,
                                     comps: Array[JComp], width: Int,
                                     height: Int, quant: Array[Array[Int]],
                                     dcTables: Array[JHuff],
                                     acTables: Array[JHuff],
                                     restartInterval0: Int, mcusX: Int,
                                     mcusY: Int, planeW: Seq[Int],
                                     planeH: Seq[Int],
                                     planes: Array[Array[Byte]]): Boolean = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val blocksW = comps.map(c => mcusX * c.h)
    val blocksH = comps.map(c => mcusY * c.v)
    // non-interleaved (single-component-scan) grids are UNPADDED per T.81:
    // ceil(ceil(dim * f / fmax) / 8)
    val niW = comps.map(c => (((width.toLong * c.h + hmax - 1) / hmax).toInt + 7) / 8)
    val niH = comps.map(c => (((height.toLong * c.v + vmax - 1) / vmax).toInt + 7) / 8)
    val coefs = comps.indices.map(ci =>
      new Array[Int](blocksW(ci) * blocksH(ci) * 64)).toArray
    var restartInterval = restartInterval0
    var i = sosMarkerAt // points at an FF xx marker
    var sawEoi = false
    while (!sawEoi) {
      if (i + 1 >= bytes.length || u8(bytes, i) != 0xFF) return false
      var m = u8(bytes, i + 1)
      while (m == 0xFF && i + 2 < bytes.length) { i += 1; m = u8(bytes, i + 1) }
      if (m == 0xD9) { sawEoi = true }
      else if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) i += 2
      else {
        if (i + 3 >= bytes.length) return false
        val segLen = be16(bytes, i + 2)
        if (segLen < 2 || i + 2 + segLen > bytes.length) return false
        val p0 = i + 4
        val pEnd = i + 2 + segLen
        m match {
          case 0xC4 => // DHT between scans
            var p = p0
            while (p < pEnd) {
              if (p + 17 > pEnd) return false
              val tc = u8(bytes, p) >> 4
              val th = u8(bytes, p) & 15
              if (tc > 1 || th > 3) return false
              val counts = Array.tabulate(16)(l => u8(bytes, p + 1 + l))
              val total = counts.sum
              if (total == 0 || total > 256 || p + 17 + total > pEnd) return false
              val symbols = Array.tabulate(total)(k => u8(bytes, p + 17 + k))
              val huff = new JHuff(counts, symbols)
              if (tc == 0) dcTables(th) = huff else acTables(th) = huff
              p += 17 + total
            }
            i += 2 + segLen
          case 0xDB => // DQT between scans
            var p = p0
            while (p < pEnd) {
              val pq = u8(bytes, p) >> 4
              val tq = u8(bytes, p) & 15
              if (tq > 3 || pq > 1) return false
              val need = 1 + (if (pq == 0) 64 else 128)
              if (p + need > pEnd) return false
              var k = 0
              while (k < 64) {
                val v = if (pq == 0) u8(bytes, p + 1 + k)
                        else be16(bytes, p + 1 + 2 * k)
                if (v <= 0) return false
                quant(tq)(k) = v
                k += 1
              }
              p += need
            }
            i += 2 + segLen
          case 0xDD =>
            if (segLen != 4) return false
            restartInterval = be16(bytes, p0)
            i += 2 + segLen
          case 0xDA => // one scan
            val ns = u8(bytes, p0)
            if (ns < 1 || ns > comps.length || segLen != 6 + 2 * ns)
              return false
            val scanComps = new Array[Int](ns) // indices into comps
            val scanTd = new Array[Int](ns)
            val scanTa = new Array[Int](ns)
            var k = 0
            while (k < ns) {
              val cs = u8(bytes, p0 + 1 + 2 * k)
              val ci = comps.indexWhere(_.id == cs)
              if (ci < 0 || scanComps.take(k).contains(ci)) return false
              scanComps(k) = ci
              scanTd(k) = u8(bytes, p0 + 2 + 2 * k) >> 4
              scanTa(k) = u8(bytes, p0 + 2 + 2 * k) & 15
              if (scanTd(k) > 3 || scanTa(k) > 3) return false
              k += 1
            }
            val ss = u8(bytes, pEnd - 3)
            val se = u8(bytes, pEnd - 2)
            val ah = u8(bytes, pEnd - 1) >> 4
            val al = u8(bytes, pEnd - 1) & 15
            val isDc = ss == 0
            if (isDc && se != 0) return false // DC scans carry (0, 0)
            if (!isDc && (ns != 1 || ss > se || se > 63)) return false
            if (ah > 13 || al > 13 || (ah != 0 && ah != al + 1)) return false
            if (isDc) {
              // DC-first scans read the DC table; DC-refine scans read
              // raw bits only
              if (ah == 0 && scanTd.exists(td => dcTables(td) == null))
                return false
            } else if (acTables(scanTa(0)) == null) return false // AC: both kinds
            val r = new JBitReader(bytes, pEnd)
            if (!decodeOneScan(r, comps, scanComps, scanTd, scanTa, ss, se,
                ah, al, restartInterval, mcusX, mcusY, blocksW, niW, niH,
                coefs, dcTables, acTables))
              return false
            // continue at the next marker (the reader may have consumed it)
            if (r.atMarker) i = r.pos - 2
            else {
              var p = r.pos
              if (p + 1 >= bytes.length || u8(bytes, p) != 0xFF) return false
              i = p
            }
          case _ => i += 2 + segLen // APPn/COM between scans
        }
      }
    }
    // render: dequantize each padded block (natural-order coefficients ×
    // zigzag-ordered quant) and IDCT into the byte planes
    val tmp = new Array[Int](64)
    comps.indices.foreach { ci =>
      val q = quant(comps(ci).tq)
      val bw = blocksW(ci)
      val bh = blocksH(ci)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          val base = (by * bw + bx) * 64
          var n = 0
          while (n < 64) {
            tmp(n) = coefs(ci)(base + n) * q(NatToZig(n))
            n += 1
          }
          idct8x8(tmp, planes(ci), (by * 8) * planeW(ci) + bx * 8, planeW(ci))
          bx += 1
        }
        by += 1
      }
    }
    true
  }

  /** Decode ONE progressive scan's entropy data into the coefficient
    * planes (T.81 G.2; the four scan kinds). Restart markers reset the
    * DC predictors AND the EOB run.
    */
  private def decodeOneScan(r: JBitReader, comps: Array[JComp],
                            scanComps: Array[Int], scanTd: Array[Int],
                            scanTa: Array[Int], ss: Int, se: Int, ah: Int,
                            al: Int, restartInterval: Int, mcusX: Int,
                            mcusY: Int, blocksW: Seq[Int], niW: Seq[Int],
                            niH: Seq[Int], coefs: Array[Array[Int]],
                            dcTables: Array[JHuff],
                            acTables: Array[JHuff]): Boolean = {
    val ns = scanComps.length
    var rstIdx = 0
    var unitsDone = 0
    var eobrun = 0
    val preds = new Array[Int](ns)
    @inline def maybeRestart(): Boolean = {
      if (restartInterval > 0 && unitsDone > 0 &&
          unitsDone % restartInterval == 0) {
        if (!r.expectRestart(rstIdx)) return false
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(preds, 0)
        eobrun = 0
      }
      true
    }
    // ---- DC scans -------------------------------------------------------
    def dcUnit(k: Int, blockBase: Int): Boolean = {
      val ci = scanComps(k)
      if (ah == 0) {
        val t = dcTables(scanTd(k)).decode(r)
        if (t < 0 || t > 15) return false
        var diff = 0
        if (t > 0) {
          val v = r.receive(t)
          if (v == Int.MinValue) return false
          diff = jExtend(v, t)
        }
        preds(k) += diff
        coefs(ci)(blockBase) = preds(k) << al
      } else {
        val bit = r.receive(1)
        if (bit == Int.MinValue) return false
        if (bit == 1) coefs(ci)(blockBase) |= (1 << al)
      }
      true
    }
    // ---- AC scans (single component) ------------------------------------
    def acFirstUnit(ci: Int, blockBase: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      val acH = acTables(scanTa(0))
      var k = ss
      while (k <= se) {
        val rs = acH.decode(r)
        if (rs < 0) return false
        val run = rs >> 4
        val size = rs & 15
        if (size == 0) {
          if (run == 15) k += 16 // ZRL
          else {
            eobrun = (1 << run) - 1
            if (run > 0) {
              val extra = r.receive(run)
              if (extra == Int.MinValue) return false
              eobrun += extra
            }
            return true
          }
        } else {
          k += run
          if (k > se) return false
          val v = r.receive(size)
          if (v == Int.MinValue) return false
          coefs(ci)(blockBase + ZigZag(k)) = jExtend(v, size) << al
          k += 1
        }
      }
      true
    }
    def acRefineUnit(ci: Int, blockBase: Int): Boolean = {
      val acH = acTables(scanTa(0))
      val p1 = 1 << al
      val m1 = -1 << al
      @inline def refine(c: Int): Boolean = {
        val bit = r.receive(1)
        if (bit == Int.MinValue) return false
        if (bit == 1 && (coefs(ci)(blockBase + c) & p1) == 0)
          coefs(ci)(blockBase + c) +=
            (if (coefs(ci)(blockBase + c) >= 0) p1 else m1)
        true
      }
      var k = ss
      if (eobrun == 0) {
        var broke = false
        while (!broke && k <= se) {
          val rs = acH.decode(r)
          if (rs < 0) return false
          var run = rs >> 4
          val size = rs & 15
          var newVal = 0
          if (size == 0) {
            if (run != 15) {
              eobrun = 1 << run
              if (run > 0) {
                val extra = r.receive(run)
                if (extra == Int.MinValue) return false
                eobrun += extra
              }
              broke = true
            }
            // run == 15: skip 16 zero-history coefficients, no new value
          } else {
            if (size != 1) return false
            val bit = r.receive(1)
            if (bit == Int.MinValue) return false
            newVal = if (bit == 1) p1 else m1
          }
          if (!broke) {
            var placed = false
            while (!placed && k <= se) {
              val c = ZigZag(k)
              if (coefs(ci)(blockBase + c) != 0) {
                if (!refine(c)) return false
              } else {
                if (run == 0) {
                  if (newVal != 0) coefs(ci)(blockBase + c) = newVal
                  placed = true
                } else run -= 1
              }
              k += 1
            }
            if (!placed && newVal != 0) return false // ran off the band
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          val c = ZigZag(k)
          if (coefs(ci)(blockBase + c) != 0) { if (!refine(c)) return false }
          k += 1
        }
        eobrun -= 1
      }
      true
    }
    // ---- drive the unit walk --------------------------------------------
    if (ss == 0 && ns > 1) {
      // interleaved DC scan over the padded MCU grid
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (!maybeRestart()) return false
          var k = 0
          while (k < ns) {
            val ci = scanComps(k)
            val c = comps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                val blockBase =
                  ((my * c.v + by) * blocksW(ci) + (mx * c.h + bx)) * 64
                if (!dcUnit(k, blockBase)) return false
                bx += 1
              }
              by += 1
            }
            k += 1
          }
          unitsDone += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // single-component scan (DC or AC) over the UNPADDED block grid
      val ci = scanComps(0)
      val bw = niW(ci)
      val bh = niH(ci)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          if (!maybeRestart()) return false
          val blockBase = (by * blocksW(ci) + bx) * 64
          val ok =
            if (ss == 0) dcUnit(0, blockBase)
            else if (ah == 0) acFirstUnit(ci, blockBase)
            else acRefineUnit(ci, blockBase)
          if (!ok) return false
          unitsDone += 1
          bx += 1
        }
        by += 1
      }
    }
    true
  }
}

