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
}
