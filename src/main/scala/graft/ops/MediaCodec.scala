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
