package graft.tools

import graft.ops.{MediaCodec, Multimodal}

/** Round-16 scale probe for the AVI video tier: single-core decode
  * throughput of [[MediaCodec.decodeAviFrames]] over MJPEG containers
  * (the per-row CPU cost that sets mapPartitions wall-clock at 100 TB —
  * binary never shuffles, so frames/s/core IS the scaling number), plus
  * the distributed sampleAviFrames rate over a synthesized corpus.
  *
  * Usage: `sbt "runMain graft.tools.AviProbe [nContainers]"`.
  */
object AviProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    // single-core: n containers x 4 frames of 64x64 gray / 48x48 color
    val fixtures = (0 until n).map { i =>
      val gray = i % 2 == 0
      val (w, h, chroma) = if (gray) (64, 64, 0) else (48, 48, 1)
      Multimodal.encodeAvi(w, h,
        (0 until 4).map(f => Multimodal.encodeJpegDc(w, h, chroma, i.toLong + f)),
        mjpeg = true)
    }
    // warm-up then timed
    fixtures.take(50).foreach(MediaCodec.decodeAviFrames(_))
    val t0 = System.nanoTime()
    var frames = 0L
    var pixels = 0L
    fixtures.foreach { b =>
      val a = MediaCodec.decodeAviFrames(b).get
      frames += a.frames.size
      pixels += a.frames.size.toLong * a.info.width * a.info.height
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[avi] single-core: $n containers / $frames frames in $sec%.2fs" +
      f" = ${frames / sec}%.0f frames/s/core (${pixels / sec / 1e6}%.1f MPx/s)")

    // distributed: synthesizeAviMjpeg -> sampleAviFrames over 32 cores
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    import spark.implicits._
    val ids = spark.range(0, n.toLong * 20).as[Long]
    val t1 = System.nanoTime()
    val rows = Multimodal.sampleAviFrames(
      Multimodal.synthesizeAviMjpeg(ids), step = 1).count()
    val dsec = (System.nanoTime() - t1) / 1e9
    println(f"[avi] distributed: ${n * 20} containers -> $rows frame rows " +
      f"in $dsec%.2fs (32 cores, encode+decode)")
    spark.stop()
  }
}
