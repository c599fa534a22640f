package graft.tools

/** Ad-hoc probe: decode JDK-encoded JPEGs with [[graft.ops.MediaCodec
  * .decodeJpeg]] and diff against the JDK's own reader — max/mean abs
  * sample error per (size, gray/color, quality) cell. The measurement
  * behind JpegCodecSpec's parity tolerance.
  */
object JpegProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("throughput")) { throughput(); return }
    val progressive = args.headOption.contains("progressive")
    for (gray <- Seq(true, false); q <- Seq(0.95f, 0.8f, 0.6f);
         (w, h) <- Seq((64, 48), (33, 17), (8, 8), (160, 120))) {
      val img = new java.awt.image.BufferedImage(w, h,
        if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // smooth gradients: isolates decoder parity from content —
          // fancy-vs-replication chroma upsampling differs on high-
          // frequency chroma by design, not by defect
          // wrap-free: a %256 sawtooth wrap is a chroma step edge where
          // fancy-vs-replication upsampling legitimately diverges
          val r = (x * 2 + y) * 255 / (2 * w + h)
          val g = (x + y * 2 + 50) * 255 / (w + 2 * h + 50)
          val b = (x + y + 120) * 255 / (w + h + 120)
          img.setRGB(x, y, if (gray) (r << 16) | (r << 8) | r
                           else (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
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
      val bytes = baos.toByteArray

      val ours = graft.ops.MediaCodec.decodeJpeg(bytes)
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      ours match {
        case None => println(s"gray=$gray q=$q ${w}x$h: OURS=None")
        case Some(px) =>
          var maxd = 0; var sumd = 0L; var n = 0
          var yy = 0
          while (yy < h) {
            var xx = 0
            while (xx < w) {
              // raster samples, not getRGB: TYPE_BYTE_GRAY getRGB runs a
              // linear->sRGB color-managed conversion (probed, PNG round)
              val (jr, jg, jb) =
                if (gray) { val v = jdk.getRaster.getSample(xx, yy, 0); (v, v, v) }
                else { val rgb = jdk.getRGB(xx, yy)
                       ((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF) }
              val o = (yy * w + xx) * px.channels
              val (or_, og, ob) =
                if (px.channels == 1) { val v = px.samples(o) & 0xFF; (v, v, v) }
                else ((px.samples(o) & 0xFF), (px.samples(o + 1) & 0xFF), (px.samples(o + 2) & 0xFF))
              for (d <- Seq(math.abs(jr - or_), math.abs(jg - og), math.abs(jb - ob))) {
                if (d > maxd) maxd = d
                sumd += d; n += 1
              }
              xx += 1
            }
            yy += 1
          }
          println(f"gray=$gray q=$q ${w}x$h ch=${px.channels}: max=$maxd mean=${sumd.toDouble / n}%.3f")
      }
    }
  }

  /** Single-thread decode throughput on a realistic lossy payload — the
    * per-core number the 100 TB posture scales by (decode runs in
    * mapPartitions, embarrassingly parallel, binary never shuffles).
    */
  private def throughput(): Unit = {
    val img = new java.awt.image.BufferedImage(160, 120,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 120; x <- 0 until 160) {
      val r = (x * 2 + y) * 255 / 440
      img.setRGB(x, y, (r << 16) | ((255 - r) << 8) | ((r * 7) % 256))
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val bytes = baos.toByteArray
    (1 to 3).foreach { rep =>
      val n = 2000
      val t0 = System.nanoTime()
      var i = 0
      var px = 0L
      while (i < n) {
        px += graft.ops.MediaCodec.decodeJpeg(bytes).get.samples.length
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[jpeg-tp] rep=$rep ${n / dt}%.0f imgs/s/core " +
        f"(160x120 color, ${bytes.length} B compressed; ${px / dt / 1e6}%.1f Msamples/s)")
    }
  }
}
