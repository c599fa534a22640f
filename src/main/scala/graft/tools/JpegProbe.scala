package graft.tools

/** Ad-hoc probe: decode JDK-encoded JPEGs with [[graft.ops.MediaCodec
  * .decodeJpeg]] and diff against the JDK's own reader — max/mean abs
  * sample error per (size, gray/color, quality) cell. The measurement
  * behind JpegCodecSpec's parity tolerance.
  */
object JpegProbe {
  def main(args: Array[String]): Unit = {
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
}
