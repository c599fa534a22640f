package graft.io

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Dependency-free legacy Excel (.xls, BIFF8) source — the last
  * reference-adapter surface (S3 covered OOXML via [[Xlsx]]; the
  * reference's `pd.read_excel` also accepts 97-2003 binaries). Written
  * against the PUBLIC Microsoft specs: [MS-CFB] (Compound File Binary:
  * 512-byte sectors, FAT/DIFAT chains, directory, mini-FAT/mini-stream)
  * and [MS-XLS] (BIFF8 record stream: BOF/BOUNDSHEET/SST with CONTINUE
  * fragments, LABELSST/LABEL/NUMBER/RK/MULRK/BOOLERR cell records, and
  * FORMULA cells via their CACHED results — number inline, string in the
  * trailing STRING record — matching `pd.read_excel`, which surfaces the
  * last-calculated value, never the formula text).
  *
  * Read contract matches [[Xlsx.read]]: all-string DataFrame, first row
  * as header (`pd.read_excel` defaults); numbers render integral values
  * without the trailing `.0` the float round-trip would add (the same
  * normalization the pipelines' `astype(str)` pass applies). Date-
  * FORMATTED numeric cells (FORMAT/XF walk + Date1904, see
  * [[ExcelDates]]) render as ISO strings — `pd.read_excel` parity, so
  * E7 coercion parses them instead of nulling the raw serial. The writer
  * is a minimal single-sheet BIFF8-in-CFB emitter — fixture/round-trip
  * support at the adapter boundary (like [[Xlsx.write]], driver-side by
  * design), not a data sink.
  */
object Xls {

  // ------------------------------------------------------------ [MS-CFB]

  private val EndOfChain = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD
  private val FreeSect = 0xFFFFFFFF

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    le16(b, i) | (le16(b, i + 2) << 16)

  /** Extract a named stream from a CFB container (v3, 512-byte sectors).
    * Follows the regular FAT chain, or the mini-FAT chain through the
    * root entry's mini stream for streams under the 4096-byte cutoff.
    */
  private[io] def cfbStream(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    if (bytes.length < 512) return None
    val sig = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    if (!sig.zipWithIndex.forall { case (v, i) => (bytes(i) & 0xFF) == v })
      return None
    val sectorShift = le16(bytes, 30)
    if (sectorShift != 9) return None // BIFF8 writers emit v3 (512-byte)
    val sz = 1 << sectorShift
    def sector(i: Int): Int = sz * (i + 1)
    val nSectors = (bytes.length - sz) / sz
    // FAT via the header DIFAT (109 entries) + chained DIFAT sectors
    val fatSectors = scala.collection.mutable.ArrayBuffer.empty[Int]
    var d = 0
    while (d < 109) {
      val s = le32(bytes, 76 + 4 * d)
      if (s != FreeSect && s >= 0) fatSectors += s
      d += 1
    }
    var difat = le32(bytes, 68)
    var difatGuard = 0
    while (difat != EndOfChain && difat != FreeSect && difat >= 0 &&
        difatGuard < nSectors) {
      val base = sector(difat)
      if (base + sz > bytes.length) return None
      var j = 0
      while (j < (sz / 4) - 1) {
        val s = le32(bytes, base + 4 * j)
        if (s != FreeSect && s >= 0) fatSectors += s
        j += 1
      }
      difat = le32(bytes, base + sz - 4)
      difatGuard += 1
    }
    val fat = new Array[Int](fatSectors.length * (sz / 4))
    fatSectors.zipWithIndex.foreach { case (s, k) =>
      val base = sector(s)
      if (base + sz > bytes.length) return None
      (0 until sz / 4).foreach(j => fat(k * (sz / 4) + j) = le32(bytes, base + 4 * j))
    }
    def chain(start: Int, guard: Int): Option[Seq[Int]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var s = start
      while (s != EndOfChain) {
        if (s < 0 || s >= fat.length || out.size > guard) return None
        out += s
        s = fat(s)
      }
      Some(out.toSeq)
    }
    def readChain(start: Int, size: Long): Option[Array[Byte]] =
      chain(start, nSectors).map { secs =>
        val out = new Array[Byte](size.toInt)
        var off = 0
        secs.foreach { s =>
          val n = math.min(sz, out.length - off)
          if (n > 0) {
            if (sector(s) + n > bytes.length) return None
            System.arraycopy(bytes, sector(s), out, off, n); off += n
          }
        }
        out
      }
    // directory
    val dirBytes = readChain(le32(bytes, 48), {
      // size unknown up front: chain length * sector size
      chain(le32(bytes, 48), nSectors).map(_.size.toLong * sz).getOrElse(return None)
    }).getOrElse(return None)
    final case class Entry(name: String, typ: Int, start: Int, size: Long)
    val entries = (0 until dirBytes.length / 128).map { k =>
      val o = k * 128
      val nameLen = le16(dirBytes, o + 64)
      val nm = if (nameLen >= 2)
        new String(dirBytes, o, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else ""
      Entry(nm, dirBytes(o + 66) & 0xFF, le32(dirBytes, o + 116),
        le32(dirBytes, o + 120).toLong & 0xFFFFFFFFL)
    }
    val root = entries.find(_.typ == 5).getOrElse(return None)
    val target = entries.find(e => e.typ == 2 && e.name == name)
      .getOrElse(return None)
    if (target.size >= 4096) readChain(target.start, target.size)
    else {
      // mini stream: root's regular chain, addressed in 64-byte sectors
      // through the mini-FAT
      val mini = readChain(root.start, root.size).getOrElse(return None)
      val miniFatBytes = readChain(le32(bytes, 60),
        le32(bytes, 64).toLong * sz).getOrElse(return None)
      val out = new Array[Byte](target.size.toInt)
      var off = 0
      var s = target.start
      var guard = 0
      while (s != EndOfChain && off < out.length) {
        if (s < 0 || (s + 1) * 64 > mini.length ||
            4 * s + 4 > miniFatBytes.length || guard > miniFatBytes.length)
          return None
        val n = math.min(64, out.length - off)
        System.arraycopy(mini, s * 64, out, off, n); off += n
        s = le32(miniFatBytes, 4 * s)
        guard += 1
      }
      if (off != out.length) None else Some(out)
    }
  }

  // ----------------------------------------------------------- [MS-XLS]

  /** BIFF8 XLUnicodeRichExtendedString at `pos` inside SST data (the
    * already-CONTINUE-concatenated byte stream, with fragment boundaries
    * in `breaks`): cch, grbit (fHighByte/fExtSt/fRichSt), optional
    * rich/ext sizes, then characters — compressed (1 byte/char, high
    * byte 0) or UTF-16LE, and a string broken across a CONTINUE boundary
    * re-declares its compression flag at the break. Returns (string,
    * next position).
    */
  private def readSstString(b: Array[Byte], pos0: Int,
                            breaks: Seq[Int]): (String, Int) = {
    var pos = pos0
    val cch = le16(b, pos); pos += 2
    var grbit = b(pos) & 0xFF; pos += 1
    val fRich = (grbit & 0x08) != 0
    val fExt = (grbit & 0x04) != 0
    val cRun = if (fRich) { val v = le16(b, pos); pos += 2; v } else 0
    val cbExt = if (fExt) { val v = le32(b, pos); pos += 4; v } else 0
    val sb = new java.lang.StringBuilder(cch)
    var read = 0
    var wide = (grbit & 0x01) != 0
    while (read < cch) {
      if (breaks.contains(pos)) { // continuation: re-read the option flags
        wide = (b(pos) & 0x01) != 0; pos += 1
      }
      if (wide) { sb.append(le16(b, pos).toChar); pos += 2 }
      else { sb.append(((b(pos) & 0xFF).toChar)); pos += 1 }
      read += 1
    }
    pos += cRun * 4 + cbExt // skip formatting runs / phonetic data
    (sb.toString, pos)
  }

  /** Decode a BIFF8 RK value: bit0 = divide by 100, bit1 = 30-bit int
    * (else the high 30 bits of an IEEE double).
    */
  private[io] def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 0x01) != 0) base / 100.0 else base
  }

  /** Integral doubles render without the float `.0` tail (pandas
    * `astype(str)` over object cells parity — the pipelines' stripDecimal
    * normalize makes this moot downstream, but the adapter shouldn't
    * manufacture decimals the file never had).
    */
  private def numStr(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** Read sheet `sheet` (0-based) of a BIFF8 .xls into an all-string
    * DataFrame, first row as header — [[Xlsx.read]] parity.
    */
  def read(spark: SparkSession, path: String, sheet: Int = 0): DataFrame = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val wb = cfbStream(bytes, "Workbook").orElse(cfbStream(bytes, "Book"))
      .getOrElse(throw new IllegalArgumentException(s"$path: no Workbook stream"))

    // ---- globals substream: SST + BOUNDSHEETs + number-format table ----
    val sst = scala.collection.mutable.ArrayBuffer.empty[String]
    val sheets = scala.collection.mutable.ArrayBuffer.empty[Int] // stream offsets
    // date-cell parity ([[ExcelDates]]): XF records in file order carry
    // ifmt; FORMAT records define custom codes; Date1904 flips the epoch
    val xfIfmt = scala.collection.mutable.ArrayBuffer.empty[Int]
    val customFmt = scala.collection.mutable.HashMap.empty[Int, String]
    var date1904 = false
    var p = 0
    var inGlobals = true
    while (inGlobals && p + 4 <= wb.length) {
      val rec = le16(wb, p); val len = le16(wb, p + 2)
      val d = p + 4
      rec match {
        case 0x0085 => // BOUNDSHEET: absolute stream position of sheet BOF
          sheets += le32(wb, d)
        case 0x0022 if len >= 2 => // Date1904
          date1904 = le16(wb, d) == 1
        case 0x00E0 if len >= 4 => // XF: ifmt at offset 2
          xfIfmt += le16(wb, d + 2)
        case 0x041E if len >= 5 => // FORMAT: ifmt + XLUnicodeString code
          val ifmt = le16(wb, d)
          val cch = le16(wb, d + 2)
          val wideF = (wb(d + 4) & 0x01) != 0
          val avail = math.min(len - 5, if (wideF) cch * 2 else cch)
          if (avail >= 0)
            customFmt(ifmt) =
              if (wideF) new String(wb, d + 5, avail,
                java.nio.charset.StandardCharsets.UTF_16LE)
              else new String(wb.slice(d + 5, d + 5 + avail)
                .map(b => (b & 0xFF).toChar))
        case 0x00FC => // SST (+ CONTINUEs): concatenate, remember breaks
          val data = scala.collection.mutable.ArrayBuffer.empty[Byte]
          data ++= wb.slice(d, d + len)
          val breaks = scala.collection.mutable.ArrayBuffer.empty[Int]
          var q = d + len
          while (q + 4 <= wb.length && le16(wb, q) == 0x003C) {
            val clen = le16(wb, q + 2)
            breaks += data.length
            data ++= wb.slice(q + 4, q + 4 + clen)
            q += 4 + clen
          }
          val arr = data.toArray
          val total = le32(arr, 4) // cstUnique
          var pos = 8
          var k = 0
          while (k < total && pos < arr.length) {
            val (s, np) = readSstString(arr, pos, breaks.toSeq)
            sst += s; pos = np; k += 1
          }
        case 0x000A => inGlobals = false // EOF of globals
        case _ =>
      }
      p += 4 + len
    }
    val sheetAt = sheets.lift(sheet).getOrElse(
      throw new IllegalArgumentException(s"no sheet $sheet in $path"))
    // per-XF date flag, resolved once (cell records index XFs by ixfe)
    val xfIsDate: Array[Boolean] =
      xfIfmt.map(ifmt => ExcelDates.isDateFormat(ifmt, customFmt)).toArray
    // date-formatted serial -> ISO string; anything unrepresentable (or a
    // non-date XF) keeps the numeric rendering
    def cellNum(ixfe: Int, v: Double): String =
      if (ixfe >= 0 && ixfe < xfIsDate.length && xfIsDate(ixfe))
        ExcelDates.serialToString(v, date1904).getOrElse(numStr(v))
      else numStr(v)

    // ---- worksheet substream: cell records until EOF ----
    val cells = scala.collection.mutable.HashMap.empty[(Int, Int), String]
    // FORMULA with a cached-string result: the value arrives in the next
    // STRING record ([MS-XLS] 2.4.268) — remember whose cell it fills.
    // ADVICE r16: any other CELL record disarms it, so a malformed
    // sequence can never route a later STRING into a stale cell.
    var pendingString: Option[(Int, Int)] = None
    p = sheetAt
    var done = false
    while (!done && p + 4 <= wb.length) {
      val rec = le16(wb, p); val len = le16(wb, p + 2)
      val d = p + 4
      rec match {
        case 0x00FD => // LABELSST
          pendingString = None
          val idx = le32(wb, d + 6)
          if (idx >= 0 && idx < sst.length)
            cells((le16(wb, d), le16(wb, d + 2))) = sst(idx)
        case 0x0204 => // LABEL (inline string cell, pre-SST files)
          pendingString = None
          val cch = le16(wb, d + 6)
          val widef = (wb(d + 8) & 0x01) != 0
          val s = if (widef)
            new String(wb, d + 9, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
          else new String(wb.slice(d + 9, d + 9 + cch).map(b => (b & 0xFF).toChar))
          cells((le16(wb, d), le16(wb, d + 2))) = s
        case 0x0203 => // NUMBER: IEEE double LE at offset 6
          pendingString = None
          var bits = 0L
          (0 until 8).foreach(j => bits |= (wb(d + 6 + j).toLong & 0xFF) << (8 * j))
          cells((le16(wb, d), le16(wb, d + 2))) =
            cellNum(le16(wb, d + 4), java.lang.Double.longBitsToDouble(bits))
        case 0x027E => // RK
          pendingString = None
          cells((le16(wb, d), le16(wb, d + 2))) =
            cellNum(le16(wb, d + 4), rkValue(le32(wb, d + 6)))
        case 0x00BD => // MULRK: run of [ixfe, RK], colFirst..colLast
          pendingString = None
          val rw = le16(wb, d); val colFirst = le16(wb, d + 2)
          val n = (len - 6) / 6
          (0 until n).foreach { j =>
            cells((rw, colFirst + j)) =
              cellNum(le16(wb, d + 4 + 6 * j), rkValue(le32(wb, d + 4 + 6 * j + 2)))
          }
        case 0x0205 => // BOOLERR: booleans as TRUE/FALSE, errors skipped
          pendingString = None
          if ((wb(d + 7) & 0xFF) == 0)
            cells((le16(wb, d), le16(wb, d + 2))) =
              if ((wb(d + 6) & 0xFF) != 0) "TRUE" else "FALSE"
        case 0x0006 if len >= 14 => // FORMULA: decode the CACHED result
          pendingString = None
          val rc = (le16(wb, d), le16(wb, d + 2))
          if (le16(wb, d + 12) == 0xFFFF) { // non-numeric sentinel
            (wb(d + 6) & 0xFF) match {
              case 0x00 => pendingString = Some(rc) // value in next STRING
              case 0x01 => // cached boolean
                cells(rc) = if ((wb(d + 8) & 0xFF) != 0) "TRUE" else "FALSE"
              case 0x03 => cells(rc) = "" // cached empty string
              case _ => // 0x02 cached error: skip, like BOOLERR errors
            }
          } else { // cached IEEE double
            var bits = 0L
            (0 until 8).foreach(j => bits |= (wb(d + 6 + j).toLong & 0xFF) << (8 * j))
            cells(rc) =
              cellNum(le16(wb, d + 4), java.lang.Double.longBitsToDouble(bits))
          }
        case 0x0207 if len >= 3 => // STRING: cached string of prior FORMULA
          pendingString.foreach { rc =>
            // chars may continue across CONTINUE records ([MS-XLS] 2.1.4),
            // each fragment re-declaring its compression flag — stitch
            // them, like the SST path (ADVICE r16)
            val cch = le16(wb, d)
            val sb = new java.lang.StringBuilder(cch)
            var wide = (wb(d + 2) & 0x01) != 0
            var q = d + 3
            var end = math.min(d + len, wb.length)
            var nextRec = p + 4 + len
            var truncated = false // malformed tail: keep what decoded
            while (sb.length < cch && !truncated) {
              if (q >= end) { // hop into the next CONTINUE fragment
                if (nextRec + 4 > wb.length || le16(wb, nextRec) != 0x003C)
                  truncated = true
                else {
                  val clen = le16(wb, nextRec + 2)
                  q = nextRec + 4
                  end = math.min(q + clen, wb.length)
                  nextRec = q + clen
                  if (clen > 0 && q < end) { wide = (wb(q) & 0x01) != 0; q += 1 }
                  else if (clen > 0) truncated = true
                }
              } else if (wide) {
                if (q + 2 > end) truncated = true
                else { sb.append(le16(wb, q).toChar); q += 2 }
              } else { sb.append((wb(q) & 0xFF).toChar); q += 1 }
            }
            cells(rc) = sb.toString
          }
          pendingString = None
        case 0x000A => done = true
        case _ =>
      }
      p += 4 + len
    }
    require(cells.nonEmpty, s"empty sheet in $path")

    val headerRow = cells.keys.map(_._1).min
    val nCols = cells.keys.map(_._2).max + 1
    val header = (0 until nCols).map(i =>
      cells.getOrElse((headerRow, i), s"_c$i").trim)
    val dataRows = cells.keys.map(_._1).filter(_ > headerRow).toSeq.sorted
    val data = dataRows.map(r =>
      Row.fromSeq((0 until nCols).map(i => cells.get((r, i)).orNull)))
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
  }

  // ------------------------------------------------------------- writer

  /** Write a (small, dim-scale) DataFrame as a single-sheet BIFF8 .xls —
    * header row + cells as SST strings, wrapped in a v3 CFB container.
    * Adapter-boundary fixture support, mirroring [[Xlsx.write]]; the
    * frame is collected to the driver by design.
    *
    * Columns named in `dateColumns` whose values are ISO dates
    * (`yyyy-MM-dd[ HH:mm:ss]`) are written as date-FORMATTED NUMBER cells
    * (serial + an XF carrying builtin date ifmt 22) — the workbook shape
    * `pd.read_excel` surfaces as datetimes, and [[read]] renders back as
    * the same ISO strings.
    */
  def write(df: DataFrame, path: String, dateColumns: Set[String] = Set.empty): Unit = {
    val cols = df.columns
    val rows = df.collect()
    // typed timestamp/date columns are date cells automatically (see
    // [[Xlsx.write]] — `to_excel` parity)
    val dateCol: Array[Boolean] = df.schema.fields.map(f =>
      dateColumns.contains(f.name) ||
        f.dataType == org.apache.spark.sql.types.TimestampType ||
        f.dataType == org.apache.spark.sql.types.DateType)
    val strings = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sstIdx(s: String): Int =
      strings.getOrElseUpdate(s, strings.size)
    // (row, col, Left(sstIdx) | Right(dateSerial)); row 0 = header
    val cellRefs: Seq[(Int, Int, Either[Int, Double])] =
      (cols.zipWithIndex.map { case (c, i) => (0, i, Left(sstIdx(c))) }) ++
        rows.zipWithIndex.flatMap { case (r, k) =>
          cols.indices.flatMap { i =>
            Option(r.get(i)).map { v =>
              val s = v.toString
              val serial =
                if (dateCol(i)) ExcelDates.dateToSerial(s) else None
              (k + 1, i, serial.toRight(sstIdx(s)))
            }
          }
        }
    val totalRefs = cellRefs.count(_._3.isLeft)

    val bo = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = bo.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit = { w16(v); w16(v >> 16) }
    def record(id: Int, body: Array[Byte]): Unit = {
      w16(id); w16(body.length); bo.write(body, 0, body.length)
    }
    def bofBody(dt: Int): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      def x16(v: Int): Unit = { b.write(v & 0xFF); b.write((v >> 8) & 0xFF) }
      def x32(v: Int): Unit = { x16(v); x16(v >> 16) }
      x16(0x0600); x16(dt); x16(0x0DBB); x16(0x07CC); x32(0xC1); x32(0x0306)
      b.toByteArray
    }
    // globals: BOF, BOUNDSHEET (position patched after layout), SST, EOF.
    // Two-pass: sizes of SST/globals are computed by writing to buffers.
    // SST paged into the leading record + CONTINUE fragments (record data
    // cap 8224 per [MS-XLS]). Strings break mid-characters when a page
    // fills: the next fragment re-declares the option-flags byte, wide
    // chars never straddle a boundary — exactly the layout the reader's
    // `breaks` handling decodes.
    val sstPages: Seq[Array[Byte]] = {
      val cap = 8000
      val pages = scala.collection.mutable.ArrayBuffer(
        new java.io.ByteArrayOutputStream())
      def page = pages.last
      def x8(v: Int): Unit = page.write(v & 0xFF)
      def x16(v: Int): Unit = { x8(v); x8(v >> 8) }
      def x32(v: Int): Unit = { x16(v); x16(v >> 16) }
      def newPage(): Unit = pages += new java.io.ByteArrayOutputStream()
      x32(totalRefs); x32(strings.size)
      strings.keys.foreach { s =>
        require(s.length < 0x2000, "xls writer: string too long")
        if (page.size() + 5 > cap) newPage() // never split the header
        x16(s.length); x8(0x01) // UTF-16LE (fHighByte)
        s.foreach { c =>
          if (page.size() + 2 > cap) { newPage(); x8(0x01) } // re-declare
          x16(c.toInt)
        }
      }
      pages.map(_.toByteArray).toSeq
    }
    val sheetBody = {
      val b = new java.io.ByteArrayOutputStream()
      def x16(v: Int): Unit = { b.write(v & 0xFF); b.write((v >> 8) & 0xFF) }
      def x32(v: Int): Unit = { x16(v); x16(v >> 16) }
      val bof = bofBody(0x0010) // worksheet
      x16(0x0809); x16(bof.length); b.write(bof, 0, bof.length)
      cellRefs.foreach {
        case (r, c, Left(idx)) => // LABELSST, General XF 0
          x16(0x00FD); x16(10); x16(r); x16(c); x16(0); x32(idx)
        case (r, c, Right(serial)) => // NUMBER with the date XF 1
          x16(0x0203); x16(14); x16(r); x16(c); x16(1)
          val bits = java.lang.Double.doubleToLongBits(serial)
          (0 until 8).foreach(j => b.write(((bits >> (8 * j)) & 0xFF).toInt))
      }
      x16(0x000A); x16(0)
      b.toByteArray
    }
    // XF table: 0 = General (ifmt 0), 1 = builtin date-time ifmt 22 —
    // 20-byte records, only ifmt (offset 2) is semantically load-bearing
    def xfBody(ifmt: Int): Array[Byte] = {
      val b = new Array[Byte](20)
      b(2) = (ifmt & 0xFF).toByte; b(3) = ((ifmt >> 8) & 0xFF).toByte
      b
    }
    // globals size: BOF(4+16) + BOUNDSHEET(4+8+name) + 2 XF(4+20 each) +
    // SST/CONTINUE records (4+len each) + EOF(4)
    val sheetName = "Sheet1"
    val globalsLen = (4 + 16) + (4 + 6 + 2 + sheetName.length) +
      2 * (4 + 20) + sstPages.map(4 + _.length).sum + 4
    record(0x0809, bofBody(0x0005)) // globals BOF
    val bsBody = new java.io.ByteArrayOutputStream()
    bsBody.write(Array[Byte]((globalsLen & 0xFF).toByte,
      ((globalsLen >> 8) & 0xFF).toByte, ((globalsLen >> 16) & 0xFF).toByte,
      ((globalsLen >> 24) & 0xFF).toByte, 0, 0), 0, 6)
    bsBody.write(sheetName.length); bsBody.write(0x00) // compressed name
    sheetName.foreach(c => bsBody.write(c.toInt & 0xFF))
    record(0x0085, bsBody.toByteArray)
    record(0x00E0, xfBody(0))
    record(0x00E0, xfBody(22))
    record(0x00FC, sstPages.head)
    sstPages.tail.foreach(record(0x003C, _))
    record(0x000A, Array.emptyByteArray)
    require(bo.size() == globalsLen, s"globals layout ${bo.size()} != $globalsLen")
    bo.write(sheetBody, 0, sheetBody.length)
    val workbook = bo.toByteArray

    Files.write(Paths.get(path), cfbWrap("Workbook", workbook))
  }

  /** Wrap one stream in a v3 CFB container (512-byte sectors; the mini
    * stream is used below the 4096-byte cutoff, per spec).
    */
  private[io] def cfbWrap(streamName: String, stream: Array[Byte]): Array[Byte] = {
    val sz = 512
    val useMini = stream.length < 4096
    val miniSectors = if (useMini) (stream.length + 63) / 64 else 0
    val miniBytes = miniSectors * 64
    val miniStreamSectors = if (useMini) (miniBytes + sz - 1) / sz else 0
    val streamSectors = if (useMini) 0 else (stream.length + sz - 1) / sz
    // layout: [FAT...][DIR][MINIFAT?][ministream|stream sectors]
    // iterate: nFat depends on total sectors
    var nFat = 1
    var total = 0
    var guard = 0
    while (guard < 8) {
      total = nFat + 1 + (if (useMini) 1 else 0) + miniStreamSectors + streamSectors
      val need = (total + (sz / 4) - 1) / (sz / 4)
      if (need == nFat) guard = 8 else { nFat = need; guard += 1 }
    }
    require(nFat <= 109, "xls writer: stream too large for header DIFAT")
    val dirSector = nFat
    val miniFatSector = if (useMini) nFat + 1 else -1
    val dataStart = nFat + 1 + (if (useMini) 1 else 0)
    val out = new Array[Byte](sz + total * sz)
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    def put32(o: Int, v: Int): Unit = { put16(o, v); put16(o + 2, v >> 16) }
    // header
    val sig = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    sig.zipWithIndex.foreach { case (v, i) => out(i) = v.toByte }
    put16(24, 0x003E); put16(26, 0x0003); put16(28, 0xFFFE) // minor/major/LE
    put16(30, 9); put16(32, 6) // sector 512, mini 64
    put32(44, nFat)
    put32(48, dirSector)
    put32(56, 4096)
    put32(60, if (useMini) miniFatSector else EndOfChain)
    put32(64, if (useMini) 1 else 0)
    put32(68, EndOfChain); put32(72, 0) // no DIFAT sectors
    (0 until 109).foreach(i => put32(76 + 4 * i, FreeSect))
    (0 until nFat).foreach(i => put32(76 + 4 * i, i))
    def sOff(i: Int): Int = sz * (i + 1)
    // FAT: every entry FREESECT first, chains overwrite below
    val fatPut = (idx: Int, v: Int) =>
      put32(sOff(idx / (sz / 4)) + 4 * (idx % (sz / 4)), v)
    (0 until nFat * (sz / 4)).foreach(i => fatPut(i, FreeSect))
    (0 until nFat).foreach(i => fatPut(i, FatSect))
    fatPut(dirSector, EndOfChain)
    if (useMini) fatPut(miniFatSector, EndOfChain)
    val dataSectors = if (useMini) miniStreamSectors else streamSectors
    (0 until dataSectors).foreach { i =>
      fatPut(dataStart + i,
        if (i == dataSectors - 1) EndOfChain else dataStart + i + 1)
    }
    // directory: root + stream
    val dir = sOff(dirSector)
    def dirEntry(slot: Int, name: String, typ: Int, start: Int, size: Int,
                 child: Int): Unit = {
      val o = dir + slot * 128
      name.zipWithIndex.foreach { case (c, i) => put16(o + 2 * i, c.toInt) }
      put16(o + 64, (name.length + 1) * 2)
      out(o + 66) = typ.toByte
      out(o + 67) = 1 // black
      put32(o + 68, -1); put32(o + 72, -1); put32(o + 76, child)
      put32(o + 116, start); put32(o + 120, size)
    }
    // unused slots must read as free (type 0): zero bytes already
    (0 until 4).foreach { slot =>
      val o = dir + slot * 128
      put32(o + 68, -1); put32(o + 72, -1); put32(o + 76, -1)
    }
    dirEntry(0, "Root Entry", 5,
      if (useMini) dataStart else EndOfChain, miniBytes, 1)
    dirEntry(1, streamName, 2,
      if (useMini) 0 else dataStart, stream.length, -1)
    if (useMini) {
      // mini-FAT: one chain 0..miniSectors-1
      (0 until sz / 4).foreach(i => put32(sOff(miniFatSector) + 4 * i, FreeSect))
      (0 until miniSectors).foreach { i =>
        put32(sOff(miniFatSector) + 4 * i,
          if (i == miniSectors - 1) EndOfChain else i + 1)
      }
    }
    System.arraycopy(stream, 0, out, sOff(dataStart), stream.length)
    out
  }
}
