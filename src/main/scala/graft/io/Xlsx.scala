package graft.io

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import scala.collection.mutable

/** Dependency-free xlsx adapter (SURVEY §2.1 S3/S6). No POI jar exists in
  * this environment, so this is a minimal OOXML SpreadsheetML reader/writer
  * over the JDK's zip + StAX — enough for the reference's workbook shapes
  * (header row + string/number cells; shared strings, inline strings).
  *
  * DRIVER-SIDE by design: the reference's Excel files are small inputs and
  * single-file outputs (`pd.read_excel`/`to_excel` on BytesIO). Big data
  * never flows through xlsx — that's the adapter-boundary contract
  * (SURVEY §7.5); engine-scale I/O is parquet/CSV.
  *
  * Number formats ARE interpreted for dates (round-16 verdict item 3):
  * styles.xml cellXfs + numFmts are walked and date-formatted numeric
  * cells render as ISO strings via [[ExcelDates]] (`pd.read_excel`
  * surfaces them as datetimes; the raw serial would null out at the E7
  * coercion). Other formats and formulas (cached values are read) stay
  * uninterpreted.
  */
object Xlsx {

  /** Column index of a cell reference: "A1" -> 0, "AB7" -> 27. */
  private[io] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1

  private def parseSharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return IndexedSeq.empty
    val in = zip.getInputStream(entry)
    val reader = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inT = false
    try {
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            reader.getLocalName match {
              case "si" => cur.clear()
              case "t" => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT => cur.append(reader.getText)
          case XMLStreamConstants.END_ELEMENT =>
            reader.getLocalName match {
              case "t" => inT = false
              case "si" => out += cur.toString
              case _ =>
            }
          case _ =>
        }
      }
    } finally { reader.close(); in.close() }
    out.toIndexedSeq
  }

  /** Per-cellXf date flag from xl/styles.xml (ECMA-376 §18.8): cellXfs
    * entries carry numFmtId, numFmts define custom codes. Empty when the
    * part is absent (our own writer's string-only workbooks).
    */
  private def parseStyles(zip: ZipFile): IndexedSeq[Boolean] = {
    val entry = zip.getEntry("xl/styles.xml")
    if (entry == null) return IndexedSeq.empty
    val in = zip.getInputStream(entry)
    val reader = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val custom = mutable.HashMap.empty[Int, String]
    val xfIds = mutable.ArrayBuffer.empty[Int]
    var inCellXfs = false
    try {
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            reader.getLocalName match {
              case "numFmt" =>
                for {
                  id <- Option(reader.getAttributeValue(null, "numFmtId"))
                  code <- Option(reader.getAttributeValue(null, "formatCode"))
                } custom(id.trim.toInt) = code
              case "cellXfs" => inCellXfs = true
              case "xf" if inCellXfs =>
                xfIds += Option(reader.getAttributeValue(null, "numFmtId"))
                  .map(_.trim.toInt).getOrElse(0)
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT =>
            if (reader.getLocalName == "cellXfs") inCellXfs = false
          case _ =>
        }
      }
    } finally { reader.close(); in.close() }
    xfIds.map(ExcelDates.isDateFormat(_, custom)).toIndexedSeq
  }

  /** workbookPr date1904 flag from xl/workbook.xml. */
  private def parseDate1904(zip: ZipFile): Boolean = {
    val entry = zip.getEntry("xl/workbook.xml")
    if (entry == null) return false
    val in = zip.getInputStream(entry)
    val reader = XMLInputFactory.newInstance().createXMLStreamReader(in)
    var flag = false
    try {
      while (reader.hasNext) {
        if (reader.next() == XMLStreamConstants.START_ELEMENT &&
            reader.getLocalName == "workbookPr")
          flag = Option(reader.getAttributeValue(null, "date1904"))
            .exists(v => v == "1" || v.equalsIgnoreCase("true"))
      }
    } finally { reader.close(); in.close() }
    flag
  }

  private def parseSheet(zip: ZipFile, sheetEntry: ZipEntry,
                         shared: IndexedSeq[String],
                         xfIsDate: IndexedSeq[Boolean],
                         date1904: Boolean): Seq[Map[Int, String]] = {
    val in = zip.getInputStream(sheetEntry)
    val reader = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val rows = mutable.ArrayBuffer.empty[Map[Int, String]]
    var row = mutable.Map.empty[Int, String]
    var cellCol = -1; var cellType = ""; var cellStyle = -1
    var inV = false; var inIsT = false
    val value = new StringBuilder
    try {
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            reader.getLocalName match {
              case "row" =>
                row = mutable.Map.empty
                cellCol = -1 // r= is optional; the cursor restarts every row
              case "c" =>
                cellCol = Option(reader.getAttributeValue(null, "r"))
                  .map(colIndex).getOrElse(cellCol + 1)
                cellType = Option(reader.getAttributeValue(null, "t")).getOrElse("")
                cellStyle = Option(reader.getAttributeValue(null, "s"))
                  .flatMap(_.trim.toIntOption).getOrElse(-1)
                value.clear()
              case "v" => inV = true
              case "t" => inIsT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inV || inIsT =>
            value.append(reader.getText)
          case XMLStreamConstants.END_ELEMENT =>
            reader.getLocalName match {
              case "v" => inV = false
              case "t" => inIsT = false
              case "c" =>
                val raw = value.toString
                val text = cellType match {
                  // blank-but-styled cells serialize as <c t="s"/> with no <v>
                  case "s" if raw.trim.nonEmpty =>
                    shared.lift(raw.trim.toInt).getOrElse("")
                  case "s" => ""
                  // numeric cell with a date-formatted style -> ISO string
                  case "" | "n" if cellStyle >= 0 &&
                      xfIsDate.lift(cellStyle).contains(true) =>
                    raw.trim.toDoubleOption
                      .flatMap(ExcelDates.serialToString(_, date1904))
                      .getOrElse(raw)
                  case _ => raw
                }
                if (text.nonEmpty) row(cellCol) = text
              case "row" => rows += row.toMap
              case _ =>
            }
          case _ =>
        }
      }
    } finally { reader.close(); in.close() }
    rows.toSeq
  }

  /** Read sheet `sheet` (0-based) of an xlsx file into an all-string
    * DataFrame, first row as header (matching `pd.read_excel` defaults).
    */
  def read(spark: SparkSession, path: String, sheet: Int = 0): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val shared = parseSharedStrings(zip)
      val sheetEntry = Option(zip.getEntry(s"xl/worksheets/sheet${sheet + 1}.xml"))
        .getOrElse {
          import scala.jdk.CollectionConverters._
          zip.entries().asScala.filter(_.getName.startsWith("xl/worksheets/"))
            .toSeq.sortBy(_.getName).lift(sheet)
            .getOrElse(throw new IllegalArgumentException(s"no sheet $sheet in $path"))
        }
      val rows = parseSheet(zip, sheetEntry, shared, parseStyles(zip),
        parseDate1904(zip))
      require(rows.nonEmpty, s"empty sheet in $path")
      val headerMap = rows.head
      val nCols = (headerMap.keys ++ rows.tail.flatMap(_.keys)).maxOption.getOrElse(-1) + 1
      val header = (0 until nCols).map(i => headerMap.getOrElse(i, s"_c$i").trim)
      val data = rows.tail.map(r =>
        Row.fromSeq((0 until nCols).map(i => r.get(i).orNull)))
      val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
      spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
    } finally zip.close()
  }

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  /** Write a (small, dim-scale) DataFrame as a single-sheet xlsx with a
    * header row, all cells inline strings (`to_excel` parity shape). The
    * frame is collected to the driver — adapter boundary, not a data sink.
    *
    * Columns named in `dateColumns` whose values are ISO dates
    * (`yyyy-MM-dd[ HH:mm:ss]`) are written as date-FORMATTED numeric
    * cells (serial + builtin numFmtId 22 style) — the workbook shape
    * `pd.read_excel` surfaces as datetimes, and [[read]] renders back as
    * the same ISO strings.
    */
  def write(df: DataFrame, path: String, dateColumns: Set[String] = Set.empty): Unit = {
    val cols = df.columns
    val rows = df.collect()
    // typed timestamp/date columns are date cells automatically —
    // `to_excel` parity (pandas writes datetime64 columns as
    // date-formatted numerics, not "... 00:00:00.0" strings)
    val dateCol: Array[Boolean] = df.schema.fields.map(f =>
      dateColumns.contains(f.name) ||
        f.dataType == org.apache.spark.sql.types.TimestampType ||
        f.dataType == org.apache.spark.sql.types.DateType)
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    def cellXml(idx: Int, i: Int, v: String, asDate: Boolean): String = {
      val serial = if (asDate) ExcelDates.dateToSerial(v) else None
      serial match {
        case Some(num) =>
          val rendered = // integral serials carry no time fraction
            if (num == math.rint(num)) num.toLong.toString else num.toString
          s"""<c r="${colRef(i)}$idx" s="1"><v>$rendered</v></c>"""
        case None =>
          s"""<c r="${colRef(i)}$idx" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
      }
    }
    def rowXml(idx: Int, cells: Seq[String], header: Boolean): String =
      s"""<row r="$idx">""" + cells.zipWithIndex.collect {
        case (v, i) if v != null => cellXml(idx, i, v, !header && dateCol(i))
      }.mkString + "</row>"
    try {
      entry("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
          |</Types>""".stripMargin)
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      entry("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin)
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
          |</Relationships>""".stripMargin)
      // cellXf 0 = General, cellXf 1 = builtin date-time numFmtId 22 —
      // the style index date cells reference (s="1")
      entry("xl/styles.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs>
          |</styleSheet>""".stripMargin)
      val body = new StringBuilder
      body.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      body.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      body.append(rowXml(1, cols.toSeq, header = true))
      rows.zipWithIndex.foreach { case (r, i) =>
        body.append(rowXml(i + 2, (0 until cols.length).map(j =>
          if (r.isNullAt(j)) null else String.valueOf(r.get(j))),
          header = false))
      }
      body.append("</sheetData></worksheet>")
      entry("xl/worksheets/sheet1.xml", body.toString)
    } finally zos.close()
  }

  /** 0-based column index to A1-style letters: 0 -> A, 27 -> AB. */
  private[io] def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }
}
