package graft.io

import java.nio.file.Files

import graft.SparkSpec

class XlsxSpec extends SparkSpec {
  import spark.implicits._

  "colIndex / colRef" should "round-trip A1 references" in {
    Xlsx.colIndex("A1") shouldBe 0
    Xlsx.colIndex("Z9") shouldBe 25
    Xlsx.colIndex("AA3") shouldBe 26
    Xlsx.colIndex("AB7") shouldBe 27
    (0 until 100).foreach(i => Xlsx.colIndex(Xlsx.colRef(i) + "1") shouldBe i)
  }

  "write + read" should "round-trip a frame with nulls and special characters" in {
    val path = Files.createTempDirectory("graft_xlsx").resolve("t.xlsx").toString
    val df = Seq(
      ("U1", Some("a<b&c\"d"), Some("604.0")),
      ("U2", None, Some("7")),
      ("U3", Some("plain"), None))
      .toDF("UIN", "Weird", "DEPT Code")
    Xlsx.write(df, path)

    val back = Xlsx.read(spark, path)
    back.columns shouldBe Array("UIN", "Weird", "DEPT Code")
    val rows = back.orderBy("UIN").collect()
    rows.map(_.getString(0)) shouldBe Array("U1", "U2", "U3")
    rows(0).getString(1) shouldBe "a<b&c\"d"
    rows(1).getString(1) shouldBe null // empty cell → null
    rows(2).getString(2) shouldBe null
    rows(0).getString(2) shouldBe "604.0"
  }

  it should "feed the PUA pipeline like pd.read_excel (S3 parity shape)" in {
    val path = Files.createTempDirectory("graft_xlsx2").resolve("pua.xlsx").toString
    val cols = Seq("UIN", "Pay ID", "Year", "Pay #", "Seq #", "POSN", "SUFF",
      "College Code", "College Name", "TS COA", "TS ORG", "DEPT Code",
      "Department Name", "ECLS", "ECLS DESC", "TE M", "Earn Code",
      "DESCRIPTION", "ADJ Reason Code", "ADJ Reason DESC", "Calc Date")
    val data = Seq(Seq("U1", "BW", "2026", "7", "1", "123.0", "0", "KL", "Eng",
      "1", "602000", "604.0", "CS", "CA", "Civil", "W", "RGS", "Reg", "", "",
      "2026-01-15"))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(org.apache.spark.sql.Row.fromSeq(_)), 1),
      org.apache.spark.sql.types.StructType(cols.map(
        org.apache.spark.sql.types.StructField(_, org.apache.spark.sql.types.StringType, true))))
    Xlsx.write(src, path)

    val pua = Xlsx.read(spark, path)
    import org.apache.spark.sql.functions.col
    val out = graft.pipelines.Pua.run(pua,
      graft.pipelines.Pua.Lookups(
        Seq(("1-602000", "Org")).toDF("TS-Org Code", "TS-Org Title"),
        Seq(("1-604", "Dept")).toDF("TS-Org Dept Code", "TS-Org Dept Title"),
        Seq(("CA", "Yes")).toDF("Job Eclass", "Overtime FLSA"),
        Seq(("W", "Web")).toDF("TE M", "Time Entry Method")),
      dedupOrder = Seq(col("Calc Date")))
    out.count() shouldBe 1
    out.collect().head.getAs[String]("TS-Org Title") shouldBe "Org"
  }

  "date-formatted cells" should "round-trip as ISO strings via styles.xml (r17 date parity)" in {
    import spark.implicits._
    val df = Seq(
      ("U1", "2026-01-15", "plain"),
      ("U2", "2024-07-04 08:30:00", "x"),
      ("U3", "not a date", "y")) // unparseable stays an inline string
      .toDF("UIN", "Calc Date", "Note")
    val path = java.nio.file.Files
      .createTempDirectory("graft_xlsx_dates").resolve("d.xlsx").toString
    Xlsx.write(df, path, dateColumns = Set("Calc Date"))
    val back = Xlsx.read(spark, path).orderBy("UIN").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    back.toSeq shouldBe Seq(
      ("U1", "2026-01-15", "plain"),
      ("U2", "2024-07-04 08:30:00", "x"),
      ("U3", "not a date", "y"))
  }

  it should "write TYPED timestamp columns as date cells automatically (to_excel parity)" in {
    import spark.implicits._
    // the Runner's PreTAM output carries Calc Date as TimestampType;
    // pandas to_excel writes datetime64 columns as date-formatted cells,
    // not "... 00:00:00.0" strings — the typed column needs no opt-in
    val df = Seq(("U1", java.sql.Timestamp.valueOf("2026-01-15 00:00:00")),
        ("U2", java.sql.Timestamp.valueOf("2024-07-04 08:30:00")))
      .toDF("UIN", "Calc Date")
    val path = java.nio.file.Files
      .createTempDirectory("graft_xlsx_typed").resolve("t.xlsx").toString
    Xlsx.write(df, path)
    val back = Xlsx.read(spark, path).orderBy("UIN").collect()
      .map(r => (r.getString(0), r.getString(1)))
    back.toSeq shouldBe Seq(
      ("U1", "2026-01-15"), ("U2", "2024-07-04 08:30:00"))
  }

  it should "honor custom numFmts and workbookPr date1904 in foreign workbooks" in {
    // hand-written OOXML parts the writer doesn't emit: a custom numFmt
    // date code and the 1904 epoch flag
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_foreign")
    val path = dir.resolve("f.xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/></Types>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><workbookPr date1904="1"/><sheets><sheet name="S" sheetId="1"/></sheets></workbook>""")
    entry("xl/styles.xml",
      """<?xml version="1.0"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><numFmts count="2"><numFmt numFmtId="164" formatCode="yyyy\-mm\-dd"/><numFmt numFmtId="165" formatCode="#,##0.00"/></numFmts><cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="164"/><xf numFmtId="165"/></cellXfs></styleSheet>""")
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>d</t></is></c><c r="B1" t="inlineStr"><is><t>n</t></is></c></row><row r="2"><c r="A2" s="1"><v>43844</v></c><c r="B2" s="2"><v>43844</v></c></row></sheetData></worksheet>""")
    zos.close()
    val back = Xlsx.read(spark, path).collect().head
    back.getString(0) shouldBe "2024-01-15" // custom date code, 1904 epoch
    back.getString(1) shouldBe "43844" // numeric code stays raw
  }
}
