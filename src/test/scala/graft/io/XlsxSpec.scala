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
}
