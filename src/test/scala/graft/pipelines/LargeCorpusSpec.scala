package graft.pipelines

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.SparkSpec

/** FIXTURES-shaped corpus regression (NEXT round-1 item 6): a few hundred
  * deterministic index-derived rows covering every edge class FIXTURES.md
  * lists (trailing-`.0` numerics, blank/"nan" adjustment reasons, null
  * TS COA/ORG concat propagation, unparseable dates, padded whitespace,
  * duplicate business keys, missing-lookup fallbacks, header-variant adj
  * columns) — far more drift surface than the 2-row demo goldens.
  *
  * Drift detection is a digest golden: md5 over the sorted output CSV
  * lines. Any semantic change to the PUA/CPA composition changes the digest;
  * the invariant assertions below then localize what moved.
  */
class LargeCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val N = 260

  // --------------------------------------------------------------- PUA

  private def puaRow(i: Int): (String, String, String, String, String, String,
      String, String, String, String, String, String, String, String, String,
      String, String, String, String, String, String) = {
    def pad(v: String) = if (i % 11 == 0) s"  $v " else v
    // every 13th row repeats the PREVIOUS row's business key (different
    // payload/date) -> exercises keep-first dedup on (UIN, Pay Event, Job)
    val k = if (i % 13 == 12) i - 1 else i
    val coa = if (i % 4 == 3) null else ((i % 3) + 1).toString
    val org = if (i % 5 == 4) null else s"60${i % 4}000"
    val dept = if (i % 3 == 0) s"${600 + i % 8}.0" else s"${600 + i % 8}"
    val adj = i % 6 match {
      case 0 => ""
      case 1 => "nan"
      case k => s"R$k"
    }
    val date = if (i % 10 == 9) "not-a-date"
      else f"2026-0${1 + i % 9}%d-${1 + i % 27}%02d"
    (s"U${k % 40}", if (k % 2 == 0) "BW" else "MN", "2026", (k % 9).toString,
      (k % 3).toString, pad(if (k % 5 == 0) s"${100 + k}.0" else s"${100 + k}"),
      if (k % 7 == 0) "0.0" else "1",
      Seq("KL", "LP", "", "KY", "LW", "KV")(i % 6), s"College ${i % 6}",
      coa, org, pad(dept), s"Dept ${i % 8}",
      Seq("CA", "AB", "BC", "DA")(i % 4), s"Eclass ${i % 4}",
      Seq("W", "P", "N")(i % 3), "RGS", "Regular", pad(adj), s"reason $i", date)
  }

  private lazy val pua: DataFrame = (0 until N).map(puaRow).toDF(
    "UIN", "Pay ID", "Year", "Pay #", "Seq #", "POSN", "SUFF",
    "College Code", "College Name", "TS COA", "TS ORG", "DEPT Code",
    "Department Name", "ECLS", "ECLS DESC", "TE M", "Earn Code",
    "DESCRIPTION", "ADj Reason Code", "Adj Reason", "Calc Date")

  private lazy val puaLookups = Pua.Lookups(
    // deliberately partial: only some concat keys resolve -> fallback paths
    tsOrg = (0 until 3).flatMap(c => (0 until 4).map(o =>
      (s"${c + 1}-60${o}000", s"Org $c-$o"))).take(7)
      .toDF("TS-Org Code", "TS-Org Title"),
    tsDept = (0 until 3).flatMap(c => (0 until 8).map(d =>
      (s"${c + 1}-${600 + d}", s"Dept title $c-$d"))).take(17)
      .toDF("TS-Org Dept Code", "TS-Org Dept Title"),
    overtime = Seq(("CA", "Eligible"), ("AB", "Exempt"))
      .toDF("Job Eclass", "Overtime FLSA"),
    teM = Seq(("W", "Web"), ("P", "Positive"))
      .toDF("TE M", "Time Entry Method"))

  private lazy val puaOut =
    Pua.run(pua, puaLookups, dedupOrder = Seq(col("Calc Date"))).cache()

  // --------------------------------------------------------------- CPA

  private val cols = Cpa.expectedColumns
  private val cpaSchema =
    StructType(cols.map(StructField(_, StringType, nullable = true)))

  private def cpaRow(i: Int, payId: String): Row = {
    val m = Map(
      "UIN" -> s"${100 + i % 60}",
      "PAY_YEAR" -> "2026", "PAY_ID" -> payId,
      "PAY_NBR" -> (i % 9).toString, "PAY_SEQ" -> (i % 3).toString,
      "TRAN_ID" -> s"T$payId$i",
      "ADJ_REASON" -> (i % 5 match {
        case 0 => ""
        case 1 => "nan"
        case k => s"R$k"
      }),
      "TRAN_CREATE_DT" -> (if (i % 13 == 12) "garbage"
        else f"2025-1${i % 2}%d-${1 + i % 27}%02d"),
      "TRAN_CLOSED_DT" -> f"2026-0${1 + i % 8}%d-${1 + i % 27}%02d",
      "JOB" -> (if (i % 4 == 0) s"${200 + i % 9}.0" else s"${200 + i % 9}"),
      "JOB_TS_COAS" -> (i % 6 match {
        case 5 => "nan"
        case k => ((k % 3) + 1).toString
      }),
      "JOB_TS_ORGN" -> (if (i % 7 == 6) "nan" else s"60${i % 4}000"),
      "JOB_ECLS" -> Seq("CA", "AB", "BC", "DA")(i % 4),
      "COLLEGE" -> Seq("KL-Engineering", "LAW", "LP - Arts", "", "KV-Media",
        "KY-Vet Med")(i % 6),
      "ACTION" -> (if (i % 8 == 7) "1 - Hold" else "3 - Apply"),
      "HRLY_RATE" -> f"${10.0 + (i % 40) * 0.25}%.2f")
    Row.fromSeq(cols.map(c => m.getOrElse(c, s"x$i")))
  }

  private def mk(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), cpaSchema)

  private lazy val bw = mk((0 until N).map(cpaRow(_, "BW")))
  private lazy val mn = mk((0 until N / 2).map(cpaRow(_, "MN")))

  private lazy val cpaLookups = Cpa.Lookups(
    tsOrg = (0 until 3).flatMap(c => (0 until 4).map(o =>
      (s"${c + 1}-60${o}000", s"Org $c-$o"))).take(9)
      .toDF("TS-Org Code", "TS-Org Title"),
    tsDept = (0 until 3).map(c => (s"${c + 1}-60${c}", s"Dept $c"))
      .toDF("TS-Org Dept Code", "TS-Org Dept Title"),
    overtime = Seq(("CA", "BW", "Eligible", "Civil Service"),
      ("AB", "MN", "Exempt", "Academic"))
      .toDF("Job Eclass", "Pay ID", "Overtime FLSA", "Job Detail E-Class Long Desc"),
    teM = (0 until 30).map(i => (s"${100 + i}-${200 + i % 9}.0", "W", "Web",
      s"TBW$i")).toDF("UIN Job", "TE M", "Time Entry Method", "Time Entry Type"))

  private lazy val cpaOut = Cpa.run(bw, mn, cpaLookups,
    LocalDate.of(2026, 8, 12), dedupOrder = Seq(col("TRAN_ID"))).output.cache()

  // ----------------------------------------------------------- helpers

  private def digest(df: DataFrame): String = {
    val lines = df.collect().map(_.toSeq.map {
      case null => "\u0000"
      case v => v.toString
    }.mkString("\u0001")).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  // ------------------------------------------------------------- tests

  "PUA over the large corpus" should "dedup to one row per business key" in {
    // Pay Event = UIN|PayID|Year|Pay#|Seq# concat; its components are in the
    // output, the derived key itself is projected away
    val keyCount = puaOut
      .groupBy("UIN", "Pay ID", "Year", "Pay #", "Seq #", "Job Number")
      .count().filter(col("count") > 1).count()
    keyCount shouldBe 0L
  }

  it should "fill blank/nan adjustment reasons with INT" in {
    puaOut.filter(col("Adjustment Reason Code") === "INT").count() should be > 0L
    puaOut.filter(col("Adjustment Reason Code").isin("", "nan")).count() shouldBe 0L
  }

  it should "exercise both the lookup-hit and fallback paths" in {
    val total = puaOut.count()
    puaOut.filter(col("TS-Org Title").isNotNull).count() should
      (be > 0L and be < total)
  }

  it should "match the committed output digest" in {
    puaOut.count() shouldBe 240L
    digest(puaOut) shouldBe "ecd8648a6a3984e939e6bee0168be6fe"
  }

  // -------------------------------------- IO-path goldens (NEXT r2 item 6)
  //
  // The write→read round-trip digests are pinned SEPARATELY from the
  // in-memory goldens because serialization semantics legitimately differ:
  // both the xlsx reader (empty cells → missing, pd.read_excel parity) and
  // Spark's CSV reader collapse "" to null; CSV formats timestamps as
  // ISO-8601 with a T separator, while the xlsx path (since the round-17
  // date-cell parity) writes TYPED timestamp columns as date-FORMATTED
  // cells that read back as "yyyy-MM-dd[ HH:mm:ss]" ISO strings — the
  // to_excel/read_excel round-trip shape, replacing the old raw
  // "yyyy-MM-dd HH:mm:ss.0" toString. Evidence the collapse is the ONLY
  // other divergence: cpaOut (all-string, no timestamps) digests
  // IDENTICALLY through xlsx and CSV. Any writer/reader drift breaks
  // these goldens the same way pipeline drift breaks the in-memory ones.

  it should "match the committed xlsx round-trip digest" in {
    val p = java.nio.file.Files.createTempFile("graft_pua_rt", ".xlsx").toString
    graft.io.Xlsx.write(puaOut, p)
    val back = graft.io.Xlsx.read(spark, p)
    back.count() shouldBe 240L
    // re-pinned at round 17 (was 03fec161…): Calc Date now round-trips
    // as a real date cell, not a ".0"-suffixed string
    digest(back) shouldBe "49e15d0b94b2aeff9fc937bf180c8351"
  }

  it should "match the committed CSV round-trip digest" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_pua_csv").toString
    graft.io.Sinks.singleCsv(puaOut, s"$dir/out")
    val back = spark.read.option("header", true).csv(s"$dir/out")
    back.count() shouldBe 240L
    digest(back) shouldBe "f60ba9ad97b8737e1fa1f3f57bfe829b"
  }

  "CPA over the large corpus" should "drop held actions and dedup rows" in {
    // "1 - Hold" rows (every 8th) are filtered; TRAN_ID dedup is upstream of
    // the projection, so the output must at least be full-row distinct
    cpaOut.count() should be < (bw.count() + mn.count())
    cpaOut.distinct().count() shouldBe cpaOut.count()
  }

  it should "match the committed output digest" in {
    cpaOut.count() shouldBe 160L
    digest(cpaOut) shouldBe "010a5c9a323d98cdfb6083072e622ce4"
  }

  it should "match the committed IO round-trip digest via xlsx AND csv" in {
    // all-string output: the two writers must agree exactly (see the
    // IO-golden note above) — one digest pins both paths
    val p = java.nio.file.Files.createTempFile("graft_cpa_rt", ".xlsx").toString
    graft.io.Xlsx.write(cpaOut, p)
    val xlsxBack = graft.io.Xlsx.read(spark, p)
    xlsxBack.count() shouldBe 160L
    digest(xlsxBack) shouldBe "726f429a2987bf212c08675a734676f8"

    val dir = java.nio.file.Files.createTempDirectory("graft_cpa_csv").toString
    graft.io.Sinks.singleCsv(cpaOut, s"$dir/out")
    val csvBack = spark.read.option("header", true).csv(s"$dir/out")
    csvBack.count() shouldBe 160L
    digest(csvBack) shouldBe "726f429a2987bf212c08675a734676f8"
  }
}
