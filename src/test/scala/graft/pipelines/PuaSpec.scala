package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Golden end-to-end test of the PUA pipeline over FIXTURES.md A1/A3-shaped
  * literal fixtures, covering the reference's edge semantics: null-propagating
  * vs nan-string concat, .0-strip, header variants, dept fallback, mode
  * tie-break, business-key dedup, INT/Internal fill, and the 26-column
  * PreTAM layout.
  */
class PuaSpec extends SparkSpec {
  import spark.implicits._

  private def pua: DataFrame = Seq(
    // UIN, PayID, Year, Pay#, Seq#, POSN, SUFF, CollCode, CollName, TS COA,
    // TS ORG, DEPT Code, DeptName, ECLS, ECLS DESC, TE M, Earn, DESC, AdjCode, AdjDesc, CalcDate
    ("U1", "BW", "2026", "7", "1", "123.0", "0.0", "KL", "Engineering", "1", "602000",
      "604.0", "CS Dept", "CA", "Civil Service", "W", "RGS", "Regular", "", "", "2026-01-15"),
    // duplicate business key (dedup keeps first by Calc Date order)
    ("U1", "BW", "2026", "7", "1", "123.0", "0.0", "KL", "Engineering", "1", "602000",
      "604.0", "CS Dept", "CA", "Civil Service", "W", "OVT", "Overtime pay", "XX", "Other", "2026-02-20"),
    // null TS ORG → null TS-Org Code (null-propagating concat); unmatched dept → fallback
    ("U2", "MN", "2026", "8", "1", "456", "1", "LP", "Arts", "2", null,
      "999", "Fallback Dept", "AB", "Academic", "P", "RGS", "Regular", "nan", "x", "bogus"),
    // unmatched org; ADJ present → kept
    ("U3", "MN", "2026", "8", "2", "789.0", "2", "LG", "Law", "9", "888000",
      "777", "Law Dept", "ZZ", "Zed", "W", "ADJ", "Adjust", "RET", "Retro", "2026-03-01"))
    .toDF("UIN", "Pay ID", "Year", "Pay #", "Seq #", "POSN", "SUFF",
      "College Code", "College Name", "TS COA", "TS ORG", "DEPT Code",
      "Department Name", "ECLS", "ECLS DESC", "TE M", "Earn Code",
      "DESCRIPTION", "ADj Reason Code", "Adj Reason", "Calc Date")

  private def lookups = Pua.Lookups(
    tsOrg = Seq(("1-602000", "Engineering Org"), ("1-602000", "Engineering Org"),
      ("2-100000", "Other Org")).toDF("TS-Org Code", "TS-Org Title"),
    tsDept = Seq(("1-604", "Engineering Dept Title")).toDF("TS-Org Dept Code", "TS-Org Dept Title"),
    overtime = Seq(("CA", "Eligible"), ("AB", "Exempt")).toDF("Job Eclass", "Overtime FLSA"),
    teM = Seq(("W", "Web"), ("W", "Api"), ("W", "Api"), ("P", "Positive")) // mode: Api(2) > Web(1)
      .toDF("TE M", "Time Entry Method"))

  private lazy val out =
    Pua.run(pua, lookups, dedupOrder = Seq(col("Calc Date"))).cache()

  "Pua.run" should "emit the 26-column PreTAM layout in order" in {
    out.columns shouldBe Pua.preTamLayout.map(_._1).toArray
    out.columns should contain("TS ORG") // harmonized, not "TS Org"
    out.columns should contain("Adjustment Reason Description")
  }

  it should "dedup on the business key keeping the first by the explicit order" in {
    out.count() shouldBe 3
    val u1 = out.filter($"UIN" === "U1").collect().head
    u1.getAs[String]("Earn Code") shouldBe "RGS" // first by Calc Date
  }

  it should "derive keys with the reference's two null regimes" in {
    val u1 = out.filter($"UIN" === "U1").collect().head
    u1.getAs[String]("TS-Org Code") shouldBe "1-602000"
    u1.getAs[String]("Job Number") shouldBe "123-0" // .0-stripped
    u1.getAs[String]("Dept Code") shouldBe "604"
    // Pay Event: 4-way no-separator concat
    u1.getAs[String]("Year") + "BW71" shouldBe "2026BW71"
    val u2 = out.filter($"UIN" === "U2").collect().head
    u2.getAs[String]("TS-Org Code") shouldBe null // null-propagating (astype("string"))
  }

  it should "resolve org title, dept fallback, and overtime lookups" in {
    val u1 = out.filter($"UIN" === "U1").collect().head
    u1.getAs[String]("TS-Org Title") shouldBe "Engineering Org"
    u1.getAs[String]("TS-Org Dept Title") shouldBe "Engineering Dept Title"
    u1.getAs[String]("Overtime") shouldBe "Eligible"
    val u2 = out.filter($"UIN" === "U2").collect().head
    u2.getAs[String]("TS-Org Title") shouldBe null
    u2.getAs[String]("TS-Org Dept Title") shouldBe "Fallback Dept" // fallback
    u2.getAs[String]("Overtime") shouldBe "Exempt"
  }

  it should "fill Time Entry from the per-code mode with ascending tie-break" in {
    out.filter($"UIN" === "U1").collect().head.getAs[String]("Time Entry") shouldBe "Api"
    out.filter($"UIN" === "U2").collect().head.getAs[String]("Time Entry") shouldBe "Positive"
  }

  it should "fill blank ADJ reason with INT/Internal and keep real values" in {
    val u1 = out.filter($"UIN" === "U1").collect().head
    u1.getAs[String]("Adjustment Reason Code") shouldBe "INT"
    u1.getAs[String]("Adjustment Reason Description") shouldBe "Internal"
    val u2 = out.filter($"UIN" === "U2").collect().head
    u2.getAs[String]("Adjustment Reason Code") shouldBe "INT" // 'nan' counts as blank
    val u3 = out.filter($"UIN" === "U3").collect().head
    u3.getAs[String]("Adjustment Reason Code") shouldBe "RET"
    u3.getAs[String]("Adjustment Reason Description") shouldBe "Retro"
  }

  it should "coerce Calc Date with null on failure" in {
    out.schema("Calc Date").dataType.typeName shouldBe "timestamp"
    out.filter($"UIN" === "U2").collect().head.getAs[java.sql.Timestamp]("Calc Date") shouldBe null
    out.filter($"UIN" === "U3").collect().head
      .getAs[java.sql.Timestamp]("Calc Date").toString should startWith("2026-03-01")
  }
}
