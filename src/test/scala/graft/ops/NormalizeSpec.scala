package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  "stripDecimal" should "drop a trailing .0 but preserve real decimals" in {
    val out = Seq("10.0", "10.05", "10", " 7.0 ").toDF("x")
      .select(Normalize.stripDecimal($"x").as("y")).as[String].collect()
    out shouldBe Array("10", "10.05", "10", "7")
  }

  it should "propagate null" in {
    val out = Seq[Option[String]](None).toDF("x")
      .select(Normalize.stripDecimal($"x")).collect()
    out.head.isNullAt(0) shouldBe true
  }

  it should "work on doubles (the reference's int-normalize path)" in {
    val out = Seq(23.0, 1.5).toDF("x")
      .select(Normalize.stripDecimal($"x").as("y")).as[String].collect()
    out shouldBe Array("23", "1.5")
  }

  "astypeStr" should "turn null into the literal string nan (pandas astype(str))" in {
    val out = Seq[(Option[String], Int)]((None, 1), (Some("a"), 2)).toDF("x", "i")
      .select(Normalize.astypeStr($"x").as("y")).as[String].collect()
    out shouldBe Array("nan", "a")
  }

  "isBlank" should "match null, empty, whitespace, and nan variants" in {
    val out = Seq(null, "", "  ", "nan", "NaN", "x", " x ").toDF("x")
      .select(Normalize.isBlank($"x").as("b")).as[Boolean].collect()
    out shouldBe Array(true, true, true, true, true, false, false)
  }

  "fillBlankWith" should "replace blanks with the default and keep values" in {
    val out = Seq(null, " ", "nan", "KEEP").toDF("x")
      .select(Normalize.fillBlankWith($"x", lit("INT")).as("y")).as[String].collect()
    out shouldBe Array("INT", "INT", "INT", "KEEP")
  }

  "blankToNull" should "null out blanks only" in {
    val out = Seq("", "v").toDF("x")
      .select(Normalize.blankToNull($"x").as("y")).collect()
    out.map(r => r.isNullAt(0)) shouldBe Array(true, false)
  }
}
