package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  "schemaCheck" should "report missing, extra, and out-of-position columns" in {
    val df = Seq((1, "x", true)).toDF("b", "a", "extra")
    val issues = Validate.schemaCheck(df, Seq("a", "b", "c"))
    issues should contain(Validate.MissingColumn("c"))
    issues should contain(Validate.ExtraColumn("extra"))
    issues should contain(Validate.PositionMismatch("a", 0, 1))
    issues should contain(Validate.PositionMismatch("b", 1, 0))
  }

  it should "return empty for a conforming frame" in {
    val df = Seq((1, "x")).toDF("a", "b")
    Validate.schemaCheck(df, Seq("a", "b")) shouldBe empty
  }

  "formatViolations" should "return rows failing the pattern, including nulls" in {
    val df = Seq("1-123456", "bad", null).toDF("code")
    val out = Validate.formatViolations(df, col("code"), "^[0-9]-[0-9]{6}$")
    out.collect().map(r => Option(r.getString(0))) shouldBe Array(Some("bad"), None)
  }

  "nullCount" should "count nulls and total as plain longs" in {
    val df = Seq(Some(1), None, Some(3), None).toDF("x")
    val r = Validate.nullCount(df, col("x")).collect().head
    (r.getLong(0), r.getLong(1)) shouldBe ((2L, 4L))
  }
}
