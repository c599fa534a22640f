package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DeriveSpec extends SparkSpec {
  import spark.implicits._

  "concatKey" should "join with separator and propagate null (pandas string dtype +)" in {
    val df = Seq(("1", Some("A")), ("2", None)).toDF("a", "b")
    val out = df.select(Derive.concatKey("-", $"a", $"b").as("k")).collect()
    out.map(r => if (r.isNullAt(0)) null else r.getString(0)) shouldBe Array("1-A", null)
  }

  "concatKeyNan" should "produce nan segments for nulls (pandas astype(str))" in {
    val df = Seq((Option.empty[String], Option.empty[String])).toDF("a", "b")
    val out = df.select(Derive.concatKeyNan("-", $"a", $"b").as("k")).as[String].collect()
    out shouldBe Array("nan-nan")
  }

  "concatAll" should "concatenate without separator, casting to string" in {
    val out = Seq((2023, "BW", 7, 1)).toDF("y", "p", "n", "s")
      .select(Derive.concatAll($"y", $"p", $"n", $"s").as("k")).as[String].collect()
    out shouldBe Array("2023BW71")
  }

  "prefix" should "take a 1-based prefix, short strings unchanged" in {
    val out = Seq("1-123456", "ab").toDF("x")
      .select(Derive.prefix($"x", 5).as("y")).as[String].collect()
    out shouldBe Array("1-123", "ab")
  }

  "splitOnce" should "split on first separator; tail null when absent" in {
    val (head, tail) = Derive.splitOnce($"x", "-")
    val out = Seq("101-Engineering", "NoSeparator", "a-b-c").toDF("x")
      .select(head.as("h"), tail.as("t")).collect()
    out.map(_.getString(0)) shouldBe Array("101", "NoSeparator", "a")
    out.map(r => Option(r.getString(1))) shouldBe
      Array(Some("Engineering"), None, Some("b-c"))
  }

  it should "treat regex metacharacters in the separator literally" in {
    val (head, tail) = Derive.splitOnce($"x", ".")
    val out = Seq("a.b").toDF("x").select(head, tail).collect()
    (out.head.getString(0), out.head.getString(1)) shouldBe ("a", "b")
  }
}
