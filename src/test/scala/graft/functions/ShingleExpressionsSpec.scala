package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TextDedup

/** Parity of the native shingle_windows path (TextDedup.shingles) with the
  * higher-order-function reference form on every edge shape, plus direct
  * window semantics.
  */
class ShingleExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val edgeTexts = Seq(
    null.asInstanceOf[String],           // null text -> [null]
    "",                                  // empty -> [""]
    "   ",                               // whitespace-only -> [""]
    "one",                               // 1 token < n
    "two tokens",                        // 2 tokens < n
    "exactly three tokens",              // len == n -> one window
    "now four whole tokens",             // len == n+1 -> two windows
    "The   QUICK\tbrown\n fox jumps over the lazy dog", // messy whitespace/case
    "Ünïcode ÊXTRA tökens ärë fun",      // non-ascii lowercasing
    "a b c d e f g h i j k l m")         // longer run
    .zipWithIndex.map(_.swap).toDF("id", "text")

  "TextDedup.shingles (native)" should "match the HOF reference on all edge shapes" in {
    (1 to 4).foreach { n =>
      val native = edgeTexts.select(col("id"),
        TextDedup.shingles(col("text"), n).as("s"))
        .orderBy("id").as[(Int, Seq[String])].collect()
      val hof = edgeTexts.select(col("id"),
        TextDedup.shinglesHof(col("text"), n).as("s"))
        .orderBy("id").as[(Int, Seq[String])].collect()
      withClue(s"n=$n: ") { native shouldBe hof }
    }
  }

  it should "emit len-n+1 windows joined by single spaces" in {
    val out = Seq((1, "the quick brown fox")).toDF("id", "text")
      .select(TextDedup.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].head()
    out shouldBe Seq("the quick brown", "quick brown fox")
  }

  it should "collapse short documents to one whole-text shingle" in {
    val out = Seq((1, "  Tiny DOC  ")).toDF("id", "text")
      .select(TextDedup.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].head()
    out shouldBe Seq("tiny doc")
  }

  it should "yield [null] for null text (HOF else-branch value)" in {
    val out = edgeTexts.filter(col("text").isNull)
      .select(TextDedup.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].head()
    out shouldBe Seq(null)
  }

  "shingle_windows" should "skip null tokens like array_join" in {
    val toks = Seq(Seq("a", null, "b", "c")).toDF("t")
    val native = toks.select(
      ShingleExpressions.shingle_windows(col("t"), 3).as("s"))
      .as[Seq[String]].head()
    val viaJoin = toks.select(
      transform(sequence(lit(0),
          org.apache.spark.sql.functions.size(col("t")) - 3),
        i => array_join(slice(col("t"), i + 1, lit(3)), " ")).as("s"))
      .as[Seq[String]].head()
    native shouldBe viaJoin
  }
}
