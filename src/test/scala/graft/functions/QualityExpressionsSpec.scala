package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TextStats

/** Parity of the native quality_fail verdict (TextStats.qualityFail) with
  * the column-CASE reference form — edge shapes, rule boundaries, the real
  * documents table, and the codegen'd vs interpreted paths.
  */
class QualityExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val edgeTexts = Seq(
    null.asInstanceOf[String],            // null -> null verdict (kept)
    "",                                   // empty -> too_few_tokens
    "   ",                                // whitespace-only -> too_few_tokens
    "one two three four",                 // 4 tokens -> too_few_tokens
    "the cat sat on a mat",               // keeps (stopwords present)
    "aa bb cc dd ee",                     // 5 tokens, no stopwords
    "a b c d e f g h i j",                // mean token len 1 -> too short
    "extraordinarily incomprehensibilities " * 3, // mean len > 12 -> too long
    "the!!! cat... sat??? on,,, a;;; mat!!!", // punctuation-heavy
    "The   QUICK\tbrown\n fox jumps over the lazy dog", // messy whitespace
    "Ünïcode ÊXTRA tökens ärë the fün önes today ok", // non-ascii lowering
    ("the and of " * 40).trim)            // long, stopword-rich
    .zipWithIndex.map(_.swap).toDF("id", "text")

  private val ruleSets = Seq(
    TextStats.QualityRules(),
    TextStats.QualityRules(minTokens = 0, maxTokens = 6),
    TextStats.QualityRules(minTokens = 0, minMeanTokenLen = 0.0,
      maxMeanTokenLen = 100.0, maxPunctRatio = 1.0, minStopwordRatio = 0.0),
    TextStats.QualityRules(minTokens = 1, maxPunctRatio = 0.05,
      minStopwordRatio = 0.2))

  "TextStats.qualityFail (native)" should "match the column-CASE reference on all edge shapes and rule sets" in {
    ruleSets.zipWithIndex.foreach { case (rules, ri) =>
      val native = edgeTexts.select(col("id"),
        TextStats.qualityFail(col("text"), rules).as("r"))
        .orderBy("id").as[(Int, Option[String])].collect()
      val ref = edgeTexts.select(col("id"),
        TextStats.qualityFailHof(col("text"), rules).as("r"))
        .orderBy("id").as[(Int, Option[String])].collect()
      withClue(s"ruleSet=$ri: ") { native shouldBe ref }
    }
  }

  it should "match the reference on the real documents table" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val native = docs.select(col("doc_id"),
        TextStats.qualityFail(col("text")).as("r"))
      .orderBy("doc_id").as[(Long, Option[String])].collect()
    val ref = docs.select(col("doc_id"),
        TextStats.qualityFailHof(col("text"), TextStats.QualityRules()).as("r"))
      .orderBy("doc_id").as[(Long, Option[String])].collect()
    native shouldBe ref
    // the fixture exercises both outcomes
    native.map(_._2).distinct.length should be > 1
  }

  it should "agree between interpreted and codegen evaluation" in {
    def run(): Seq[(Int, Option[String])] = edgeTexts
      .select(col("id"), TextStats.qualityFail(col("text")).as("r"))
      .orderBy("id").as[(Int, Option[String])].collect().toSeq
    val conf = spark.conf
    val on = run()
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val off = run()
      on shouldBe off
    } finally {
      conf.set("spark.sql.codegen.wholeStage", "true")
      conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
