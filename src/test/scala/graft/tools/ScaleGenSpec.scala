package graft.tools

import graft.SparkSpec

/** [[ScaleGen]]'s content-token suffixing (round-17 verdict item 2): copy
  * suffixes must skip stopwords — suffixing them erased all stopword
  * evidence, so the Gopher-style quality rule rejected every scaled doc
  * and corpus-prep's admission stages never ran at 100×. The anchored
  * pattern must also never re-match the TAIL of a rejected stopword
  * (`the` → `t` + `he_k`).
  */
class ScaleGenSpec extends SparkSpec {
  import spark.implicits._

  "ScaleGen.copies" should "suffix content tokens, preserve stopwords, and shift ids" in {
    val src = Seq((0L, "the quick fox is in a box theory and it"))
      .toDF("doc_id", "text")
    val out = ScaleGen.copies(spark, src, 2, Seq("doc_id"), 100L, Seq("text"))
      .orderBy("doc_id").collect()
    out.length shouldBe 2
    out(0).getLong(0) shouldBe 0L
    out(0).getString(1) shouldBe
      "the quick_0 fox_0 is in a box_0 theory_0 and it"
    out(1).getLong(0) shouldBe 100L
    out(1).getString(1) shouldBe
      "the quick_1 fox_1 is in a box_1 theory_1 and it"
  }

  it should "preserve CAPITALIZED stopwords unsuffixed (r18 advice: the (?i:) alternation)" in {
    // stopwordCount lowercases before \b matching, so `The_k` would stop
    // matching `\bthe\b` — sentence-capitalized stopword evidence must
    // survive scaling exactly like lowercase evidence
    val src = Seq((0L, "The quick fox And a Box It theory"))
      .toDF("doc_id", "text")
    val out = ScaleGen.copies(spark, src, 2, Seq("doc_id"), 100L, Seq("text"))
      .orderBy("doc_id").collect().map(_.getString(1))
    out(0) shouldBe "The quick_0 fox_0 And a Box_0 It theory_0"
    out(1) shouldBe "The quick_1 fox_1 And a Box_1 It theory_1"
    // the preserved capitalized forms still count as stopword evidence
    import graft.ops.TextStats
    val n = Seq(out(0)).toDF("text")
      .select(TextStats.stopwordCount(
        org.apache.spark.sql.functions.col("text"),
        TextStats.defaultStopwords).as("n"))
      .head().getInt(0)
    n shouldBe 4 // The, And, a, It
  }

  it should "keep cross-copy content tokens disjoint and stopword evidence intact" in {
    val src = Seq((0L, "data the table a value and spark"))
      .toDF("doc_id", "text")
    val texts = ScaleGen.copies(spark, src, 3, Seq("doc_id"), 10L, Seq("text"))
      .orderBy("doc_id").collect().map(_.getString(1))
    // stopword count identical in every copy (quality evidence preserved)
    import graft.ops.TextStats
    val counts = texts.map(t => Seq(t).toDF("text")
      .select(TextStats.stopwordCount(
        org.apache.spark.sql.functions.col("text"),
        TextStats.defaultStopwords).as("n"))
      .head().getInt(0))
    counts.toSeq shouldBe Seq(3, 3, 3)
    // content tokens disjoint across copies
    val contentSets = texts.map(_.split(" ").toSet
      -- TextStats.defaultStopwords)
    contentSets(0).intersect(contentSets(1)) shouldBe empty
    contentSets(1).intersect(contentSets(2)) shouldBe empty
  }
}
