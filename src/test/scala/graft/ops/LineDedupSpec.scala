package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.ShingleExpressions

/** Line-level (C4-style) boilerplate dedup: drop rules, structure
  * preservation, null handling, and the native chunk_windows line builder.
  */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0, "Cookie notice\nreal content A\n\nmore A"),
    (1, "cookie notice \nreal content B"),     // same line after normalize
    (2, "unique doc\nunique doc\nsolo line"),  // within-doc repeat only
    (3, null.asInstanceOf[String]),
    (4, "")).toDF("doc_id", "text")

  "LineDedup.boilerplate" should "count distinct documents, not occurrences" in {
    val b = LineDedup.boilerplate(corpus, "doc_id", "text", minDocs = 2)
      .as[(String, Long)].collect().toMap
    b shouldBe Map("cookie notice" -> 2L)
    // "unique doc" repeats twice inside doc 2 but is in only one document
  }

  "LineDedup.dedupLines" should "drop cross-doc lines, keep order, blanks and within-doc repeats" in {
    val out = LineDedup.dedupLines(corpus, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id")
      .as[(Int, String, Long, Long)].collect()
    out shouldBe Array(
      (0, "real content A\n\nmore A", 4L, 1L),
      (1, "real content B", 2L, 1L),
      (2, "unique doc\nunique doc\nsolo line", 3L, 0L),
      (3, null, 0L, 0L),
      (4, "", 1L, 0L))
  }

  it should "be the identity when no line crosses the threshold" in {
    val solo = Seq((0, "a\nb"), (1, "c\nd")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(solo, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id").as[(Int, String, Long, Long)].collect()
    out shouldBe Array((0, "a\nb", 2L, 0L), (1, "c\nd", 2L, 0L))
  }

  "chunk_windows" should "match the HOF slice form including the partial tail" in {
    val texts = Seq("", "one", "a b c d", "a b c d e", "a b c d e f g h i")
      .zipWithIndex.map(_.swap).toDF("id", "text")
      .withColumn("toks", TextDedup.tokens(col("text")))
    (1 to 4).foreach { n =>
      val native = texts
        .select(col("id"), ShingleExpressions.chunk_windows(col("toks"), n).as("c"))
        .orderBy("id").as[(Int, Seq[String])].collect()
      val hof = texts
        .select(col("id"), transform(
            sequence(lit(0),
              ((org.apache.spark.sql.functions.size(col("toks")) + lit(n - 1))
                / lit(n)).cast("int") - 1),
            i => array_join(slice(col("toks"), i * n + 1, lit(n)), " ")).as("c"))
        .orderBy("id").as[(Int, Seq[String])].collect()
      withClue(s"n=$n: ") { native shouldBe hof }
    }
    // stride semantics spot check
    val out = Seq(Tuple1("a b c d e")).toDF("text")
      .select(ShingleExpressions.chunk_windows(TextDedup.tokens(col("text")), 2))
      .as[Seq[String]].head()
    out shouldBe Seq("a b", "c d", "e")
  }

  it should "return null for a null token array" in {
    val out = Seq(Tuple1(null.asInstanceOf[String])).toDF("text")
      .select(ShingleExpressions.chunk_windows(split(col("text"), " "), 3))
      .as[Seq[String]].head()
    out shouldBe null
  }
}
