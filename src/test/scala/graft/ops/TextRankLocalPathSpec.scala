package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Round-15 TextRank regimes: below [[PageRank.LocalEdgesMax]] pair-table
  * rows the whole pipeline (id assignment, edge build, iteration, output
  * join) runs in-JVM; above it the identical construction runs
  * distributed over the one-pass pair table. Both are integer-exact, so
  * the contract is BIT-IDENTITY — locked here both ways, plus the
  * one-pass vocabulary derivation (sentinel counts == direct token
  * counts) and the zero-pin property of the local regime.
  */
class TextRankLocalPathSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick red fox runs past the sleeping dog"),
    (2L, "a lazy dog and a quick fox share the yard"),
    (3L, "one"), // single-token doc: sentinel-only, contributes tf not edges
    (4L, "dog dog dog"), // self-pair + repeated token
    (5L, "")).toDF("doc_id", "text")

  private def forceDistributed[T](body: => T): T = {
    sys.props("graft.graph.localEdgesMax") = "0"
    try body finally sys.props -= "graft.graph.localEdgesMax"
  }

  private def rows(df: DataFrame): Seq[(String, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  "TextRank" should "produce BIT-IDENTICAL keywords local vs distributed" in {
    val local = rows(TextRank.keywords(docs, "doc_id", "text",
      iterations = 5, topN = 50))
    val dist = forceDistributed(rows(TextRank.keywords(docs, "doc_id", "text",
      iterations = 5, topN = 50)))
    local should not be empty
    local shouldBe dist
  }

  it should "tie-break identically across regimes for supplementary-plane tokens" in {
    // 😀 (U+1F600) is UTF-16 D83D DE00 but UTF-8 F0 9F 98 80; ！ (U+FF01)
    // is UTF-16 FF01 but UTF-8 EF BC 81 — Java String '<' and Spark's
    // UTF8String binary order DISAGREE on this pair, so a rank tie at the
    // topN boundary exposes any code-unit-ordered tie-break (round-16
    // ADVICE). The graph is symmetric in the two tokens: exact tie.
    val emoji = "😀"
    val fullw = "！"
    val tricky = Seq(
      (0L, s"$emoji hub"), (1L, s"$fullw hub"),
      (2L, s"hub $emoji"), (3L, s"hub $fullw")).toDF("doc_id", "text")
    val local = rows(TextRank.keywords(tricky, "doc_id", "text",
      iterations = 4, topN = 2))
    val dist = forceDistributed(rows(TextRank.keywords(tricky, "doc_id", "text",
      iterations = 4, topN = 2)))
    local shouldBe dist
    // the boundary slot goes to the UTF-8-smaller token
    local.map(_._1) shouldBe Seq("hub", fullw)
  }

  "utf8Lt" should "order by code point, not UTF-16 code units" in {
    TextRank.utf8Lt("！", "😀") shouldBe true
    TextRank.utf8Lt("😀", "！") shouldBe false
    ("😀" < "！") shouldBe true // the Java order the fix avoids
    TextRank.utf8Lt("a", "ab") shouldBe true
    TextRank.utf8Lt("ab", "a") shouldBe false
    TextRank.utf8Lt("a", "a") shouldBe false
  }

  "TextRank" should "leave the persistent-RDD map at baseline in the local regime" in {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = TextRank.keywords(docs, "doc_id", "text", iterations = 3, topN = 10)
    out.count() should be > 0L
    // no NEW pins (a previous test's non-blocking unpersist may still be
    // draining entries from `before` — shrinkage is not a leak)
    (spark.sparkContext.getPersistentRDDs.keySet -- before) shouldBe empty
  }

  "the sentinel pair stream" should "recover exact token frequencies" in {
    // tf from sum-of-w1-counts must equal the direct vocabulary counts
    // for every REAL token: the sentinel restores the last occurrence
    // the pair stream drops. vocabulary() additionally counts the ""
    // token an empty doc tokenizes to; the bigram stream filters it —
    // irrelevant to TextRank ("" can never form an edge, and output only
    // carries edge-connected tokens) but excluded from the comparison.
    val direct = TextStats.vocabulary(docs, "doc_id", "text")
      .select("token", "tf").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
      .filter(_._1.nonEmpty)
    val fromPairs = NgramLm.docBigramsWithEnd(docs, "doc_id", "text")
      .groupBy("w1").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fromPairs shouldBe direct
  }

  it should "emit n rows per n-token document (pairs + one sentinel)" in {
    val perDoc = NgramLm.docBigramsWithEnd(docs, "doc_id", "text")
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    perDoc(0L) shouldBe 9L
    perDoc(3L) shouldBe 1L // single token: sentinel row only
    perDoc(4L) shouldBe 3L
    perDoc.get(5L) shouldBe None // empty doc emits nothing
    val sentinels = NgramLm.docBigramsWithEnd(docs, "doc_id", "text")
      .filter("w2 IS NULL").groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sentinels.values.toSet shouldBe Set(1L) // exactly one per non-empty doc
  }
}
