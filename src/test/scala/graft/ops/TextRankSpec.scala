package graft.ops

import graft.SparkSpec

/** [[TextRank]]: connectivity (not raw frequency) drives the ranking. */
class TextRankSpec extends SparkSpec {

  import spark.implicits._

  "keywords" should "rank the co-occurrence hub first" in {
    // "hub" neighbors {a, b, c, d}; every other token has <= 2 neighbors.
    val docs = Seq("hub a", "hub b", "hub c", "hub d", "a b")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val top = TextRank.keywords(docs, "id", "text", iterations = 5, topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    top.head._1 shouldBe "hub"
    top.head._2 should be > top(1)._2
  }

  it should "rank connectivity over repetition" in {
    // "spam" repeats 6x but only ever next to "x"; "link" touches 3 tokens
    val docs = Seq("spam x spam x spam x spam x spam x spam x",
      "link p", "link q", "link r")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val ranks = TextRank.keywords(docs, "id", "text", iterations = 5,
        topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ranks("link") should be > ranks("spam")
  }

  it should "emit ranks summing to ~the full mass (connected fixture)" in {
    val docs = Seq((1L, "a b c a b c")).toDF("id", "text")
    val total = TextRank.keywords(docs, "id", "text", iterations = 3,
        topN = 10)
      .collect().map(_.getLong(1)).sum
    total should be > (PageRank.Scale - 100L)
    total should be <= PageRank.Scale
  }
}
