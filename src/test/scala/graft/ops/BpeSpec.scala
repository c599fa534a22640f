package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Bpe]]: hand-computed merge sequences, greedy leftmost pairing, and
  * train/encode consistency.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def merges(texts: Seq[String], k: Int): Seq[(String, String, Long)] =
    Bpe.learnMerges(texts.toDF("text"), "text", k)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq

  "learnMerges" should "reproduce the hand-computed sequence" in {
    // corpus: low x2, lowest x1 -> pairs: (l,o) 3, (o,w) 3, (w,e) 1,
    // (e,s) 1, (s,t) 1. Best: (l,o) (tie with (o,w), lex order wins).
    // After merge 1: lo w / lo w e s t -> best (lo, w) 3 -> low...
    val m = merges(Seq("low low", "lowest"), 3)
    m.map(p => (p._1, p._2)) shouldBe Seq(("l", "o"), ("lo", "w"), ("e", "s"))
    m.map(_._3) shouldBe Seq(3L, 3L, 1L)
  }

  it should "merge leftmost-first on runs (classic greedy)" in {
    // "aaaa": pairs (a,a) x3 -> merge produces [aa][aa] (positions 1-2 and
    // 3-4), NOT [a][aa][a]; next iteration best pair is (aa, aa)
    val m = merges(Seq("aaaa"), 2)
    m.map(p => (p._1, p._2)) shouldBe Seq(("a", "a"), ("aa", "aa"))
  }

  it should "stop early when words are fully fused" in {
    merges(Seq("ab ab"), 10).size shouldBe 1 // only (a,b) exists
  }

  it should "compute identical merges on the local and distributed paths" in {
    val docs = Seq("low low lower", "lowest newest", "wide wider widest")
      .toDF("text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("merge_rank").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
    // driverVocabMax = 0 forces the distributed loop through the public API
    rows(Bpe.learnMerges(docs, "text", 8, driverVocabMax = 0L)) shouldBe
      rows(Bpe.learnMerges(docs, "text", 8))
    rows(Bpe.learnMergesDistributed(docs, "text", 8)) shouldBe
      rows(Bpe.learnMerges(docs, "text", 8))
  }

  "segment" should "encode training words to their trained state" in {
    val docs = Seq("low low", "lowest").toDF("text")
    val learned = Bpe.learnMerges(docs, "text", 3)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val segs = Bpe.segment(Seq("low", "lowest", "slow").toDF("word"), "word",
        learned)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    segs("low") shouldBe List("low")
    segs("lowest") shouldBe List("low", "es", "t")
    segs("slow") shouldBe List("s", "low") // unseen word reuses merges
  }

  it should "handle unseen characters as singleton segments" in {
    val segs = Bpe.segment(Seq("xyz").toDF("word"), "word",
        Seq(("l", "o")))
      .head().getSeq[String](1)
    segs shouldBe Seq("x", "y", "z")
  }
}
