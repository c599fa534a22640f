package graft.ops

import graft.SparkSpec

/** [[NgramLm]]: hand-computed add-one bigram likelihoods and the
  * integer-term portability properties.
  */
class NgramLmSpec extends SparkSpec {

  import spark.implicits._

  // corpus: "a b a b" + "a c" -> cb{(a,b)=2,(b,a)=1,(a,c)=1}, cu{a=3,b=1},
  // V=3. Every doc-1 bigram ratio is (cb+1)/(cu+V) = 1/2; doc 2's is 1/3.
  private val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("id", "text")

  private def t(x: Double): Long = math.floor(1e9 * x + 0.5).toLong

  "docBigrams" should "emit adjacent normalized pairs in order" in {
    NgramLm.docBigrams(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted shouldBe Seq((1L, "a", "b"), (1L, "a", "b"), (1L, "b", "a"),
        (2L, "a", "c")).sorted
  }

  it should "emit nothing for docs with fewer than two tokens" in {
    NgramLm.docBigrams(Seq((1L, "solo"), (2L, "")).toDF("id", "text"),
      "id", "text").count() shouldBe 0L
  }

  "avgLogProb" should "match the hand-computed nano-nat sums" in {
    val r = NgramLm.avgLogProb(docs, "id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    val half = t(math.log(1.0 / 2)) // all three doc-1 terms
    r(1L) shouldBe ((3L, 3 * half, -0.693147))
    r(2L) shouldBe ((1L, t(math.log(1.0 / 3)), -1.098612))
  }

  it should "score repeated boilerplate above rare garbage" in {
    val corpus = (0 until 30).map(i => (i.toLong, "the quick brown fox")) :+
      (99L, "zq xv qqq zzk")
    val r = NgramLm.avgLogProb(corpus.toDF("id", "text"), "id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    r(0L) should be > r(99L)
  }

  "collocations" should "rank exclusive pairs above promiscuous ones" in {
    // N=16: (k,l)=6, (m,n)=6, (k,n)=2, (m,l)=2; marginals all 8
    val docs = (Seq.fill(6)("k l") ++ Seq.fill(6)("m n") ++
      Seq.fill(2)("k n") ++ Seq.fill(2)("m l")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rows = NgramLm.collocations(docs, "text", minCount = 2, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // mirror the engine's sum-of-logs form exactly (ln(cb·N/(cl·cr)) as a
    // single log can differ in the last nano-nat)
    def pmi(cb: Long, cl: Long, cr: Long): Long =
      math.floor(1e9 * (math.log(cb) + math.log(16.0)
        - math.log(cl) - math.log(cr)) + 0.5).toLong
    rows.take(2).toSeq shouldBe Seq(
      ("k", "l", 6L, pmi(6, 8, 8)), // ln 1.5, tie-broken by w1 asc
      ("m", "n", 6L, pmi(6, 8, 8)))
    rows.map(_._4).toSeq shouldBe rows.map(_._4).toSeq.sorted.reverse
    rows.filter(r => r._1 == "k" && r._2 == "n").head._4 shouldBe pmi(2, 8, 8)
  }

  it should "drop pairs under the count floor" in {
    val docs = Seq((1L, "a b a b"), (2L, "c d")).toDF("id", "text")
    NgramLm.collocations(docs, "text", minCount = 2, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("a", "b"))
  }

  it should "be invariant to input partitioning (integer sums)" in {
    val corpus = (0L until 50L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} end"))
    val one = NgramLm.avgLogProb(corpus.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val many = NgramLm.avgLogProb(corpus.toDF("id", "text").repartition(17),
        "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    many shouldBe one
  }
}
