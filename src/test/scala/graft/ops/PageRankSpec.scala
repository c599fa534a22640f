package graft.ops

import graft.SparkSpec

/** [[PageRank]]: hand-computed iterations, mass conservation, dangling
  * redistribution, and partitioning-independence of the integer form.
  */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  "pageRank" should "hold the uniform fixpoint on a 2-cycle" in {
    // N=2: r0 = 5e11 each; teleport 75e9; contrib 5e11 -> r1 = 75e9 +
    // 85*5e11 div 100 = 5e11: stationary, mass exactly conserved
    val r = ranks(Seq((1L, 2L), (2L, 1L)), 3)
    r shouldBe Map(1L -> 500000000000L, 2L -> 500000000000L)
  }

  it should "match the hand-computed hub/authority step" in {
    // A(1)->B,C; B(2)->A; C(3)->A. r0=333333333333 each, teleport=5e10.
    // contrib(A)=2*333333333333, contrib(B)=contrib(C)=333333333333 div 2.
    val r = ranks(Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)), 1)
    r(1L) shouldBe 50000000000L + 85L * 666666666666L / 100L
    r(2L) shouldBe 50000000000L + 85L * 166666666666L / 100L
    r(2L) shouldBe r(3L) // symmetric in-links
  }

  it should "redistribute dangling mass instead of leaking it" in {
    // 1->2, 2 dangles. Without redistribution half the mass vanishes per
    // iteration; with it, total stays within per-term truncation of Scale.
    val r = ranks(Seq((1L, 2L)), 4)
    val total = r.values.sum
    total should be > (PageRank.Scale - 100L)
    total should be <= PageRank.Scale
    r(2L) should be > r(1L) // 2 receives 1's mass plus its own teleport
  }

  it should "be invariant to input partitioning (integer arithmetic)" in {
    val edges = (0L until 40L).flatMap(i =>
      Seq((i, (i * 3 + 1) % 40), (i, (i * 7 + 2) % 40)))
    val one = ranks(edges, 3)
    val many = PageRank.pageRank(
        edges.toDF("src", "dst").repartition(13), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    many shouldBe one
  }
}
