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

  "pageRankConverged" should "stop immediately on a stationary start" in {
    val (df, iters, delta) = PageRank.pageRankConverged(
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), "src", "dst",
      epsilonScaled = 0L, maxIterations = 10)
    iters shouldBe 1
    delta shouldBe 0L
    df.collect().map(_.getLong(1)).toSeq shouldBe Seq(500000000000L, 500000000000L)
  }

  it should "match the fixed-iteration form after the same number of rounds" in {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
    // damping 0.85 contracts deltas geometrically: 0.85^k <= 1e-3 of the
    // 1e12 mass needs ~43 rounds
    val (df, iters, delta) = PageRank.pageRankConverged(
      edges.toDF("src", "dst"), "src", "dst",
      epsilonScaled = 1000000000L, maxIterations = 60)
    delta should be <= 1000000000L
    iters should be < 60
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      ranks(edges, iters)
  }

  "trustRank" should "reduce to pageRank when every node is a seed" in {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
    val seeds = Seq(1L, 2L, 3L).toDF("node")
    val tr = PageRank.trustRank(edges.toDF("src", "dst"), "src", "dst",
        seeds, "node", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    tr shouldBe ranks(edges, 2)
  }

  it should "starve nodes unreachable from the seeds" in {
    // two disjoint 2-cycles; seed only in the first
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L))
    val tr = PageRank.trustRank(edges.toDF("src", "dst"), "src", "dst",
        Seq(1L).toDF("node"), "node", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    tr(3L) shouldBe 0L
    tr(4L) shouldBe 0L
    tr(1L) should be > 0L
    tr(2L) should be > 0L
    // all mass stays in the seeded component (minus truncation)
    (tr(1L) + tr(2L)) should be > (PageRank.Scale - 100L)
  }

  it should "match the hand-computed seeded step" in {
    // 1 -> 2 -> 3 -> 1, seed {1}: r0 = (1e12, 0, 0);
    // r1: node2 gets 85% of node1's mass, others only teleport-at-seed
    val tr = PageRank.trustRank(
        Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"), "src", "dst",
        Seq(1L).toDF("node"), "node", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    tr(1L) shouldBe 150000000000L // teleport only (node 3 held 0)
    tr(2L) shouldBe 85L * PageRank.Scale / 100L
    tr(3L) shouldBe 0L
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
