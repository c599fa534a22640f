package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The round-14 measured-size LOCAL fast path of the graph tier
  * ([[PageRank.LocalEdgesMax]]): below the edge threshold the whole
  * integer recurrence runs in-JVM and returns a LocalRelation. The
  * contract locked here is BIT-IDENTITY with the distributed loop on the
  * same graph — the recurrence is integer floor-division (PageRank) /
  * exact-integer-double (HITS) arithmetic, so placement must not change a
  * digit — plus the regime gate itself (threshold honored both ways, no
  * pins left by the local form).
  */
class GraphLocalPathSpec extends SparkSpec {

  import spark.implicits._

  // a graph with multi-path structure, a dangling node (9 receives only),
  // and asymmetric degrees — exercises contribs, dangling mass, teleport
  private val edges = (0L until 40L)
    .flatMap(i => Seq((i, (i * 3 + 1) % 41), (i, (i * 7 + 2) % 41)))
    .toDF("src", "dst")

  private def forceDistributed[T](body: => T): T = {
    sys.props("graft.graph.localEdgesMax") = "0"
    try body finally sys.props -= "graft.graph.localEdgesMax"
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq

  "the local PageRank path" should "match the distributed loop bit-for-bit" in {
    val local = PageRank.pageRank(edges, "src", "dst", iterations = 5)
    val dist = forceDistributed(
      PageRank.pageRank(edges, "src", "dst", iterations = 5))
    sortedRows(local) shouldBe sortedRows(dist)
  }

  it should "match for trustRank (seeded teleport + seeded dangling mass)" in {
    val seeds = Seq(0L, 7L, 999L).toDF("n") // 999 is outside the graph
    val local = PageRank.trustRank(edges, "src", "dst", seeds, "n", 5)
    val dist = forceDistributed(
      PageRank.trustRank(edges, "src", "dst", seeds, "n", 5))
    sortedRows(local) shouldBe sortedRows(dist)
  }

  it should "agree across regimes — and with the clean seed frame — on DUPLICATE seeds" in {
    // advice, round 14: duplicate seed rows used to duplicate node rows
    // through prepare()'s left join (inflating nNodes/nRecv) while the
    // local twin's Set deduped — same input, regime-dependent results.
    // iterate() now distincts seeds at entry, so all four runs agree.
    val clean = Seq(0L, 7L).toDF("n")
    val dup = Seq(0L, 7L, 7L, 0L, 7L).toDF("n")
    val expected = sortedRows(
      PageRank.trustRank(edges, "src", "dst", clean, "n", 5))
    sortedRows(PageRank.trustRank(edges, "src", "dst", dup, "n", 5)) shouldBe
      expected
    forceDistributed {
      sortedRows(PageRank.trustRank(edges, "src", "dst", dup, "n", 5)) shouldBe
        expected
      sortedRows(PageRank.trustRank(edges, "src", "dst", clean, "n", 5)) shouldBe
        expected
    }
  }

  "the local HITS path" should "match the distributed half-steps bit-for-bit" in {
    val local = Hits.hits(edges, "src", "dst", iterations = 3)
    val dist = forceDistributed(Hits.hits(edges, "src", "dst", iterations = 3))
    sortedRows(local) shouldBe sortedRows(dist)
  }

  it should "match the distributed CONVERGED loop on (values, iterations, delta)" in {
    val (lr, li, ld) = PageRank.pageRankConverged(edges, "src", "dst",
      epsilonScaled = 1000000L, maxIterations = 30)
    val (dr, di, dd) = forceDistributed(
      PageRank.pageRankConverged(edges, "src", "dst",
        epsilonScaled = 1000000L, maxIterations = 30))
    li shouldBe di
    ld shouldBe dd
    sortedRows(lr) shouldBe sortedRows(dr)
    li should be > 1 // the epsilon actually drove multiple rounds
  }

  "the local union-find path" should "match the distributed star loop's groups" in {
    // a chain (worst case for label propagation), a clique, and singletons
    val nodes = (0L until 30L).toDF("id")
    val pairEdges = ((0L until 9L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 22L), (20L, 22L))).toDF("src", "dst")
    val local = DedupGroups.connectedComponents(nodes, pairEdges)
    val dist = forceDistributed(
      DedupGroups.connectedComponents(nodes, pairEdges))
    sortedRows(local) shouldBe sortedRows(dist)
    // chain collapses to 0, triangle to 20, untouched ids to themselves
    val m = local.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    m(5L) shouldBe 0L
    m(22L) shouldBe 20L
    m(29L) shouldBe 29L
  }

  "the regime gate" should "return a LocalRelation below the threshold and pin nothing" in {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val m = PageRank.pageRankManaged(edges, "src", "dst", 3)
    val plan = m.df.queryExecution.executedPlan.toString
    plan should include("LocalTableScan")
    plan should not include "Exchange"
    m.use(_.count())
    spark.sparkContext.getPersistentRDDs.keySet.diff(before) shouldBe empty
  }

  it should "take the distributed loop when the threshold is 0" in {
    forceDistributed {
      val m = PageRank.pageRankManaged(edges, "src", "dst", 3)
      try {
        // the distributed loop reads its pinned rank generations — the
        // marker the local path can never produce (the INPUT fixture is
        // itself a LocalRelation, so that string proves nothing here)
        m.df.queryExecution.executedPlan.toString should include("InMemoryTableScan")
      } finally m.release()
    }
  }
}
