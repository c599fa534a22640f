package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupGroupsSpec extends SparkSpec {
  import spark.implicits._

  "connectedComponents" should "collapse transitive chains to the min id" in {
    // 1-2, 2-3 (chain: 1~3 only transitively); 5-4 (reversed order); 6 isolated
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 4L)).toDF("src", "dst")
    val out = DedupGroups.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L)
  }

  it should "converge on a long path in logarithmic star rounds" in {
    // path 0-1-2-...-63: diameter 63 — min-label propagation would need 63
    // rounds. Kiveris et al. prove O(log² n) for the two-phase variant;
    // the alternation is empirically O(log n) (observed: 5 rounds here).
    // Assert 2·log₂(n) — far below the diameter the old algorithm needed,
    // with headroom over the empirical bound so other graph shapes don't
    // flake the suite.
    val n = 64L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = DedupGroups.connectedComponentsWithRounds(nodes, edges)
    labels.as[(Long, Long)].collect().toMap.values.toSet shouldBe Set(0L)
    rounds should be <= 2 * (math.log(n.toDouble) / math.log(2)).toInt
  }

  it should "produce identical groups under a reliable checkpoint dir" in {
    // the reliable-checkpoint plumbing belongs to the DISTRIBUTED star
    // loop: pin that regime (the 31-edge fixture would otherwise take the
    // round-14 local fast path and never touch the directory)
    sys.props("graft.graph.localEdgesMax") = "0"
    try {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt-").toString
    val nodes = (0L until 32L).toDF("id")
    val edges = (0L until 31L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = DedupGroups.connectedComponents(nodes, edges,
        checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    out.values.toSet shouldBe Set(0L)
    // reliable checkpoints actually hit the directory
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.count(java.nio.file.Files.isRegularFile(_))
    files should be > 0
    } finally sys.props -= "graft.graph.localEdgesMax"
  }

  it should "fail loudly when maxIters is too small to converge" in {
    // one star round cannot collapse a 64-path: edges are not at fixpoint —
    // silent return would split one true component into several groups
    // (maxIters gates the DISTRIBUTED loop: pin that regime, the local
    // union-find has no rounds to run out of)
    sys.props("graft.graph.localEdgesMax") = "0"
    val nodes = (0L to 63L).toDF("id")
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = try intercept[IllegalStateException] {
      DedupGroups.connectedComponents(nodes, edges, maxIters = 1).collect()
    } finally sys.props -= "graft.graph.localEdgesMax"
    ex.getMessage should include("did not converge")
  }

  it should "tolerate self-loops and duplicate edges" in {
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L)).toDF("src", "dst")
    DedupGroups.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap shouldBe Map(1L -> 1L, 2L -> 1L)
  }

  "mergeLabels" should "fold new pairs into an existing labeling without full recompute" in {
    // groups {1,2}, {4,5}, {7}; new pairs bridge 5-7 and 2-5: everything
    // merges into group 1 except untouched 9
    val labels = Seq((1L, 1L), (2L, 1L), (4L, 4L), (5L, 4L), (7L, 7L), (9L, 9L))
      .toDF("id", "group_id")
    val newPairs = Seq((5L, 7L), (2L, 5L)).toDF("id_a", "id_b")
    val merged = DedupGroups.mergeLabels(labels, newPairs, "id")
      .as[(Long, Long)].collect().toMap
    merged shouldBe Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 5L -> 1L, 7L -> 1L, 9L -> 9L)
    // parity with a full recompute over (old edges reconstructed + new)
    val allPairs = Seq((1L, 2L), (4L, 5L), (5L, 7L), (2L, 5L)).toDF("id_a", "id_b")
    val full = DedupGroups.resolveFromPairs(labels.select("id"), "id", allPairs)
      .select("id", "group_id").as[(Long, Long)].collect().toMap
    merged shouldBe full
  }

  it should "be a no-op for pairs inside one group" in {
    val labels = Seq((1L, 1L), (2L, 1L), (4L, 4L)).toDF("id", "group_id")
    val newPairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    DedupGroups.mergeLabels(labels, newPairs, "id")
      .as[(Long, Long)].collect().toMap shouldBe Map(1L -> 1L, 2L -> 1L, 4L -> 4L)
  }

  "resolve" should "keep exactly one canonical doc per near-dup group" in {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "  THE   quick brown fox jumps over the lazy dog "),
      (3L, "the quick brown fox jumps over the lazy cat"),
      (4L, "completely different content about spark engines"),
      (5L, "completely different content about spark engines"))
      .toDF("doc_id", "text")
    val out = DedupGroups.resolve(docs, "doc_id",
        d => TextDedup.ngramJaccardPairs(d, "doc_id", "text",
          shingleN = 3, threshold = 0.5))
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect()
    out shouldBe Array(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 4L, false))
    // the filter form keeps exactly the group minima
    out.filter(_._3).map(_._1) shouldBe Array(1L, 4L)
  }
}
