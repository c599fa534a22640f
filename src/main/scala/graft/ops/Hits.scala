package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg, JACM 1999): the mutually-recursive
  * link ranking — a good hub points at good authorities, a good authority
  * is pointed at by good hubs. On a crawl graph the authority score finds
  * canonical content pages and the hub score finds index/directory pages;
  * together with [[PageRank]] they triangulate document quality.
  *
  * Integer state, deterministic normalization: scores live as scaled
  * BIGINTs (mass [[PageRank.Scale]]), each half-step re-normalizes to the
  * scale with `floor(raw·1e12 / total)` computed in DOUBLE — both factors
  * are exact integers on both engines, and IEEE multiply/divide/floor are
  * correctly rounded per-operation, so the quantized scores are
  * bit-identical cross-engine without 128-bit arithmetic (the raw·Scale
  * product overflows BIGINT; L1 normalization replaces Kleinberg's L2,
  * standard in practice and exactly portable). The L1 total is ONE driver
  * scalar per half-step over the pinned |V|-row raw frame — the half-step
  * checkpoint is a driver action anyway, so folding the total into a
  * literal deletes the crossJoin+broadcast stage the in-plan form paid
  * (round-11 bench lever; identical arithmetic, identical values).
  *
  * Scale shape: per half-step ONE co-keyed join (edges onto scores) and
  * one groupBy-sum — O(|V|+|E|) shuffle, fixed rounds; zero-score nodes
  * ride as absences (see [[rawHalfStep]]) and the full node set is
  * restored once in the output join; lineage truncated per half-step
  * like [[PageRank]].
  *
  * Cache lifecycle: the plain form pins the edge/node frames for the
  * session (job-per-query shape); [[hitsManaged]] hands back a release
  * handle covering the pins AND the per-half-step checkpoint blocks.
  */
object Hits {

  /** `iterations` full hub↔authority rounds. Returns
    * (node, hub_scaled, auth_scaled); each column sums to ~Scale minus
    * per-node truncation.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iterations: Int): DataFrame =
    hitsManaged(edges, srcCol, dstCol, iterations).df

  /** The raw (un-normalized) half-step frame: scores flow across
    * `edgeFrom`→`edgeTo` via one co-keyed join and one groupBy-sum —
    * nothing else. Nodes receiving no mass are simply ABSENT, which is
    * arithmetic-identical to carrying an explicit 0 row: an absent node
    * contributes nothing to the next half-step's edge join (= a 0 score
    * would), nothing to the L1 total, and normalizes to 0 — so the
    * per-half-step left-join-back-to-nodes the round-10 shape paid
    * (one |V|-row join × 2 × iterations) is deleted outright and the
    * full node set is restored ONCE in the final output join
    * (round-11 lever; HitsSpec values bit-identical). Package-visible so
    * the plan-invariants suite can lock the join strategy (the
    * shuffle_hash hint on the stats-less cached input is load-bearing —
    * losing it degrades every half-step to SortMergeJoin) on exactly the
    * code the iteration runs, since the real half-steps materialize
    * eagerly and leave no inspectable plan behind.
    */
  private[graft] def rawHalfStep(e: DataFrame, scores: DataFrame,
                                 scoreCol: String, edgeFrom: String,
                                 edgeTo: String,
                                 small: Boolean = false): DataFrame =
    e.join(if (small) broadcast(scores) else scores.hint("shuffle_hash"),
        e(edgeFrom) === scores("node"))
      .select(col(edgeTo).as("node"), col(scoreCol).as("__s"))
      .groupBy("node").agg(sum("__s").as("__raw"))

  /** Driver-side twin of the distributed half-step chain — the same
    * per-edge sums, the same `floor(raw·Scale/tot)` normalization on
    * exact-integer DOUBLES (IEEE multiply/divide/floor are correctly
    * rounded, so JVM placement cannot change a bit). Called only under
    * [[PageRank.LocalEdgesMax]]; every HITS oracle exercises this path.
    */
  private def localHits(edges: Array[(Long, Long)],
                        iterations: Int): Seq[(Long, Long, Long)] = {
    val g = new PageRank.EdgeIndex(edges)
    val nodeIds = g.nodeIds
    val n = g.n
    val src = g.src
    val dst = g.dst
    def halfStep(scores: Array[Long], from: Array[Int],
                 to: Array[Int]): Array[Long] = {
      val raw = new Array[Long](n)
      var k = 0
      while (k < edges.length) { raw(to(k)) += scores(from(k)); k += 1 }
      var tot = 0L
      var j = 0
      while (j < n) { tot += raw(j); j += 1 }
      val out = new Array[Long](n)
      if (tot > 0) {
        j = 0
        while (j < n) {
          out(j) = math.floor(
            raw(j).toDouble * PageRank.Scale.toDouble / tot.toDouble).toLong
          j += 1
        }
      }
      out
    }
    var hubs = Array.fill(n)(PageRank.Scale / n)
    var auths: Array[Long] = null
    (1 to iterations).foreach { _ =>
      auths = halfStep(hubs, src, dst)
      hubs = halfStep(auths, dst, src)
    }
    nodeIds.indices.map(j => (nodeIds(j), hubs(j), auths(j)))
  }

  /** [[hits]] with an explicit cache-release handle. */
  def hitsManaged(edges: DataFrame, srcCol: String, dstCol: String,
                  iterations: Int): Managed = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    PageRank.collectSmallEdges(e0, PageRank.LocalEdgesMax).foreach { eArr =>
      // measured-small graph: identical arithmetic in-JVM, LocalRelation
      // out, nothing pinned — see [[PageRank.LocalEdgesMax]]
      val out = edges.sparkSession
        .createDataFrame(localHits(eArr, iterations))
        .toDF("node", "hub_scaled", "auth_scaled")
      return new Managed(out, Nil, Nil)
    }
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cpRdds = scala.collection.mutable.ArrayBuffer.empty[RDD[_]]
    val e = e0.persist(lvl)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().persist(lvl)
    val n = nodes.count()
    // same measured-|V| broadcast siding as [[PageRank.BroadcastNodesMax]]:
    // one exchange per half-step (the groupBy) when the score frames fit
    val small = n <= PageRank.BroadcastNodesMax

    // one LAZY L1-normalized half-step: scores flow across
    // `edgeFrom`→`edgeTo`; the L1 total rides IN-PLAN as a single-row
    // broadcast off the same raw subtree (ReuseExchange collapses the
    // doubled join+agg), so a full hub→auth→hub round composes into ONE
    // materializing action. The round-13 shape paid FOUR per round — a
    // driver total job + an eager checkpoint per half-step — and those
    // barriers, not arithmetic, dominated q_ext_hits at local[32]. The
    // normalization is column-for-column the driver-literal form:
    // floor(raw·Scale/tot). Parity with the local twin holds because
    // both paths execute the IDENTICAL IEEE op sequence
    // (long→double, multiply, divide, floor — each correctly rounded),
    // not because the intermediates are exact: with Scale=1e12, raw
    // values above 2^53/Scale already round at the long→double cast,
    // identically on both paths (HitsSpec + the q_ext_hits oracle lock
    // the bit-identity).
    def halfStep(scores: DataFrame, scoreCol: String,
                 edgeFrom: String, edgeTo: String, outCol: String): DataFrame = {
      val raw = rawHalfStep(e, scores, scoreCol, edgeFrom, edgeTo, small)
      val tot = raw.agg(coalesce(sum("__raw"), lit(0L)).as("__tot"))
      raw.crossJoin(broadcast(tot))
        .select(col("node"),
          when(col("__tot") > 0,
            floor(col("__raw").cast("double") * lit(PageRank.Scale.toDouble)
              / col("__tot").cast("double")).cast("long"))
            .otherwise(lit(0L)).as(outCol))
    }

    var hubs = nodes.select(col("node"),
      lit(PageRank.Scale / n).as("hub")).persist(lvl)
    var auths: DataFrame = null
    (1 to iterations).foreach { i =>
      val last = i == iterations
      // the auth half-frame is referenced twice inside the round plan
      // (h's raw join + its total) and once more by the output join on
      // the final round: pin it so the round job computes it once. On
      // the FINAL round it is eagerly checkpointed instead — its cache
      // must outlive the release of this round's input hubs blocks
      // below, and a pin's recompute lineage would reach them.
      val a0 = halfStep(hubs, "hub", "src", "dst", "auth")
      val a = if (last) {
        val cp = a0.localCheckpoint(true)
        cpRdds ++= Managed.directCheckpointRdds(cp)
        cp
      } else a0.persist(lvl)
      // ONE eager checkpoint per round: the materializing action for the
      // whole round AND the lineage cut (raw is referenced twice per
      // half-step, so an uncut nest would double the plan tree per
      // half-step — the round-10 driver-OOM class).
      val h = halfStep(a, "auth", "dst", "src", "hub").localCheckpoint(true)
      cpRdds ++= Managed.directCheckpointRdds(h)
      // the previous round's frames (cache pins AND checkpoint blocks)
      // are provably dead once this round's h has materialized — release
      // in-loop, bounding live storage to ~2 |V|-row frames. DIRECT
      // checkpoint release only: round-1 hubs is a persisted projection
      // whose lineage reaches the CALLER'S edges frame — a deep walk
      // there would free a checkpoint-backed input argument
      // (GraphManagedSpec locks this).
      if (auths != null) {
        auths.unpersist(false)
        Managed.directCheckpointRdds(auths).foreach(_.unpersist(false))
      }
      hubs.unpersist(false)
      Managed.directCheckpointRdds(hubs).foreach(_.unpersist(false))
      auths = a
      hubs = h
    }
    // restore the full node set ONCE: nodes absent from a half-step frame
    // are exactly the zero-score nodes (see rawHalfStep doc)
    def sided(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df.hint("shuffle_hash")
    val out = nodes
      .join(sided(hubs), Seq("node"), "left")
      .join(sided(auths), Seq("node"), "left")
      .select(col("node"), coalesce(col("hub"), lit(0L)).as("hub_scaled"),
        coalesce(col("auth"), lit(0L)).as("auth_scaled"))
    new Managed(out, Seq(e, nodes), cpRdds.toSeq)
  }
}
