package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-group resolution: near-dup PAIRS (from MinHash/SimHash/n-gram
  * join) → connected COMPONENTS → one canonical document per group. The
  * step a real corpus dedup needs after pair finding — transitive dups
  * (A~B, B~C but A!~C) must collapse into one group, or the pipeline keeps
  * two of the three.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round every node takes the min of its label and
  * its neighbors' labels; fixpoint = each node holds its component's
  * minimum id. Near-dup graphs are dense clusters of tiny diameter
  * (LSH pairs approximate cliques), so convergence is 1–3 rounds in
  * practice; `maxIters` bounds pathological chains.
  *
  * Scale posture: each round is one shuffle (edge-label join + min
  * aggregate), all keyed by node id — the same exchange pattern as a
  * large-join stage, no driver-side graph. Each round's labels are
  * localCheckpoint'ed: without lineage truncation the logical plan doubles
  * per iteration (labels feed both the neighbor aggregate and the join),
  * going exponential by round ~8 — checkpointing keeps the plan constant-
  * size, which is the standard Spark idiom for iterative graph algorithms.
  * On a cluster with executor loss concerns, swap localCheckpoint for
  * reliable `checkpoint()` against a checkpoint dir; semantics identical.
  */
object DedupGroups {

  /** Connected components of (nodes, edges): returns (id, group_id) where
    * group_id is the smallest node id in the component. Nodes absent from
    * every edge form singleton groups (group_id = id). Edges are treated
    * as undirected; self-loops and duplicates are harmless.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIters: Int = 20): DataFrame = {
    val ids = nodes.columns.head
    val Seq(src, dst) = edges.columns.take(2).toSeq
    // symmetric closure once; reused every round
    val sym = edges.select(col(src).as("__src"), col(dst).as("__dst"))
      .union(edges.select(col(dst).as("__src"), col(src).as("__dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var labels = nodes.select(col(ids).as("__id"), col(ids).as("__label"))
      .localCheckpoint()
    val verbose = sys.env.contains("GRAFT_CC_VERBOSE")
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val t0 = System.nanoTime()
      val neighborMin = sym
        .join(labels, sym("__src") === labels("__id"))
        .groupBy(col("__dst").as("__id2"))
        .agg(min("__label").as("__nbr_min"))
      val next = labels
        .join(neighborMin, labels("__id") === neighborMin("__id2"), "left")
        .select(col("__id"),
          least(col("__label"), coalesce(col("__nbr_min"), col("__label")))
            .as("__label"),
          (col("__nbr_min") < col("__label")).as("__changed"))
        .localCheckpoint()
      val changed = next.filter(col("__changed")).count()
      labels = next.drop("__changed")
      converged = changed == 0L
      it += 1
      if (verbose) println(f"[cc] round $it changed=$changed ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    if (verbose) println(s"[cc] converged after $it rounds")
    sym.unpersist(false)
    if (!converged)
      // Labels are NOT at fixpoint: a component with diameter > maxIters
      // would silently split into several groups and the caller would keep
      // multiple "canonical" docs from one true component. Fail loudly.
      throw new IllegalStateException(
        s"connectedComponents did not converge within maxIters=$maxIters " +
          "rounds (component diameter exceeds maxIters); raise maxIters")
    labels.select(col("__id").as(ids), col("__label").as("group_id"))
  }

  /** Full dedup-group resolution over a document table: find near-dup pairs
    * with `pairsOf`, resolve components, and mark the canonical keeper
    * (smallest doc id per group — the same keep-smallest convention as
    * [[TextDedup.exactDedup]]). Returns every input doc as
    * (id, group_id, keep).
    *
    * The iterative propagation runs ONLY over nodes that appear in a pair
    * — the near-dup subgraph, orders of magnitude smaller than the corpus
    * — and untouched docs rejoin as singletons afterwards. Pairs are
    * checkpointed first so the (possibly expensive) pair finder runs once,
    * not once per use site.
    *
    * The final corpus←groups enrichment join broadcasts the groups table
    * by default: checkpointed frames carry no size statistics, so Spark
    * would otherwise plan the registry's only sort-merge join — and the
    * groups table is bounded by the docs appearing in a pair, which a
    * usable dedup corpus keeps far below broadcast scale. Pass
    * `broadcastGroups = false` for pathological corpora where near-dups
    * approach corpus size and let AQE pick the join.
    */
  def resolve(docs: DataFrame, idCol: String,
              pairsOf: DataFrame => DataFrame,
              broadcastGroups: Boolean = true): DataFrame =
    resolveFromPairs(docs, idCol, pairsOf(docs), broadcastGroups)

  /** [[resolve]] over an already-computed pair table (id_a, id_b) — the
    * incremental-corpus entry point, where pairs accumulate across
    * batches instead of being recomputed from the docs.
    */
  def resolveFromPairs(docs: DataFrame, idCol: String, pairTable: DataFrame,
                       broadcastGroups: Boolean = true): DataFrame = {
    val pairs = pairTable.select(col("id_a"), col("id_b")).localCheckpoint()
    val touched = pairs.select(col("id_a").as(idCol))
      .union(pairs.select(col("id_b").as(idCol))).distinct()
    val groups = connectedComponents(touched, pairs)
    docs.select(col(idCol))
      .join(if (broadcastGroups) broadcast(groups) else groups, Seq(idCol), "left")
      .withColumn("group_id", coalesce(col("group_id"), col(idCol)))
      .withColumn("keep", col(idCol) === col("group_id"))
  }
}
