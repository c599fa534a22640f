package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-group resolution: near-dup PAIRS (from MinHash/SimHash/n-gram
  * join) → connected COMPONENTS → one canonical document per group. The
  * step a real corpus dedup needs after pair finding — transitive dups
  * (A~B, B~C but A!~C) must collapse into one group, or the pipeline keeps
  * two of the three.
  *
  * Algorithm: alternating large-star/small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each round
  * rewrites the edge set so every node points at progressively smaller
  * labels; the fixpoint is a star forest with each component collapsed onto
  * its minimum id. Kiveris et al. prove O(log² n) rounds for the two-phase
  * variant; for the alternation used here O(log n) is the empirically
  * observed bound (their experiments and ours) — either way it is
  * logarithmic-ish on ANY graph shape, including the chain-shaped near-dup
  * graphs where the previous min-label propagation needed O(component
  * diameter) rounds and hit its maxIters cliff. LSH pair graphs are
  * near-cliques, so in practice this converges in 1–3 rounds.
  *
  * Scale posture: each round is two grouped aggregations + two joins, all
  * keyed by node id — the same exchange pattern as a large-join stage, no
  * driver-side graph state and no collect_list (high-degree nodes never
  * materialize their neighbor list on one row; the star operations are
  * min-aggregate + join, which partial-aggregates map-side). Each round's
  * edge set is checkpointed (without lineage truncation the plan doubles
  * per iteration) and the superseded round's blocks are dropped as soon as
  * the next round materializes, so at most one round's edges are pinned at
  * a time. `checkpointDir = None` uses executor-local checkpoints (fast;
  * blocks are lost with an executor — fine for local mode and
  * retry-the-job pipelines); pass a reliable directory (HDFS/S3) on
  * clusters where executor loss must not fail the job.
  */
object DedupGroups {

  /** Materialize and truncate lineage: reliable `checkpoint()` into
    * `checkpointDir` when given, executor-local `localCheckpoint()`
    * otherwise.
    *
    * The checkpoint directory is GLOBAL SparkContext state
    * (`setCheckpointDir` appends a UUID subdir and every later
    * `RDD.checkpoint()` reads it), so it is set exactly once per context
    * and a DIFFERENT directory on a context that already has one is
    * rejected loudly — silently flipping the global would race concurrent
    * checkpoint users and could land this job's files in a directory
    * another owner deletes mid-run. One reliable checkpoint root per
    * session is the supported shape; callers needing isolation pass
    * subdirectories of it at their own layer or use separate sessions.
    */
  private def pin(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        val requested = new org.apache.hadoop.fs.Path(dir)
        sc.getCheckpointDir match {
          case Some(existing)
              // setCheckpointDir stored `dir`/<uuid>: compare the parent
              if new org.apache.hadoop.fs.Path(existing).getParent != null &&
                org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(
                  new org.apache.hadoop.fs.Path(existing).getParent) ==
                org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(requested) =>
            () // same root already active
          case Some(existing) =>
            throw new IllegalStateException(
              s"SparkContext checkpoint dir is already '$existing'; refusing to " +
                s"flip it to '$dir' mid-session (checkpoint dir is global state " +
                "shared by every checkpoint user — one root per session)")
          case None => sc.setCheckpointDir(dir)
        }
        df.checkpoint()
      case None => df.localCheckpoint()
    }

  /** Drop a pinned frame's cached blocks (the localCheckpoint storage).
    * Reliable-checkpoint files are left for the checkpoint-dir owner —
    * standard Spark lifecycle, same as any `rdd.checkpoint()` user.
    */
  private def release(df: DataFrame): Unit =
    Managed.directCheckpointRdds(df).foreach(_.unpersist(false))

  /** True iff the big→small edge set is a star forest: no source has two
    * targets and no node is both a source and a target. Any star forest
    * reachable by the star operations has each component's minimum as its
    * center (leaves all exceed their center by the orientation invariant),
    * so this is exactly the fixpoint test — and checking it structurally
    * detects convergence in the round that REACHES the fixpoint, where a
    * compare-to-previous checksum burns one full confirmation round.
    * One union + one grouped aggregate: a single job per round.
    */
  private def isStarForest(e: DataFrame): Boolean =
    e.select(col("__u").as("__n"), lit(1L).as("__s"), lit(0L).as("__d"))
      .union(e.select(col("__v").as("__n"), lit(0L).as("__s"), lit(1L).as("__d")))
      .groupBy("__n").agg(sum("__s").as("__s"), sum("__d").as("__d"))
      .filter(col("__s") > 1 || (col("__s") > 0 && col("__d") > 0))
      .isEmpty

  /** Connected components of (nodes, edges): returns (id, group_id) where
    * group_id is the smallest node id in the component. Nodes absent from
    * every edge form singleton groups (group_id = id). Edges are treated
    * as undirected; self-loops and duplicates are harmless.
    *
    * `maxIters` is a safety valve only: the alternation converges in
    * logarithmically many rounds (see object doc), so the default never
    * triggers at any realizable node count. Non-convergence still throws
    * rather than returning split components.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIters: Int = 40,
                          checkpointDir: Option[String] = None,
                          broadcastRoots: Boolean = true): DataFrame =
    connectedComponentsWithRounds(nodes, edges, maxIters, checkpointDir,
      broadcastRoots)._1

  /** As [[connectedComponents]], also returning the number of star rounds
    * executed — lets the convergence-bound spec assert the logarithmic
    * guarantee mechanically instead of editorially. */
  def connectedComponentsWithRounds(nodes: DataFrame, edges: DataFrame,
                                    maxIters: Int = 40,
                                    checkpointDir: Option[String] = None,
                                    broadcastRoots: Boolean = true)
      : (DataFrame, Int) = {
    val ids = nodes.columns.head
    val (r, it, fixpoint) = starRootsWithRounds(edges, maxIters, checkpointDir)
    val rootsPlan = r.select(col("__id").as(ids), col("group_id"))
    // Pinned frames carry no size statistics, so without the hint Spark
    // plans this labels join as a sort-merge join. Roots are bounded by
    // the pair-subgraph size (same argument as resolveFromPairs'
    // broadcastGroups — strictly smaller, in fact); disable together for
    // pathological near-dup graphs approaching corpus size.
    //
    // In the broadcast regime the roots are driver-bounded BY ASSUMPTION,
    // so materialize them as a LocalRelation and release the converged
    // checkpoint NOW: left to the ContextCleaner, the fixpoint blocks
    // back the returned frame until the session GCs it — in a long
    // registry session, never (the round-12 driver run measured the graph
    // tier +31% on identical code under the accumulated pins).
    val roots =
      if (broadcastRoots) { val l = localized(rootsPlan); release(fixpoint); l }
      else rootsPlan
    val labels = nodes.select(col(ids))
      .join(if (broadcastRoots) broadcast(roots) else roots, Seq(ids), "left")
      .select(col(ids), coalesce(col("group_id"), col(ids)).as("group_id"))
    (labels, it)
  }

  /** Collect a driver-bounded frame into a LocalRelation: self-contained,
    * GC-managed, zero block-manager footprint — the safe thing to hand a
    * caller whose backing checkpoint blocks are about to be released (the
    * [[Retrieval]] BM25 top-N pattern).
    */
  private def localized(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)

  /** Core star-contraction loop: canonicalize `edges` (first two columns,
    * undirected), iterate large-star/small-star to the fixpoint, and
    * return the star-forest mapping `(__id, group_id)` — one row per
    * NON-ROOT node, group_id = its component minimum — plus the round
    * count. Roots and untouched nodes are absent by construction; callers
    * coalesce them to themselves.
    *
    * The mapping is a pure PROJECTION of the converged (checkpointed) edge
    * set: at fixpoint every node appears as `__u` exactly once, pointing
    * at its component minimum (the star orientation invariant, asserted by
    * [[isStarForest]] the round convergence was detected), so no terminal
    * aggregation or extra checkpoint is needed — the round-8 shape spent
    * two additional jobs here (a guard groupBy(min) over the fixpoint plus
    * its pin) per resolution, ~15% of the operator's sf0.1 floor.
    *
    * The third element is the converged checkpoint frame itself, whose
    * blocks back the mapping: callers that materialize the mapping (the
    * broadcast regimes localize it into a LocalRelation) must `release`
    * it immediately; callers that hand the lazy mapping onward own its
    * lifecycle.
    */
  private def starRootsWithRounds(edges: DataFrame, maxIters: Int,
                                  checkpointDir: Option[String])
      : (DataFrame, Int, DataFrame) = {
    val Seq(src, dst) = edges.columns.take(2).toSeq
    // Measured-small pair graph: resolve in-JVM (union-find with
    // link-to-min, so each set's root IS its minimum id) and return the
    // same non-root star mapping as a LocalRelation — the round-14
    // [[PageRank.LocalEdgesMax]] fast path. The output contract (node →
    // component minimum) is ALGORITHM-INDEPENDENT, so values are identical
    // by definition; rounds report 0 (no distributed rounds ran). Near-dup
    // pair graphs are orders of magnitude smaller than the corpus, so in
    // practice this is the common regime; `-Dgraft.graph.localEdgesMax=0`
    // pins the distributed star loop (specs, probes, pathological pairs).
    // BIGINT ids only: the distributed star loop's greatest/least work on
    // ANY orderable id type (strings included), a long cast would silently
    // drop or re-order them (review finding, round 14) — non-long frames
    // fall through to the distributed loop. Null-carrying frames fall
    // through too (collectSmallEdges), matching the fallback discipline of
    // the PageRank/Hits twins.
    val idsAreLong = edges.schema.take(2)
      .forall(_.dataType == org.apache.spark.sql.types.LongType)
    val small =
      if (idsAreLong)
        PageRank.collectSmallEdges(edges.select(col(src), col(dst)),
          PageRank.LocalEdgesMax)
      else None
    small.foreach { eArr =>
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(a: Long): Long = {
        var r = a
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = a
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      eArr.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = {
        val s = scala.collection.mutable.LinkedHashSet.empty[Long]
        eArr.foreach { case (a, b) => s += a; s += b }
        s
      }
      val rows = nodes.toSeq.flatMap { n =>
        val r = find(n)
        if (r != n) Some((n, r)) else None
      }
      val roots = edges.sparkSession.createDataFrame(rows)
        .toDF("__id", "group_id")
      return (roots, 0, roots)
    }
    // Canonical orientation big→small; self-loops and duplicate pairs out.
    var e = pin(edges.select(
        greatest(col(src), col(dst)).as("__u"),
        least(col(src), col(dst)).as("__v"))
      .filter(col("__u") =!= col("__v"))
      .distinct(), checkpointDir)

    val verbose = sys.env.contains("GRAFT_CC_VERBOSE")
    if (verbose) println(f"[cc] entry pin done, ${e.rdd.getNumPartitions} partitions")
    val tc0 = System.nanoTime()
    var converged = isStarForest(e)
    if (verbose) println(f"[cc] initial check ${(System.nanoTime() - tc0) / 1e9}%.2fs")
    var it = 0
    while (!converged && it < maxIters) {
      val t0 = System.nanoTime()
      // Large-star: for every node u, m(u) = min(u ∪ neighbors); every
      // neighbor v > u re-points to m(u). Edges stay big→small (v > u ≥ m).
      val sym = e.select(col("__u"), col("__v"))
        .union(e.select(col("__v").as("__u"), col("__u").as("__v")))
      val mLarge = sym.groupBy("__u").agg(min("__v").as("__nmin"))
        .select(col("__u"), least(col("__u"), col("__nmin")).as("__m"))
      // No distinct here: large emits one row per input edge (sym keeps one
      // direction per edge under v > u), and small-star's terminal distinct
      // subsumes any duplicate (v, m) pairs — one less shuffle per round.
      val large = sym.filter(col("__v") > col("__u"))
        .join(mLarge, "__u")
        .select(col("__v").as("__u"), col("__m").as("__v"))
      // Small-star: on big→small edges, m(u) = min of u's smaller
      // neighbors; each smaller neighbor v and u itself re-point to m(u).
      val mSmall = large.groupBy("__u").agg(min("__v").as("__m"))
      val small = pin(large.join(mSmall, "__u")
        .select(col("__v").as("__u"), col("__m").as("__v"))
        .union(mSmall.select(col("__u"), col("__m").as("__v")))
        .filter(col("__u") =!= col("__v"))
        .distinct(), checkpointDir)
      converged = isStarForest(small)
      // `small` is materialized (checkpoints are eager), so the previous
      // round's blocks are dead weight — drop them now instead of letting
      // them accumulate across rounds in the block manager.
      release(e)
      e = small
      it += 1
      if (verbose) println(f"[cc] round $it ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    if (verbose) println(s"[cc] converged after $it rounds")
    if (!converged)
      // Edges are NOT at fixpoint: a component could still be split across
      // several stars and the caller would keep multiple "canonical" docs
      // from one true component. Fail loudly.
      throw new IllegalStateException(
        s"connectedComponents did not converge within maxIters=$maxIters rounds")
    (e.select(col("__u").as("__id"), col("__v").as("group_id")), it, e)
  }

  /** Full dedup-group resolution over a document table: find near-dup pairs
    * with `pairsOf`, resolve components, and mark the canonical keeper
    * (smallest doc id per group — the same keep-smallest convention as
    * [[TextDedup.exactDedup]]). Returns every input doc as
    * (id, group_id, keep).
    *
    * The iterative star rounds run ONLY over nodes that appear in a pair
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
              broadcastGroups: Boolean = true,
              checkpointDir: Option[String] = None): DataFrame =
    resolveFromPairs(docs, idCol, pairsOf(docs), broadcastGroups, checkpointDir)

  /** [[resolve]] for pair finders that persist intermediates (the
    * [[Managed]]-returning near-dup variants): the pair table is
    * checkpointed eagerly inside, so the finder's caches are released
    * before the returned frame ever executes — no leak into a long-lived
    * session. Prefer this entry point for the LSH family.
    */
  def resolveManaged(docs: DataFrame, idCol: String,
                     pairsOf: DataFrame => Managed,
                     broadcastGroups: Boolean = true,
                     checkpointDir: Option[String] = None): DataFrame = {
    val m = pairsOf(docs)
    try resolveFromPairs(docs, idCol, m.df, broadcastGroups, checkpointDir)
    finally m.release() // safe: resolveFromPairs checkpointed the pairs
  }

  /** Incrementally fold NEW pairs into an existing (id, group_id)
    * labeling — the streaming/arriving-batch form of [[resolveFromPairs]].
    * Returns the updated labeling over the same ids.
    *
    * New pairs can only MERGE existing components, never split them, so
    * the fixpoint never needs recomputing from the full pair history:
    * contract each component to one node (its current group id), keep
    * only the new pairs that bridge two different groups, and run the
    * star rounds over that contraction graph — one node per TOUCHED
    * group, usually a handful of nodes per batch regardless of corpus
    * size. Group ids are component-minimum doc ids and doc ids are
    * stable, so the contraction's min-label merge preserves the global
    * min-id invariant (the merged group's id = min over member groups'
    * ids = min doc id of the merged component). The corpus-wide labeling
    * is then fixed with a single broadcast map-side join — no shuffle of
    * the labels table.
    *
    * `labels` must cover every id appearing in `newPairs` — enroll a new
    * batch's docs as singletons (group_id = id) first. That contract is
    * ENFORCED (`assertCoverage`, on by default): the contraction joins
    * pairs to labels, so an unenrolled id would otherwise drop its pair
    * silently and split a true component — wrong groups with no error.
    * The check is one anti-join on the per-batch pair ids (small by
    * construction); disable it only where the caller proves coverage
    * upstream.
    */
  def mergeLabels(labels: DataFrame, newPairs: DataFrame, idCol: String,
                  checkpointDir: Option[String] = None,
                  assertCoverage: Boolean = true): DataFrame = {
    if (assertCoverage) {
      val missing = newPairs.select(col("id_a").as(idCol))
        .union(newPairs.select(col("id_b").as(idCol))).distinct()
        .join(labels.select(col(idCol)), Seq(idCol), "left_anti")
        .limit(5).collect()
      require(missing.isEmpty,
        s"mergeLabels: pair ids absent from labels (enroll new docs as " +
          s"singletons first): ${missing.map(_.get(0)).mkString(", ")} ...")
    }
    val ga = labels.select(col(idCol).as("id_a"), col("group_id").as("__ga"))
    val gb = labels.select(col(idCol).as("id_b"), col("group_id").as("__gb"))
    val contraction = newPairs.select(col("id_a"), col("id_b"))
      .join(ga, "id_a").join(gb, "id_b")
      .filter(col("__ga") =!= col("__gb"))
      .select(col("__ga"), col("__gb"))
      .distinct()
    // the star-forest mapping IS the group rewrite: one row per merged-away
    // group id, pointing at the merged component's minimum. Always
    // broadcast-bounded (one row per TOUCHED group in this batch), so
    // localize it and release the contraction fixpoint in-op — per-batch
    // checkpoint blocks must not outlive the batch (the streaming drivers'
    // deep-walk release then simply finds nothing left to free).
    val (mRaw, _, mFix) = starRootsWithRounds(contraction, 40, checkpointDir)
    val mapping = localized(
      mRaw.select(col("__id").as("__old_g"), col("group_id").as("__new_g")))
    release(mFix)
    labels.join(broadcast(mapping), col("group_id") === col("__old_g"), "left")
      .select(col(idCol),
        coalesce(col("__new_g"), col("group_id")).as("group_id"))
  }

  /** [[resolve]] over an already-computed pair table (id_a, id_b) — the
    * incremental-corpus entry point, where pairs accumulate across
    * batches instead of being recomputed from the docs.
    */
  def resolveFromPairs(docs: DataFrame, idCol: String, pairTable: DataFrame,
                       broadcastGroups: Boolean = true,
                       checkpointDir: Option[String] = None): DataFrame = {
    // The star loop's entry pin materializes the (possibly expensive) pair
    // finder exactly once — no separate pairs checkpoint here, and no
    // touched-nodes union/distinct: the docs join only needs the NON-ROOT
    // mapping (roots and untouched docs coalesce to themselves), so the
    // intermediate nodes←roots labels join of the generic entry point is
    // skipped too. Together with the terminal-aggregation elision in
    // [[starRootsWithRounds]] this removes three eager jobs and two
    // shuffles per resolution vs the round-8 shape (sf0.1 floor back to
    // 1.50 s — at-or-below the round-7 1.64 s mark; the fixed per-call
    // job count is what the elision buys at scale, where each extra
    // materialization is a full cluster barrier).
    val (rRaw, _, rFix) = starRootsWithRounds(
      pairTable.select(col("id_a"), col("id_b")), 40, checkpointDir)
    val rootsPlan = rRaw.select(col("__id").as(idCol), col("group_id"))
    // Broadcast regime = driver-bounded roots by assumption: localize and
    // release the converged checkpoint here instead of leaving its blocks
    // pinned behind the returned frame for the session's lifetime (see
    // connectedComponentsWithRounds).
    val roots =
      if (broadcastGroups) { val l = localized(rootsPlan); release(rFix); l }
      else rootsPlan
    docs.select(col(idCol))
      .join(if (broadcastGroups) broadcast(roots) else roots, Seq(idCol), "left")
      .withColumn("group_id", coalesce(col("group_id"), col(idCol)))
      .withColumn("keep", col(idCol) === col("group_id"))
  }
}
