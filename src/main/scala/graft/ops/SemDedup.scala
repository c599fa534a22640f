package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
  * cluster embeddings around k centroids, then compare ONLY within-cluster
  * pairs by exact cosine and drop every row that has a same-cluster neighbor
  * above `tau` with a smaller id (deterministic min-id survivor, the same
  * survivor rule as the engine's other dedup families).
  *
  * Relationship to the sibling paths:
  *  - [[Similarity.cosineNearDups]] blocks by sign-LSH bucket — recall tuned
  *    by nbits, pairs bounded by bucket collisions.
  *  - SemDeDup blocks by SEMANTIC cluster — pair count is Σ|cluster|², so k
  *    chosen ~n/target_cluster_size bounds the quadratic term, and the
  *    clusters themselves are a reusable curation artifact (topic counts,
  *    per-topic sampling). Cross-cluster near-dups are deliberately not
  *    compared: that is the paper's stated recall trade for linear-ish cost.
  *
  * Scale posture: assignment is map-side (k cosines per row against a
  * driver-held, broadcast-as-literals centroid model — [[Ivf.assignExpr]]);
  * the only shuffle is the within-cluster self-join keyed on the cluster id,
  * whose volume is bounded by cluster sizes, not n². The assigned frame is
  * persisted so the k-centroid scoring runs once, not once per join side.
  * At 100 TB: raise k so clusters stay O(10^4-10^5) rows; a runaway cluster
  * is visible in [[clusterSizes]] and can be sub-split (re-run with its
  * members as a new corpus) — same remedy the paper applies.
  */
object SemDedup {

  /** Survivors after semantic dedup: (idCol, cluster) — one row per kept
    * input row, tagged with its cluster. Dropped rows are exactly those with
    * a smaller-id same-cluster neighbor at `round(cosine, scoreDecimals) >=
    * tau`. Rounding before the threshold keeps the drop set engine-portable
    * (bit-identical in DuckDB over the same double arithmetic).
    */
  def dedup(df: DataFrame, idCol: String, vecCol: String, model: Ivf.Model,
            tau: Double, scoreDecimals: Int = 6,
            maxCluster: Int = Blocking.Auto): DataFrame =
    dedupManaged(df, idCol, vecCol, model, tau, scoreDecimals, maxCluster).df

  /** [[dedup]] with cache-lifecycle control over the persisted assignment.
    *
    * `maxCluster` is the engine-wide hot-block guard ([[Blocking]], keyed
    * on the raw vector — exact): identical-vector members of a runaway
    * cluster collapse onto their min-id representative before pairing.
    * The SURVIVOR SET is unchanged when engaged (star edges always carry
    * the group's min id, so every uncapped drop vote is still cast —
    * SemDedupSpec asserts equality on a pile); only the candidate volume
    * shrinks. Default [[Blocking.Auto]]: a healthy corpus runs the exact
    * uncapped plan; 0 = strictly uncapped.
    */
  def dedupManaged(df: DataFrame, idCol: String, vecCol: String,
                   model: Ivf.Model, tau: Double,
                   scoreDecimals: Int = 6,
                   maxCluster: Int = Blocking.Auto): Managed = {
    val assigned = Managed.ensurePersisted(Partitioning.spread(df)
      .select(col(idCol), col(vecCol).as("__v"))
      .withColumn("cluster", Ivf.assignExpr(col("__v"), model)),
      StorageLevel.MEMORY_AND_DISK)
    val eff =
      if (maxCluster < 0) Blocking.resolveAutoCap(assigned, Seq("cluster"))
      else maxCluster
    val pairs =
      if (eff == 0) {
        val a = assigned.select(col(idCol).as("id_a"), col("__v").as("__va"),
          col("cluster"))
        val b = assigned.select(col(idCol).as("id_b"), col("__v").as("__vb"),
          col("cluster"))
        a.join(b, "cluster").filter(col("id_a") < col("id_b"))
      } else
        Blocking.cappedCandidates(assigned, Seq("cluster"), idCol, "__v", eff)
          .join(assigned.select(col(idCol).as("id_a"), col("__v").as("__va")),
            "id_a")
          .join(assigned.select(col(idCol).as("id_b"), col("__v").as("__vb")),
            "id_b")
    val dups = pairs
      .withColumn("score",
        round(Similarity.cosine(col("__va"), col("__vb")), scoreDecimals))
      .filter(col("score") >= tau)
      .select(col("id_b").as(idCol))
    // Survivor selection without an anti-join: union a drop-tagged leg and
    // keep ids whose max tag is 0 — one hash shuffle on the id with partial
    // aggregation (duplicate drop votes collapse map-side), no sort, no
    // broadcast-size assumption on the dup set (which can be a large
    // fraction of a crawl corpus), and no distinct() pre-shuffle.
    val kept = assigned
      .select(col(idCol), col("cluster"), lit(0).as("__drop"))
      .unionByName(dups
        .select(col(idCol), lit(null).cast("int").as("cluster"),
          lit(1).as("__drop")))
      .groupBy(idCol)
      .agg(max("cluster").as("cluster"), max("__drop").as("__d"))
      .filter(col("__d") === 0)
      .select(col(idCol), col("cluster"))
    new Managed(kept, Seq(assigned))
  }

  /** Incremental semantic dedup of a NEW batch against an already-deduped
    * stored corpus (the [[graft.pipelines.CorpusStore]] posture — mirrors
    * [[TextDedup.minhashIncrement]]): a batch row is dropped when a
    * same-cluster neighbor at cosine >= tau exists EITHER in the stored
    * corpus (any id) or earlier in the batch (smaller id). Returns batch
    * survivors as (idCol, cluster).
    *
    * `storedAssigned` must carry (idCol, vecCol, clusterCol) produced by a
    * prior [[Ivf.assign]] under the SAME model — assignment is stored
    * column data, not recomputed per increment (the signature-store
    * lesson: recomputing per batch re-scores the whole corpus).
    *
    * Invariant (IncrementGuard-style, asserted in SemDedupSpec): when
    * stored ids precede batch ids, stored-survivors ∪ increment ==
    * [[dedup]] of the full corpus.
    */
  def dedupIncrement(batch: DataFrame, storedAssigned: DataFrame,
                     idCol: String, vecCol: String, model: Ivf.Model,
                     tau: Double, clusterCol: String = "cluster",
                     scoreDecimals: Int = 6): Managed = {
    val ba = Managed.ensurePersisted(Partitioning.spread(batch)
      .select(col(idCol), col(vecCol).as("__v"))
      .withColumn("cluster", Ivf.assignExpr(col("__v"), model)),
      StorageLevel.MEMORY_AND_DISK)
    val b = ba.select(col(idCol).as("id_b"), col("__v").as("__vb"),
      col("cluster"))
    val storedSide = storedAssigned
      .select(col(vecCol).as("__va"), col(clusterCol).as("cluster"))
    // stored neighbors: any same-cluster hit drops the batch row
    val vsStored = b.join(storedSide, "cluster")
      .withColumn("score",
        round(Similarity.cosine(col("__va"), col("__vb")), scoreDecimals))
      .filter(col("score") >= tau)
      .select(col("id_b").as(idCol))
    // within-batch: smaller-id neighbor drops the larger id
    val a = ba.select(col(idCol).as("id_a"), col("__v").as("__va"),
      col("cluster"))
    val within = a.join(b, "cluster").filter(col("id_a") < col("id_b"))
      .withColumn("score",
        round(Similarity.cosine(col("__va"), col("__vb")), scoreDecimals))
      .filter(col("score") >= tau)
      .select(col("id_b").as(idCol))
    val kept = ba
      .select(col(idCol), col("cluster"), lit(0).as("__drop"))
      .unionByName(vsStored.unionByName(within)
        .select(col(idCol), lit(null).cast("int").as("cluster"),
          lit(1).as("__drop")))
      .groupBy(idCol)
      .agg(max("cluster").as("cluster"), max("__drop").as("__d"))
      .filter(col("__d") === 0)
      .select(col(idCol), col("cluster"))
    new Managed(kept, Seq(ba))
  }

  /** Per-cluster membership counts — the "topic profile" of a corpus under
    * the model, and the skew probe for choosing k (a cluster far above
    * n/k is a sub-split candidate before running [[dedup]]).
    */
  def clusterSizes(df: DataFrame, idCol: String, vecCol: String,
                   model: Ivf.Model): DataFrame =
    Ivf.assign(df.select(col(idCol), col(vecCol).as("__v")), "__v", model,
        clusterCol = "cluster")
      .groupBy("cluster").agg(count(lit(1)).as("n"))
}
