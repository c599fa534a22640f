package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.{LshStream, VecStream}

/** Durable parquet layout of a [[CorpusPipeline.CorpusState]] — the ONE
  * store both deployment tiers share:
  *
  *   - the INGEST tier ([[CorpusPipeline.ingest]] / `streamIngest`) folds
  *     arriving batches into the state and persists it here after each
  *     batch;
  *   - the LATENCY tier ([[LshStream.nearDupTagStream]] /
  *     [[VecStream.nearDupTagStream]]) builds its serving index from the
  *     SAME `prepared` table, so a document ingested by tier 1 is taggable
  *     by tier 2 as soon as the tier refreshes its index — no second
  *     signing pass, no divergent signature families (both tiers read the
  *     signatures computed once at ingest).
  *
  * UnifiedTiersSpec proves the loop end-to-end: MemoryStream →
  * `streamIngest` (writing here per batch) → `servedIndex` → tagger sees
  * the just-ingested doc.
  *
  * Layout: `<dir>/{prepared,pairs,labels,buckets}` parquet tables with
  * the exact [[CorpusPipeline.CorpusState]] columns. Writes are
  * whole-table overwrites — the parquet stand-in for the in-memory
  * `checkpointState` fold; a production deployment appends the per-batch
  * delta under a snapshot-isolated table format instead, which this
  * API deliberately mirrors in shape (read side is pure `spark.read`).
  */
object CorpusStore {

  /** Persist every state table under `dir` (overwrite). Tables are
    * materialized by the write itself, so the returned state can be
    * [[read]] back even if `state` held lazy micro-batch lineage.
    */
  def write(state: CorpusPipeline.CorpusState, dir: String): Unit = {
    state.prepared.write.mode("overwrite").parquet(s"$dir/prepared")
    state.pairs.write.mode("overwrite").parquet(s"$dir/pairs")
    state.labels.write.mode("overwrite").parquet(s"$dir/labels")
    state.buckets.write.mode("overwrite").parquet(s"$dir/buckets")
  }

  /** APPEND-ONLY batch commit — the deployment write path: each batch
    * lands as its own parquet files under `prepared/`, `buckets/`, and
    * `pairs/` (O(|batch|) write volume; the heavy tables are exactly the
    * append-only ones), while the labels SNAPSHOT — a (doc, group) pair
    * per corpus doc, the smallest table and the only one that mutates on
    * group merges — is overwritten. Pairs appended across batches are
    * duplicate-free by the [[graft.ops.TextDedup.minhashIncrement]]
    * contract (a pair is reported exactly when its newer member arrives).
    * Crash between the appends and the labels overwrite loses only the
    * labels, which [[graft.ops.DedupGroups.resolveFromPairs]] rebuilds
    * from the appended pairs. Run [[compact]] periodically to bound file
    * counts and GC folded pairs.
    */
  def appendBatch(r: CorpusPipeline.BatchResult, dir: String): Unit = {
    r.deltaPrepared.write.mode("append").parquet(s"$dir/prepared")
    r.deltaBuckets.write.mode("append").parquet(s"$dir/buckets")
    r.newPairs.write.mode("append").parquet(s"$dir/pairs")
    // materialize before the overwrite: when the ingest ran off a
    // store-READ state (the steady-state shape), the new labels' lineage
    // lazily scans the very directory being replaced
    r.state.labels.localCheckpoint().write.mode("overwrite").parquet(s"$dir/labels")
  }

  /** Periodic store maintenance after a run of [[appendBatch]] commits:
    * coalesce the per-batch file fragments of `prepared`/`buckets` down to
    * `targetFiles`, and GC the accumulated pair history to the SPANNING
    * STAR FOREST the labeling already encodes — one (group root, member)
    * edge per non-root doc. Components — the thing any rebuild
    * ([[graft.ops.DedupGroups.resolveFromPairs]]) consumes — are exactly
    * preserved (StoreAppendSpec asserts rebuild-equality), while pairs
    * shrink from the O(edges) history to O(grouped docs). Tables are
    * materialized (localCheckpoint) before their directories are
    * overwritten; as with every overwrite here, concurrent readers want a
    * snapshot-isolated table format in production — this layout is the
    * parquet stand-in.
    */
  def compact(spark: SparkSession, dir: String, idCol: String,
              targetFiles: Int = 8): Unit = {
    import org.apache.spark.sql.functions.{col, least, greatest}
    val s = read(spark, dir)
    val prepared = s.prepared.localCheckpoint()
    val buckets = s.buckets.localCheckpoint()
    val starPairs = s.labels.filter(col(idCol) =!= col("group_id"))
      .select(least(col("group_id"), col(idCol)).as("id_a"),
        greatest(col("group_id"), col(idCol)).as("id_b"))
      .localCheckpoint()
    prepared.coalesce(targetFiles).write.mode("overwrite").parquet(s"$dir/prepared")
    buckets.coalesce(targetFiles).write.mode("overwrite").parquet(s"$dir/buckets")
    starPairs.coalesce(targetFiles).write.mode("overwrite").parquet(s"$dir/pairs")
  }

  /** Re-open a stored state (lazy scans; hand to [[CorpusPipeline.ingest]]
    * as the corpus for the next batch).
    */
  def read(spark: SparkSession, dir: String): CorpusPipeline.CorpusState =
    CorpusPipeline.CorpusState(
      prepared = spark.read.parquet(s"$dir/prepared"),
      pairs = spark.read.parquet(s"$dir/pairs"),
      labels = spark.read.parquet(s"$dir/labels"),
      buckets = spark.read.parquet(s"$dir/buckets"))

  /** The latency tier's view: a [[LshStream.ServedIndex]] over the stored
    * `prepared` table, persisted and materialized (call `.unpersist()`
    * when refreshing to a newer store generation). `bands × rowsPerBand`
    * must equal the store's signature width (the ingest tier's
    * `numHashes`).
    */
  def servedIndex(spark: SparkSession, dir: String, idCol: String,
                  bands: Int = 16, rowsPerBand: Int = 4): LshStream.ServedIndex =
    LshStream.serve(
      LshStream.corpusIndex(spark.read.parquet(s"$dir/prepared"), idCol,
        bands, rowsPerBand),
      idCol).persist()

  /** Embedding-tier counterpart: persist a [[VecStream.corpusIndex]]
    * (id, vec, __bucket) under `<dir>/vecindex`, signed once at write
    * time with `planes` — the tagger and any batch reader share the one
    * signing pass. `collapse = true` stores the rep-collapsed form
    * ([[VecStream.corpusIndexCollapsed]] — one row per distinct vector
    * with `__members`), the pile-safe serving for the latency tier.
    */
  def writeVecIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    planes: Seq[Array[Double]], dir: String,
                    collapse: Boolean = false): Unit =
    (if (collapse) VecStream.corpusIndexCollapsed(corpus, idCol, vecCol, planes)
     else VecStream.corpusIndex(corpus, idCol, vecCol, planes))
      .write.mode("overwrite").parquet(s"$dir/vecindex")

  /** Re-open the stored embedding index for
    * [[VecStream.nearDupTagStream]] (persist if tagging many batches).
    */
  def readVecIndex(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/vecindex")

}
