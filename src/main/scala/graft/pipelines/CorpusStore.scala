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
    * signing pass.
    */
  def writeVecIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    planes: Seq[Array[Double]], dir: String): Unit =
    VecStream.corpusIndex(corpus, idCol, vecCol, planes)
      .write.mode("overwrite").parquet(s"$dir/vecindex")

  /** Re-open the stored embedding index for
    * [[VecStream.nearDupTagStream]] (persist if tagging many batches).
    */
  def readVecIndex(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/vecindex")

}
