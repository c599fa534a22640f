package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Decontaminate, DedupGroups, TextDedup}

/** The arriving-batch corpus workflow — what a training-data pipeline runs
  * when a new crawl/batch lands, composed from the incremental operators:
  *
  *   1. decontaminate the batch against the benchmark/eval set
  *      ([[Decontaminate.tag]] — contaminated docs never enter the corpus),
  *   2. near-dup the CLEAN batch against the stored corpus signatures and
  *      within itself ([[TextDedup.minhashIncrement]] — the corpus is
  *      never re-signed),
  *   3. fold the batch's new pairs into the maintained group labeling
  *      ([[DedupGroups.mergeLabels]] — only the groups TOUCHED by a new
  *      pair iterate, as a contraction graph of one node per group; the
  *      corpus labeling updates with one broadcast join, no recompute
  *      over the accumulated pair history).
  *
  * State between batches is three tables a real deployment keeps in
  * parquet: the prepared signature table (append-only), the verified
  * near-dup pairs (append-only, the durable source of truth the labeling
  * can always be rebuilt from via [[DedupGroups.resolveFromPairs]]), and
  * the group labeling (incrementally merged — new pairs can only merge
  * existing groups, never split them, so streaming group ids converge
  * without full recompute).
  *
  * CorpusPipelineSpec asserts the defining invariant: ingesting batches
  * one at a time yields exactly the labeling a full recompute over the
  * union produces.
  */
object CorpusPipeline {

  /** Corpus store between batches; `prepared` has columns
    * (idCol, __shingles, __sig), `pairs` has (id_a, id_b), `labels` has
    * (idCol, group_id) for every corpus doc, `buckets` has
    * (idCol, band, bucket) — the maintained LSH bucket table, appended per
    * batch so [[TextDedup.minhashIncrement]] never re-explodes the corpus
    * (per-batch cost O(|batch|×bands), not O(|corpus|×bands)).
    */
  final case class CorpusState(prepared: DataFrame, pairs: DataFrame,
                               labels: DataFrame, buckets: DataFrame)

  /** A store with no documents yet (long ids). */
  def emptyState(spark: SparkSession, idCol: String): CorpusState = {
    val prepared = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField(idCol, LongType),
        StructField("__shingles", ArrayType(StringType)),
        StructField("__sig", ArrayType(LongType)))))
    val pairs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    val labels = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField(idCol, LongType), StructField("group_id", LongType))))
    val buckets = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField(idCol, LongType),
        StructField("band", IntegerType, nullable = false),
        StructField("bucket", LongType, nullable = false))))
    CorpusState(prepared, pairs, labels, buckets)
  }

  /** `report` covers every BATCH doc: contamination verdict, and for clean
    * docs the resolved group (group_id/keep are null for contaminated docs
    * — they never entered the corpus).
    *
    * The three delta frames are THIS batch's append units for a durable
    * store ([[CorpusStore.appendBatch]]): the batch's prepared signature
    * rows, its bucket rows, and its verified new pairs — appending them
    * (plus the labels snapshot) commits the batch in O(|batch|) write
    * volume instead of rewriting the corpus. Checkpointed when
    * `checkpointState` is set, like the state.
    */
  /** `transients`: internal checkpointed frames the batch no longer needs
    * once the result is consumed — carried out so the streaming driver can
    * release their blocks (a localCheckpoint block lives outside the SQL
    * cache and otherwise survives until session teardown).
    */
  final case class BatchResult(state: CorpusState, report: DataFrame,
                               deltaPrepared: DataFrame,
                               deltaBuckets: DataFrame,
                               newPairs: DataFrame,
                               transients: Seq[DataFrame] = Nil)

  /** `checkpointState = true` materializes the next state's tables
    * (localCheckpoint) before returning — REQUIRED when `batch` is a
    * micro-batch frame (its source is only valid inside the foreachBatch
    * call; an un-materialized state would lazily re-read a dead source).
    * Each checkpoint rewrites the full prepared table, so the streaming
    * path pays O(corpus) per batch — a real deployment appends the delta
    * to a parquet corpus store instead and re-reads it, which this
    * in-memory shape stands in for.
    */
  def ingest(state: CorpusState, batch: DataFrame, idCol: String,
             textCol: String, benchmark: DataFrame, benchTextCol: String,
             shingleN: Int = 3, threshold: Double = 0.5,
             checkpointState: Boolean = false): BatchResult = {
    val tagged = Decontaminate.tag(batch.select(col(idCol), col(textCol)),
        idCol, textCol, benchmark, benchTextCol, n = shingleN)
      .localCheckpoint()
    val clean = tagged.filter(!col("contaminated")).select(col(idCol), col(textCol))

    val inc = TextDedup.minhashIncrement(clean, state.prepared, idCol, textCol,
      shingleN = shingleN, threshold = threshold,
      corpusBuckets = Some(state.buckets))
    val newPairs = inc.pairs.select(col("id_a"), col("id_b")).localCheckpoint()

    val allPairs = state.pairs.unionByName(newPairs)
    // Enroll the batch as singletons, then fold ONLY the new pairs into
    // the maintained labeling: the star rounds run over one node per
    // touched group — not over the accumulated pair history.
    val enrolled = state.labels.unionByName(
      clean.select(col(idCol), col(idCol).as("group_id")))
    val labels = DedupGroups.mergeLabels(enrolled, newPairs, idCol)
    val groups = labels.withColumn("keep", col(idCol) === col("group_id"))

    val report = tagged
      .select(col(idCol), col("n_contaminated"), col("contaminated"))
      .join(groups, Seq(idCol), "left")

    val nextPrepared = state.prepared.unionByName(
      inc.delta.select(col(idCol), col("__shingles"), col("__sig")))
    val nextBuckets = state.buckets.unionByName(inc.deltaBuckets)
    val deltaPrepared0 = inc.delta.select(col(idCol), col("__shingles"), col("__sig"))
    val (nextState, deltaPrepared, deltaBuckets) =
      if (checkpointState)
        (CorpusState(nextPrepared.localCheckpoint(), allPairs.localCheckpoint(),
          labels.localCheckpoint(), nextBuckets.localCheckpoint()),
          deltaPrepared0.localCheckpoint(), inc.deltaBuckets.localCheckpoint())
      else (CorpusState(nextPrepared, allPairs, labels, nextBuckets),
        deltaPrepared0, inc.deltaBuckets)
    // Per the MinhashIncrement contract: the delta cache is only needed while
    // pairs + nextState are built. Unpersist drops the cache, not the lineage,
    // so the non-checkpoint state stays valid (delta recomputes off the
    // checkpointed `tagged` if re-read); without this every ingest — and every
    // micro-batch in streamIngest — would leak one cached DataFrame.
    inc.release()
    // transients: `tagged` (the batch's checkpointed decontamination
    // frontier) and — only once the state has its OWN checkpoint — the
    // pre-checkpoint labels frame, whose lineage holds mergeLabels'
    // converged star-forest checkpoint blocks (otherwise released only
    // when the GC happens to collect them)
    BatchResult(nextState, report, deltaPrepared, deltaBuckets, newPairs,
      transients = Seq(tagged) ++ (if (checkpointState) Seq(labels) else Nil))
  }

  /** Drop the localCheckpoint blocks behind `dfs` (no-op for frames that
    * aren't checkpoint-backed). The frames must not be executed again.
    */
  private def releaseCp(dfs: DataFrame*): Unit =
    dfs.foreach(df =>
      graft.ops.Managed.checkpointRdds(df).foreach(_.unpersist(false)))

  /** Live handle of [[streamIngest]]: the current corpus state (updated
    * after every micro-batch) and the running query.
    */
  final class StreamingIngest(initial: CorpusState) {
    @volatile var state: CorpusState = initial
    @volatile private[CorpusPipeline] var queryRef:
      org.apache.spark.sql.streaming.StreamingQuery = _
    def query: org.apache.spark.sql.streaming.StreamingQuery = queryRef
  }

  /** Run the ingest workflow over an UNBOUNDED document stream: each
    * micro-batch is one [[ingest]] call (foreachBatch executes serially,
    * so the state fold is single-writer). `onBatch` receives each batch's
    * materialized report — route it to a sink there.
    *
    * Block lifecycle (round 11): after BOTH hooks return, the superseded
    * state generation's checkpoint blocks AND the batch's per-batch
    * frames (report, deltas, new pairs, internals) are released — without
    * this an unbounded stream accumulates one block set per micro-batch
    * until session teardown. Hooks must therefore MATERIALIZE (write/
    * collect) anything they keep; retaining the frames themselves across
    * batches is unsupported.
    */
  def streamIngest(stream: DataFrame, idCol: String, textCol: String,
                   benchmark: DataFrame, benchTextCol: String,
                   onBatch: (Long, DataFrame) => Unit = (_, _) => (),
                   shingleN: Int = 3, threshold: Double = 0.5,
                   onResult: (Long, BatchResult) => Unit = (_, _) => ()): StreamingIngest = {
    val handle = new StreamingIngest(emptyState(stream.sparkSession, idCol))
    handle.queryRef = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prev = handle.state
        val r = ingest(handle.state, batch, idCol, textCol,
          benchmark, benchTextCol, shingleN, threshold, checkpointState = true)
        val report = r.report.localCheckpoint() // materialize off the dead source
        handle.state = r.state
        onBatch(batchId, report)
        // full result (checkpointed deltas included) for store-commit hooks
        // ([[CorpusStore.appendBatch]])
        onResult(batchId, r)
        // the new state is checkpointed (lineage-free) and the hooks are
        // done: the old generation and this batch's frames are dead
        releaseCp(prev.prepared, prev.pairs, prev.labels, prev.buckets)
        releaseCp(r.transients: _*)
        releaseCp(report, r.deltaPrepared, r.deltaBuckets, r.newPairs)
      }
      .start()
    handle
  }
}
