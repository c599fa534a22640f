package graft.pipelines

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Blocking, TextDedup}
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
  *     by tier 2 as soon as the tier refreshes its index
  *     ([[refreshServedIndex]]) — no second signing pass, no divergent
  *     signature families (both tiers read the signatures computed once at
  *     ingest).
  *
  * UnifiedTiersSpec proves the loop end-to-end: MemoryStream →
  * `streamIngest` (writing here per batch) → `servedIndex` → tagger sees
  * the just-ingested doc.
  *
  * Layout: `<dir>/{prepared,pairs,buckets}` parquet tables plus
  * GENERATIONAL labels directories `<dir>/labels-<n>` with the exact
  * [[CorpusPipeline.CorpusState]] columns. The labels snapshot is the one
  * table that MUTATES on group merges, so it commits copy-on-write: each
  * commit writes a fresh `labels-<n+1>` and readers resolve the highest
  * generation whose `_SUCCESS` marker exists (Spark's output committer
  * creates it only after every part file is in place). A crash mid-write
  * leaves a marker-less torn directory that [[read]] skips — the previous
  * generation keeps serving — and the next successful commit garbage-
  * collects it. `prepared`/`buckets`/`pairs` under [[appendBatch]] are
  * pure appends (crash loses at most the in-flight batch's files, never
  * existing data); the whole-table overwrites in [[write]]/[[compact]]
  * remain non-atomic by design — production wants a snapshot-isolated
  * table format for those, which this API deliberately mirrors in shape
  * (read side is pure `spark.read`).
  *
  * Every mutator also drops the session's plan-keyed preflight memos
  * ([[Blocking.clearAutoCapMemo]] and the PPJoin collapse memo): a memo
  * entry resolved against the pre-mutation store would otherwise serve a
  * one-batch-stale cap to the next query over the same path (plan-shape
  * staleness only — results stay correct — but the guard's whole point is
  * reacting to what just got appended, e.g. a boilerplate pile).
  */
object CorpusStore {

  /** Persist every state table under `dir` (overwrite; labels go through
    * the generational commit so a concurrent [[read]] never scans a torn
    * snapshot). Tables are materialized by the write itself, so the
    * returned state can be [[read]] back even if `state` held lazy
    * micro-batch lineage.
    */
  def write(state: CorpusPipeline.CorpusState, dir: String): Unit = {
    state.prepared.write.mode("overwrite").parquet(s"$dir/prepared")
    state.pairs.write.mode("overwrite").parquet(s"$dir/pairs")
    state.buckets.write.mode("overwrite").parquet(s"$dir/buckets")
    commitLabels(state.labels, dir)
    clearPlanMemos()
  }

  /** APPEND-ONLY batch commit — the deployment write path: each batch
    * lands as its own parquet files under `prepared/`, `buckets/`, and
    * `pairs/` (O(|batch|) write volume; the heavy tables are exactly the
    * append-only ones), while the labels SNAPSHOT — a (doc, group) pair
    * per corpus doc, the smallest table and the only one that mutates on
    * group merges — commits as a new `labels-<n>` generation (crash-safe:
    * see object doc). Pairs appended across batches are duplicate-free by
    * the [[graft.ops.TextDedup.minhashIncrement]] contract (a pair is
    * reported exactly when its newer member arrives). Crash between the
    * appends and the labels commit loses only the labels delta, which
    * [[graft.ops.DedupGroups.resolveFromPairs]] rebuilds from the appended
    * pairs. Run [[compact]] periodically to bound file counts and GC
    * folded pairs.
    */
  def appendBatch(r: CorpusPipeline.BatchResult, dir: String): Unit = {
    r.deltaPrepared.write.mode("append").parquet(s"$dir/prepared")
    r.deltaBuckets.write.mode("append").parquet(s"$dir/buckets")
    r.newPairs.write.mode("append").parquet(s"$dir/pairs")
    // materialize before the generation flip: when the ingest ran off a
    // store-READ state (the steady-state shape), the new labels' lineage
    // lazily scans the generation being superseded
    commitLabels(r.state.labels.localCheckpoint(), dir)
    clearPlanMemos()
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
    clearPlanMemos()
  }

  /** Re-open a stored state (lazy scans; hand to [[CorpusPipeline.ingest]]
    * as the corpus for the next batch). Labels resolve to the newest
    * COMMITTED generation — a torn directory from a crashed writer is
    * never scanned.
    */
  def read(spark: SparkSession, dir: String): CorpusPipeline.CorpusState =
    CorpusPipeline.CorpusState(
      prepared = spark.read.parquet(s"$dir/prepared"),
      pairs = spark.read.parquet(s"$dir/pairs"),
      labels = spark.read.parquet(labelsPath(spark, dir)),
      buckets = spark.read.parquet(s"$dir/buckets"))

  /** The latency tier's view: a [[LshStream.ServedIndex]] over the stored
    * `prepared` table, persisted and materialized (prefer
    * [[refreshServedIndex]] for the steady-state swap; call `.unpersist()`
    * when retiring one by hand). `bands × rowsPerBand` must equal the
    * store's signature width (the ingest tier's `numHashes`). `collapse =
    * true` serves the pile-safe rep-collapsed form
    * ([[LshStream.serveCollapsed]]).
    */
  def servedIndex(spark: SparkSession, dir: String, idCol: String,
                  bands: Int = 16, rowsPerBand: Int = 4,
                  collapse: Boolean = false): LshStream.ServedIndex = {
    val idx = LshStream.corpusIndex(spark.read.parquet(s"$dir/prepared"),
      idCol, bands, rowsPerBand)
    (if (collapse) LshStream.serveCollapsed(idx, idCol)
     else LshStream.serve(idx, idCol)).persist()
  }

  /** Steady-state index swap for the latency tier — one call per store
    * commit (or per refresh interval): release `previous`, then build and
    * MATERIALIZE the index over the store's current state. Ordering
    * matters and is the point of the helper: Spark's CacheManager keys
    * cache entries by canonicalized PLAN, and two reads of the same store
    * path canonicalize equal (file listings are not part of relation
    * equality) — so persisting the new index while the old one is still
    * cached silently ALIASES the old snapshot's cache ("Asked to cache
    * already cached data", and the refresh becomes a no-op serving stale
    * data), after which unpersisting the old handle would evict the new
    * index's cache out from under the tagger. Releasing first costs a
    * brief cold window (the swap call itself re-materializes before
    * returning), which is the correct trade against serving a stale
    * snapshot forever. StoreDurabilitySpec drives ingest → refresh → tag
    * on the round trip; UnifiedDemo uses it between the tiers.
    */
  def refreshServedIndex(spark: SparkSession, dir: String, idCol: String,
                         previous: Option[LshStream.ServedIndex],
                         bands: Int = 16, rowsPerBand: Int = 4,
                         collapse: Boolean = false): LshStream.ServedIndex = {
    previous.foreach(_.unpersist())
    servedIndex(spark, dir, idCol, bands, rowsPerBand, collapse)
  }

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

  // ---- generational labels commit ----------------------------------------

  private val LabelGenRe = "^labels-([0-9]+)$".r

  /** Resolve the labels directory [[read]] should scan: the highest
    * `labels-<n>` carrying a `_SUCCESS` commit marker; falls back to the
    * legacy flat `labels/` directory (pre-round-9 stores) when no
    * generation has committed yet. Exposed for tests and store tooling.
    */
  def labelsPath(spark: SparkSession, dir: String): String =
    labelGens(spark, dir)
      .filter(_._3)
      .sortBy(_._1).lastOption
      .map(_._2.toString)
      .getOrElse(s"$dir/labels")

  /** (generation, path, committed?) for every `labels-<n>` directory under
    * `dir`, committed meaning the Spark output committer's `_SUCCESS`
    * marker exists (created atomically, after every part file is in
    * place — the property the crash-safety argument rests on).
    */
  private def labelGens(spark: SparkSession, dir: String): Seq[(Long, Path, Boolean)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case LabelGenRe(n) if st.isDirectory =>
          Some((n.toLong, st.getPath,
            fs.exists(new Path(st.getPath, "_SUCCESS"))))
        case _ => None
      }
    }
  }

  /** Copy-on-write labels commit: write generation max+1 (counting torn,
    * uncommitted directories too, so a crashed writer's generation number
    * is never reused), then best-effort GC every older generation and the
    * legacy flat `labels/` dir. Deletion AFTER the new marker exists keeps
    * the crash window clean: die during the write and the old generation
    * still resolves; die during GC and [[labelsPath]] still picks the new
    * maximum — the leftovers go on the next commit's GC.
    */
  private def commitLabels(labels: DataFrame, dir: String): Unit = {
    val spark = labels.sparkSession
    val gens = labelGens(spark, dir)
    val next = gens.map(_._1).maxOption.getOrElse(0L) + 1
    labels.write.mode("overwrite").parquet(s"$dir/labels-$next")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    gens.foreach { case (_, p, _) =>
      try fs.delete(p, true)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    try fs.delete(new Path(root, "labels"), true)
    catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Drop the session's plan-keyed guard memos after a store mutation —
    * see object doc. Cheap (two map clears), so every mutator calls it
    * unconditionally rather than tracking which paths were resolved.
    */
  private def clearPlanMemos(): Unit = {
    Blocking.clearAutoCapMemo()
    TextDedup.clearDupHeavyMemo()
  }
}
