package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextDedup

/** Streaming-native MinHash-LSH near-dup tagging: label each arriving
  * document with its near-duplicates in a STATIC corpus signature store, at
  * per-event latency.
  *
  * [[graft.pipelines.CorpusPipeline.streamIngest]] runs the full ingest
  * workflow (including stream↔stream pairs and group resolution) but only
  * per micro-batch, because its state fold needs foreachBatch. This path is
  * the complement: every operator here — signature, bucket array, the
  * stream-static bucket join, the verify Jaccard — is STATELESS, so the
  * query runs in append mode with no watermark, no state store, and no
  * batch barrier; latency is the per-record pipeline, not the trigger
  * interval. The trade: it tags against the fixed corpus only (stream↔
  * stream duplicates are the micro-batch path's job).
  *
  * Statelessness has one subtlety: a pair colliding in k bands would emit k
  * duplicate rows, and the usual `distinct` is a stateful aggregation. The
  * fix is per-row: both sides carry their FULL bucket array, and a row
  * survives only if its band is the first index where the two arrays agree
  * — a pure expression, so exactly one row per (stream doc, corpus doc)
  * pair emerges without any state.
  *
  * Scale posture: the corpus index is a static table re-read per micro-batch
  * (parquet store) or persisted; Spark plans the bucket join as
  * stream-static — broadcast while the index fits, shuffled otherwise. The
  * stream side explodes into `bands` rows per document (a constant factor,
  * same as batch LSH). At 100 TB corpus the index is big: partition the
  * store by bucket prefix so the join prunes, or run the batch incremental
  * path; this operator targets the low-latency tagging tier over a
  * broadcastable (sampled/recent) index slice.
  */
object LshStream {

  /** Build the static side once from a [[TextDedup.minhashPrepare]] table
    * (in-memory or re-read from the corpus store): id, shingles for the
    * verify stage, and the per-band bucket array. Persist or parquet the
    * result — it is the index the stream joins against.
    */
  def corpusIndex(prepared: DataFrame, idCol: String,
                  bands: Int = 16, rowsPerBand: Int = 4): DataFrame =
    prepared.select(col(idCol),
      col("__shingles"),
      TextDedup.bucketArray(col("__sig"), bands, rowsPerBand).as("__buckets"))

  /** First index (0-based) where the two bucket arrays agree — the
    * designated band that "owns" a colliding pair.
    */
  private def firstCollidingBand(a: Column, b: Column): Column =
    array_position(zip_with(a, b, (x, y) => x === y), true) - 1

  /** The corpus index in serving shape: the compact per-doc table plus its
    * per-(band, bucket) explosion, each persisted once. [[nearDupTagStream]]
    * accepts this instead of the raw index frame to stop the tagger from
    * re-exploding the whole corpus every micro-batch — on a 10^4-doc index
    * that explode is ~40% of single-event latency.
    */
  final case class ServedIndex(compact: DataFrame, exploded: DataFrame) {
    def persist(): ServedIndex = {
      compact.persist(); exploded.persist()
      // materialize BOTH caches: the frames scan the source independently
      // (exploded does not read through compact's cache), so counting only
      // exploded would leave compact to fill lazily on the first
      // micro-batch's verify join
      compact.count(); exploded.count()
      ServedIndex(compact, exploded)
    }
    def unpersist(): Unit = { exploded.unpersist(); compact.unpersist() }
  }

  /** Explode a [[corpusIndex]] frame into serving shape. Call `.persist()`
    * (or write both frames to the store) before handing it to the tagger.
    *
    * `partitions` > 0 coalesces both frames. Measured on a 10^4-doc index
    * on 32 cores, coalesce(4) was ~1.5× SLOWER per batch than the default
    * layout — each micro-batch hash-probes the whole exploded index, and
    * that scan wants parallelism more than it wants fewer tasks. The knob
    * exists for many-tiny-partition indexes (e.g. re-read from a store
    * written highly parallel), not as a latency tune.
    */
  def serve(corpusIndex: DataFrame, idCol: String,
            partitions: Int = 0): ServedIndex = {
    val sized =
      if (partitions > 0) corpusIndex.coalesce(partitions) else corpusIndex
    // a collapsed index ([[serveCollapsed]]) carries its multiplicity
    // column through to the compact table for consumers
    val compactCols = Seq(idCol, "__shingles") ++
      sized.columns.filter(_ == "__members")
    ServedIndex(
      compact = sized.select(compactCols.map(col): _*),
      exploded = sized
        .select(col(idCol).as("corpus_id"), col("__buckets").as("__bk_c"))
        .select(col("corpus_id"), col("__bk_c"),
          posexplode(col("__bk_c")).as(Seq("band", "bucket"))))
  }

  /** [[serve]] with exact-duplicate collapse — the latency tier's pile
    * defense: corpus docs sharing an IDENTICAL shingle set (hence an
    * identical signature and bucket array) are served once, as their
    * minimum-id representative carrying a `__members` multiplicity
    * column. An arriving near-dup of a 10⁶-copy boilerplate pile then
    * emits ONE tagged row (rep + the multiplicity via [[ServedIndex]]'s
    * compact table), not 10⁶ rows per event — per-event output becomes
    * O(distinct matching sets), which is what bounds tail latency when
    * the index holds a pile. Opt-in (the plain [[serve]] stays default)
    * because the reported pair set changes: pairs go to representatives
    * only. Verified scores are unchanged — identical sets verify
    * identically, so the rep's jaccard IS every member's jaccard.
    */
  def serveCollapsed(corpusIndex: DataFrame, idCol: String,
                     partitions: Int = 0): ServedIndex = {
    val collapsed = corpusIndex
      .groupBy(col("__shingles"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("__members"),
        first(col("__buckets")).as("__buckets"))
      .select(col(idCol), col("__shingles"), col("__buckets"), col("__members"))
    serve(collapsed, idCol, partitions)
  }

  /** Tag a document stream against the corpus index: one output row per
    * (arriving doc, corpus doc) with verified Jaccard >= threshold.
    * Works identically on a batch frame (all-expression plan) — the spec
    * asserts parity with [[TextDedup.minhashIncrement]]'s new↔corpus pairs.
    *
    * Output: (`idCol` as stream_id, corpus_id, jaccard). `bands *
    * rowsPerBand` must match the index's signature width; ids must be
    * disjoint from corpus ids only in the sense that self-pairs
    * (stream_id == corpus_id) are filtered, so re-tagging an already-stored
    * doc won't report itself.
    */
  def nearDupTagStream(stream: DataFrame, corpusIndex: DataFrame,
                       idCol: String, textCol: String,
                       shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                       threshold: Double = 0.6): DataFrame =
    nearDupTagStream(stream, serve(corpusIndex, idCol), idCol, textCol,
      shingleN, bands, rowsPerBand, threshold)

  /** As above, against a pre-exploded (and ideally persisted) [[ServedIndex]]
    * — the latency-tier deployment shape.
    */
  def nearDupTagStream(stream: DataFrame, index: ServedIndex,
                       idCol: String, textCol: String,
                       shingleN: Int, bands: Int, rowsPerBand: Int,
                       threshold: Double): DataFrame = {
    // The stream side keeps its shingle array through the explode: fetching
    // it back after pair resolution would be a stream-stream self-join,
    // which is stateful. A micro-batch is small, so (docs × bands) rows
    // carrying the array is fine THERE — but not on the corpus side (below).
    val s = stream
      .withColumn("__shingles", TextDedup.shingles(col(textCol), shingleN))
      .withColumn("__sig",
        TextDedup.minhashSignature(col("__shingles"), bands * rowsPerBand))
      .select(col(idCol).as("stream_id"),
        col("__shingles").as("__sh_s"),
        TextDedup.bucketArray(col("__sig"), bands, rowsPerBand).as("__bk_s"))
      // posexplode_OUTER: not for semantics (the bucket array is a
      // fixed-width `array(...)`, never null/empty) but to keep
      // InferFiltersFromGenerate from inferring a `size(...) > 0` filter
      // that duplicates the whole signature expression below the Generate —
      // measured 2× on the stream side, which has no persisted table to
      // absorb the recompute.
      .select(col("stream_id"), col("__sh_s"), col("__bk_s"),
        posexplode_outer(col("__bk_s")).as(Seq("band", "bucket")))
    // Corpus side ([[serve]]) carries LIGHT columns only — id and the
    // bands-int bucket array, NOT the shingle array: replicating every
    // document's shingle set ×bands would bloat the serving index (and the
    // join's probe rows) by the corpus size. Shingles are fetched from the
    // compact per-doc table only for resolved pairs (second stream-static
    // join below). Pre-exploded once in [[serve]] so a persisted index is
    // not re-exploded every micro-batch.
    val c = index.exploded
    // Broadcast the STREAM side: a micro-batch explodes to (docs × bands)
    // rows — small by construction — while the corpus index side can be
    // arbitrarily large. Broadcasting the stream side means the static side
    // is only scanned and hash-probed per batch, never shuffled and never
    // collected to the driver; per-event latency becomes the index scan,
    // not a per-batch broadcast build of the whole index. (Measured in
    // SCALE.md: 4× lower single-event latency on a 10^4-doc index.)
    val pairs = broadcast(s).join(c, Seq("band", "bucket"))
      .filter(col("stream_id") =!= col("corpus_id"))
      // stateless per-pair dedup: keep the first colliding band's row only
      .filter(col("band") === firstCollidingBand(col("__bk_s"), col("__bk_c")))
      .select("stream_id", "corpus_id", "__sh_s")
    verifyPairs(pairs, index, idCol, threshold)
  }

  /** Verify stage shared by the taggers: fetch corpus shingles for the
    * resolved pairs only — a stateless stream-static join, stream side
    * broadcast — and keep exact Jaccard >= threshold.
    */
  private def verifyPairs(pairs: DataFrame, index: ServedIndex,
                          idCol: String, threshold: Double): DataFrame =
    broadcast(pairs)
      .join(index.compact.select(col(idCol).as("corpus_id"),
        col("__shingles").as("__sh_c")), Seq("corpus_id"))
      .withColumn("jaccard", TextDedup.jaccard(col("__sh_s"), col("__sh_c")))
      .filter(col("jaccard") >= threshold)
      .select("stream_id", "corpus_id", "jaccard")

  /** [[nearDupTagStream]] with MULTI-PROBE banding on the query side
    * (round-18 verdict item 3): each band probes its exact bucket PLUS
    * `rowsPerBand` single-slot-substitution buckets built from the
    * second-smallest minhash values ([[TextDedup.probeBucketMatrix]]),
    * recovering the dominant single-slot banding-miss mode — measured on
    * the RecallReport fixture: the k14/k18 bands (J ≈ 0.57/0.49, where
    * pure 16×4 banding misses 17%/39% of true pairs) are where it pays.
    *
    * The corpus plan is UNCHANGED from single-probe — the same
    * [[ServedIndex]], same (band, bucket) hash probe; only the broadcast
    * stream side fans out `1 + rowsPerBand`× wider (a constant factor on
    * the micro-batch side, the [[graft.ops.Similarity.annTopKMultiProbe]]
    * posture). Output contract identical: one VERIFIED row per (stream
    * doc, corpus doc) pair with exact Jaccard >= threshold — multi-probe
    * can only ADD pairs (a superset of the plain tagger's, never false
    * positives: verification is exact), and the stateless per-pair dedup
    * generalizes from first-colliding-band to first-colliding-probe.
    */
  def nearDupTagStreamMultiProbe(stream: DataFrame, index: ServedIndex,
                                 idCol: String, textCol: String,
                                 shingleN: Int, bands: Int, rowsPerBand: Int,
                                 threshold: Double): DataFrame = {
    val nprobe = rowsPerBand + 1
    val s = stream
      .withColumn("__shingles", TextDedup.shingles(col(textCol), shingleN))
      .withColumn("__sig2",
        TextDedup.minhashSignature2(col("__shingles"), bands * rowsPerBand))
      .select(col(idCol).as("stream_id"),
        col("__shingles").as("__sh_s"),
        // flattened probe list, band-major: global index g = band*nprobe
        // + probe; carried whole for the per-pair first-colliding-probe
        // dedup (the plain tagger's __bk_s trick, one level wider)
        flatten(TextDedup.probeBucketMatrix(col("__sig2"), bands, rowsPerBand))
          .as("__fl_s"))
      // posexplode_OUTER for the same InferFiltersFromGenerate reason as
      // the plain tagger (the probe list is fixed-width, never null/empty)
      .select(col("stream_id"), col("__sh_s"), col("__fl_s"),
        posexplode_outer(col("__fl_s")).as(Seq("gpos", "bucket")))
      .withColumn("band", floor(col("gpos") / nprobe).cast("int"))
    // first global probe index where the query's probe list hits the
    // corpus doc's (band-repeated) bucket array — the row that "owns" a
    // colliding pair; pure expressions, no state
    val corpusRepeated = flatten(transform(col("__bk_c"),
      x => array_repeat(x, nprobe)))
    val firstCollidingProbe =
      array_position(zip_with(col("__fl_s"), corpusRepeated,
        (x, y) => x === y), true) - 1
    val pairs = broadcast(s).join(index.exploded, Seq("band", "bucket"))
      .filter(col("stream_id") =!= col("corpus_id"))
      .filter(col("gpos") === firstCollidingProbe)
      .select("stream_id", "corpus_id", "__sh_s")
    verifyPairs(pairs, index, idCol, threshold)
  }
}
