package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.ops._




/** The Misc tier of the extension-query registry —
  * split from the monolithic Qext.scala (round-17 verdict item 7, pure
  * mechanical move: bodies unchanged). [[Qext]] composes the tiers; see
  * its scaladoc for the registry/oracle policy.
  */
private[queries] trait QextMiscTier { this: QextBase =>


  /** Per-source document cap ([[Curation.capPerGroup]]): keep the 10
    * longest documents per source (ties broken by doc_id — the explicit
    * deterministic order the op requires). Plans as WindowGroupLimit:
    * partitions pre-prune to their local top-10 per source before the
    * shuffle.
    */
  def qExtCapPerSource(spark: SparkSession, dir: String): DataFrame =
    Curation.capPerGroup(
        t(spark, dir, "documents").select("doc_id", "source", "n_chars"),
        "source", Seq(col("n_chars").desc, col("doc_id").asc), n = 10)
      .orderBy("source", "rk")


  /** Lang × source pivot counts ([[Curation.pivotCounts]]): the corpus
    * composition matrix, fixed schema (the five generator langs), absent
    * cells 0.
    */
  def qExtPivotLangCounts(spark: SparkSession, dir: String): DataFrame =
    Curation.pivotCounts(t(spark, dir, "documents"),
        rowCol = "source", pivotCol = "lang",
        values = Seq("en", "zh", "es", "de", "fr"))
      .orderBy("source")


  /** Unpivot (melt) of the lang × source count matrix back to long form —
    * the wide→long reshape (Spark `unpivot`, DuckDB `UNPIVOT`), zero rows
    * dropped: zero-count cells survive as explicit zeros, which is what
    * makes melt the audit-friendly inverse of pivot.
    */
  def qExtUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val langs = Seq("en", "zh", "es", "de", "fr")
    Curation.pivotCounts(t(spark, dir, "documents"),
        rowCol = "source", pivotCol = "lang", values = langs)
      .unpivot(Array(col("source")), langs.map(col).toArray, "lang", "n")
      .orderBy("source", "lang")
  }


  /** Per-language length quartiles ([[Curation.ntileTiers]]): tier 1 = the
    * longest quarter of each language's documents — the curriculum-
    * selection bucketing shape, partitioned so no global single-task
    * window exists.
    */
  def qExtNtileTiers(spark: SparkSession, dir: String): DataFrame =
    Curation.ntileTiers(
        t(spark, dir, "documents").select("doc_id", "lang", "n_chars"),
        "lang", Seq(col("n_chars").desc, col("doc_id").asc), tiles = 4)
      .orderBy("doc_id")


  /** Per-language length quartile values ([[Profiler.groupedQuantiles]]):
    * exact per-stratum quantiles via the built-in percentile aggregate —
    * right here (per-group reducers, many groups) where the whole-column
    * profile deliberately avoids it (see Profiler scaladoc). Interpolation
    * at quarter probabilities over integer lengths is FP-exact in both
    * engines, so the hash compare holds without rounding.
    */
  def qExtQuantilesByLang(spark: SparkSession, dir: String): DataFrame =
    Profiler.groupedQuantiles(
        t(spark, dir, "documents"), "lang", "n_chars")
      .orderBy("lang")


  /** Token-budget mixture selection ([[Curation.tokenBudgetPerGroup]]):
    * longest-first per source until a 2000-char budget (5000 for src1 —
    * exercising the per-group override), boundary doc included.
    */
  def qExtBudgetPerSource(spark: SparkSession, dir: String): DataFrame =
    Curation.tokenBudgetPerGroup(
        t(spark, dir, "documents").select("doc_id", "source", "n_chars"),
        groupCol = "source", tokenCol = "n_chars",
        orderBy = Seq(col("n_chars").desc, col("doc_id").asc),
        budgetByGroup = Map("src1" -> 5000L), defaultBudget = 2000L)
      .orderBy("doc_id")


  /** Per-stratum systematic weighted sample
    * ([[Sampling.systematicWeightedPerGroup]]): an independent ~20-draw
    * stride walk per language, proportional to n_chars — the per-group
    * quota realization. Exact integer arithmetic per group; HUGEINT
    * oracle.
    */
  def qExtSampleWeightedGrouped(spark: SparkSession, dir: String): DataFrame =
    Sampling.systematicWeightedPerGroup(t(spark, dir, "documents"),
        "lang", "doc_id", "n_chars", kByGroup = Map.empty, defaultK = 20L)
      .orderBy("doc_id")


  /** Mixture weights at temperature α = 1/2
    * ([[Curation.sqrtTemperatureWeights]]): per-language sampling rates
    * p ∝ √n with the exact-decimal normalizer — sqrt is correctly
    * rounded by IEEE, so the whole computation has an exact oracle.
    */
  def qExtMixtureWeights(spark: SparkSession, dir: String): DataFrame =
    Curation.sqrtTemperatureWeights(t(spark, dir, "documents"), "lang")
      .orderBy("lang")


  /** Mixture REALIZATION: the composition that turns
    * [[Curation.sqrtTemperatureWeights]] rates into an admitted corpus —
    * per-lang char budgets = floor(rate × 20000) derived relationally,
    * broadcast onto the docs, then boundary-inclusive budget admission
    * ([[Curation.tokenBudgetFromColumn]]) in doc_id order. End-to-end
    * deterministic and oracle-exact (integer cumsums, IEEE sqrt).
    */
  def qExtMixtureRealize(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val budgets = Curation.sqrtTemperatureWeights(docs, "lang")
      .select(col("lang"), floor(col("rate") * 20000).cast("long").as("budget"))
    Curation.tokenBudgetFromColumn(
        docs.join(broadcast(budgets), "lang"),
        "lang", "n_chars", Seq(col("doc_id")), col("budget"))
      .select("doc_id", "lang", "n_chars", "budget")
      .orderBy("doc_id")
  }


  /** Systematic weighted sample ([[Sampling.systematicWeighted]]): ~100
    * draws proportional to n_chars, exact integer prefix-sum walk — the
    * sample is a pure function of the data (partitioning-independent),
    * and 128-bit products make the DuckDB HUGEINT oracle exact.
    */
  def qExtSampleWeighted(spark: SparkSession, dir: String): DataFrame =
    Sampling.systematicWeighted(t(spark, dir, "documents"), "doc_id",
        "n_chars", k = 100)
      .orderBy("doc_id")


  /** Heavy-hitter tokens via the Misra-Gries aggregate
    * ([[Sketches.tokenHeavyHitters]]): capacity 64 over a 31-token
    * synthetic vocabulary — the exact regime, so counts equal true
    * frequencies and the groupBy-count SQL is a true oracle. The lossy
    * regime's lower-bound guarantees are covered by SketchSpec.
    */
  def qExtHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    Sketches.tokenHeavyHitters(t(spark, dir, "documents"), "text",
        capacity = 64, topN = 20)
      .orderBy(col("cnt").desc, col("token").asc)


  // --------------------------------------------------------------- skew

  /** Two-phase salted aggregation over a deliberately skewed key
    * (l_returnflag: 3 values over 600k rows at sf0.1). Result is exactly
    * groupBy().count() — the salting is invisible in the output, so the
    * plain-SQL oracle checks it.
    */
  def qExtSkewSaltedCount(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedCount(t(spark, dir, "lineitem"), "l_returnflag",
        saltSource = col("l_orderkey"), salts = 32)
      .orderBy("l_returnflag")


  /** Deterministic train/val/test split ([[Sampling.trainValTestSplit]],
    * 10% test / 10% val by md5 bucket of doc_id): membership is a pure
    * function of the key, so the assignment — not just the counts — is
    * oracle-checked, and a re-run or re-ingestion reproduces it exactly.
    */
  def qExtTrainTestSplit(spark: SparkSession, dir: String): DataFrame =
    Sampling.trainValTestSplit(
        t(spark, dir, "documents").select("doc_id"), "doc_id",
        testPct = 10, valPct = 10, salt = "corpus_v1")
      .orderBy("doc_id")


  /** Sequence packing ([[Packing.packOffsets]]): documents → 512-token
    * training sequences, packed per language (the per-shard window real
    * pipelines use) in doc_id order. Integer window sums — exact oracle.
    */
  def qExtPackSequences(spark: SparkSession, dir: String): DataFrame =
    Packing.packOffsets(t(spark, dir, "documents"),
        tokens = TextStats.wsTokenCount(col("text")), budget = 512,
        partitionBy = Seq(col("lang")), orderBy = Seq(col("doc_id")))
      .select("doc_id", "lang", "n_tokens", "seq_id", "seq_offset")
      .orderBy("doc_id")


  /** Stratified deterministic sampling
    * ([[Sampling.stratifiedHashSample]]): per-language keep quotas (en
    * 30%, de 100%, others 50%) by md5 bucket — membership is a pure
    * function of (key, stratum), oracle-checked row by row.
    */
  def qExtSampleStratified(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedHashSample(t(spark, dir, "documents"),
        "doc_id", "lang", Map("en" -> 30, "de" -> 100), defaultPct = 50,
        salt = "strat_v1")
      .select("doc_id", "lang")
      .orderBy("doc_id")


  // --------------------------------------------------------- multimodal

  /** Multimodal plumbing over synthetic media (documents text as fake binary
    * payloads): partition-wise stub decode → 16-dim byte-histogram features
    * → per-doc dominant-bin summary. The stub histogram bins by high nibble,
    * which DuckDB reproduces by counting hex digits of the payload — exact
    * oracle despite the mapPartitions decode. Covered by MultimodalSpec too.
    */
  def qExtMultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .withColumn("text", coalesce(col("text"), lit("")))
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text", kind = "image")
    val feats = Multimodal.byteHistogramFeatures(media, dims = 16).toDF()
    val meta = media.toDF()
      .select(col("media_id"), octet_length(col("content")).as("n_bytes"))
    // Integer-exact projections of the float feature vector: the dominant
    // histogram bin and its byte count (share * n_bytes rounds back to the
    // exact integer count — float32 error is << 0.5 for corpus-sized docs),
    // so the result is reproducible bit-for-bit by the DuckDB oracle.
    val pos = array_position(col("features"), array_max(col("features")))
    feats.join(meta, "media_id")
      .select(col("media_id"), col("kind"), col("n_bytes"),
        (pos - 1).as("top_bin"),
        round(element_at(col("features"), pos.cast("int")).cast("double")
          * col("n_bytes")).cast("long").as("top_count"))
      .orderBy("media_id")
  }


  /** REAL container decode ([[Multimodal.decodeMeta]] / [[MediaCodec]]):
    * genuine PNG/JPEG/WAV payloads are produced by the JDK's OWN encoders
    * (ImageIO, sampled-audio — independent of the parsers) from
    * id-deterministic parameters, then decoded back by walking the actual
    * container structures — PNG IHDR with CRC32 verification, JPEG SOF
    * marker walk, WAV RIFF chunk walk — with the format SNIFFED from magic
    * bytes, not trusted metadata. The oracle states the expected fields
    * purely from the generating arithmetic (ground truth independent of
    * both encoder and parser); a parser that misread any real header field
    * hash-mismatches. id % 5 sampling keeps the encode cost
    * scale-proportional.
    */
  def qExtMultimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = t(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").cast("long")).as[Long]
    // nullable numerics emit as strings on BOTH sides: a pandas int64
    // column with nulls becomes float64 ("8000.0") nondeterministically
    // per reader, and the driver hashes stringified values
    val d = Multimodal.decodeMeta(Multimodal.synthesizeContainers(ids)).toDF()
    val nullable = Seq("width", "height", "channels", "bit_depth",
      "sample_rate_hz", "duration_micros")
    d.select(col("media_id") +: col("kind") +:
        nullable.map(c => col(c).cast("string").as(c)): _*)
      .orderBy("media_id")
  }


  /** REAL pixel-level decode ([[MediaCodec.decodePng]]: IDAT inflate +
    * filter reconstruction) over RGB PNG containers: exact-integer pixel
    * stats per image. Ids ≡ 4 (mod 8) are exactly the TRUECOLOR PNGs of
    * [[Multimodal.synthesizeContainers]] (m==0 selects PNG, odd id/4
    * selects RGB) — chosen because TYPE_INT_RGB `setRGB` stores samples
    * verbatim (probed; TYPE_BYTE_GRAY applies an sRGB→linear transform the
    * oracle could not reproduce). The oracle recomputes EVERY pixel from
    * the generating arithmetic v = (id + 31x + 17y) mod 256 over the w×h
    * grid — independent of the JDK encoder that wrote the scanlines AND of
    * this repo's inflate/unfilter walk that reads them back.
    */
  def qExtMultimodalPixels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = t(spark, dir, "documents")
      .filter(col("doc_id") % 8 === 4)
      .select(col("doc_id").cast("long")).as[Long]
    Multimodal.pixelStats(Multimodal.synthesizeContainers(ids)).toDF()
      .select("media_id", "width", "height", "n_pixels", "n_samples",
        "px_sum", "px_min", "px_max")
      .orderBy("media_id")
  }


  /** REAL pixel-level resize ([[Multimodal.resizePng]]: scanline decode →
    * nearest-neighbor sample → JDK re-encode) verified END-TO-END: the
    * resized payloads are REAL PNGs decoded again by [[Multimodal
    * .pixelStats]], and the oracle recomputes every resized pixel from the
    * composed arithmetic v = (id + 31·(x·w div 8) + 17·(y·h div 8)) mod 256
    * — independent of the JDK writer on both encode legs and of the
    * decoder on both decode legs.
    */
  def qExtMultimodalResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = t(spark, dir, "documents")
      .filter(col("doc_id") % 8 === 4)
      .select(col("doc_id").cast("long")).as[Long]
    val resized = Multimodal.resizePng(
      Multimodal.synthesizeContainers(ids), outW = 8, outH = 8)
    Multimodal.pixelStats(resized).toDF()
      .select("media_id", "width", "height", "n_samples",
        "px_sum", "px_min", "px_max")
      .orderBy("media_id")
  }


  /** REAL GIF LZW decode ([[MediaCodec.decodeGif]]: block walk → LZW over
    * the data sub-blocks → palette indices) with exact-integer index stats.
    * Ids ≡ 3 (mod 4) are the GIF containers; the oracle recomputes every
    * INDEX from the generating arithmetic v = (id + x + 31y) mod 4 —
    * independent of the JDK GIF writer that compressed the stream and of
    * this LZW walk that expands it back.
    */
  def qExtMultimodalGif(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = t(spark, dir, "documents")
      .filter(col("doc_id") % 4 === 3)
      .select(col("doc_id").cast("long")).as[Long]
    Multimodal.gifIndexStats(Multimodal.synthesizeContainers(ids)).toDF()
      .select("media_id", "width", "height", "n_pixels",
        "px_sum", "px_min", "px_max")
      .orderBy("media_id")
  }


  /** REAL frame sampling over ANIMATED GIFs ([[MediaCodec.decodeGifFrames]]
    * + [[Multimodal.sampleGifFrames]], every 2nd frame): each sampled
    * frame's exact-integer index stats. Payloads are genuine JDK
    * sequence-writer animations; the oracle replays the per-frame
    * arithmetic v = (id + x + 31y + 7f) mod 4 — frame sampling is no
    * longer a metadata plan, it decodes real frames.
    */
  def qExtMultimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = t(spark, dir, "documents")
      .filter(col("doc_id") % 8 === 6)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, n) = ((id % 13 + 1).toInt, (id % 11 + 1).toInt,
            (id % 9 + 2).toInt)
          Multimodal.MediaRow(id, Multimodal.MediaMeta("image/gif", w, h, n, 0),
            Multimodal.encodeGifAnimated(w, h, n, seed = id))
        }
      }
    Multimodal.sampleGifFrames(media, step = 2)
      .orderBy("media_id", "frame_idx")
  }


  /** Animated-GIF DELTA-frame composition end-to-end
    * ([[Multimodal.encodeGifDelta]] → [[graft.ops.MediaCodec.decodeGifFrames]]):
    * real JDK-metadata-written animations whose frames are offset
    * sub-rects — frame 1 additionally carries a transparent index, so
    * composition must let the prior canvas show through — decoded,
    * composed per GIF89a §23, and reduced to exact per-frame index stats.
    * The oracle replays the composition arithmetic over the full pixel
    * grid in SQL: c0 = full-screen pattern; c1 = rect-1 pattern where
    * opaque, else c0; c2 = rect-2 pattern in-rect, else c1.
    */
  def qExtMultimodalFramesDelta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = t(spark, dir, "documents")
      .filter(col("doc_id") % 8 === 1)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (id % 10 + 4).toInt
          val h = (id % 7 + 4).toInt
          val frames = Seq(
            Multimodal.GifDeltaFrame(0, 0, w, h),
            Multimodal.GifDeltaFrame(1, 1, w - 2, h - 2, transparentIdx = 2),
            Multimodal.GifDeltaFrame(2, 1, w - 3, h - 3))
          Multimodal.MediaRow(id, Multimodal.MediaMeta("image/gif", w, h, 3, 0),
            Multimodal.encodeGifDelta(frames, seed = id))
        }
      }
    Multimodal.sampleGifFrames(media, step = 1)
      .orderBy("media_id", "frame_idx")
  }


  /** REAL baseline-JPEG pixel decode ([[graft.ops.MediaCodec.decodeJpeg]]:
    * marker walk → Annex-F Huffman → dequant → fixed-point IDCT → level
    * shift → replication upsample → CCIR 601 YCbCr→RGB) with
    * exact-integer pixel stats. The payloads are DC-ONLY fixtures
    * ([[Multimodal.synthesizeJpegDc]]): with identity quantization and
    * F(0,0)=8k per block, EVERY compliant IDCT reconstructs the exact
    * flat value 128+k — the one arithmetic door into oracle-exact
    * verification of a LOSSY codec. Layouts cycle gray / 4:4:4 / 4:2:0
    * by id, so the entropy decode, the chroma upsampling, and the color
    * conversion all sit on the oracle path. The oracle recomputes EVERY
    * block's (r,g,b) from the generating arithmetic — independent of
    * both the hand-rolled encoder and this decoder (JpegCodecSpec
    * additionally cross-checks the same fixtures against the JDK's
    * reader, and locks bit-exact gray parity on real lossy streams).
    */
  def qExtMultimodalJpeg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = t(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 2)
      .select(col("doc_id").cast("long")).as[Long]
    Multimodal.pixelStats(Multimodal.synthesizeJpegDc(ids)).toDF()
      .select("media_id", "width", "height", "channels", "n_pixels",
        "n_samples", "px_sum", "px_min", "px_max")
      .orderBy("media_id")
  }


  /** REAL video decode (round 16 — the last media seam): a full AVI
    * container walk ([[graft.ops.MediaCodec.decodeAviFrames]]: RIFF →
    * hdrl/strl headers → movi frame chunks) with every MJPEG frame
    * decoded through the round-15 JPEG pipeline, then exact-integer
    * per-frame stats ([[Multimodal.sampleAviFrames]]). Fixtures are
    * DC-only MJPEG frames seeded `id + frame`
    * ([[Multimodal.synthesizeAviMjpeg]]), so the oracle recomputes every
    * frame's pixels from the generating arithmetic — independent of the
    * container writer, the container walker, AND the frame decoder.
    * Layouts alternate gray / 4:4:4 by id: both the single-channel and
    * the color conversion paths sit on the oracle.
    */
  def qExtMultimodalVideo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = t(spark, dir, "documents")
      .filter(col("doc_id") % 6 === 5)
      .select(col("doc_id").cast("long")).as[Long]
    Multimodal.sampleAviFrames(Multimodal.synthesizeAviMjpeg(ids), step = 1)
      .orderBy("media_id", "frame_idx")
  }


  /** Column-level profile of `orders` ([[Profiler.profile]], exact
    * distincts): null/distinct counts and min/max per column — the intake
    * audit generalizing the reference's inline checks. dtype is projected
    * out (Spark type names have no DuckDB equivalent); min/max strings
    * compare exactly (dates and sub-1e7 doubles render identically).
    */
  def qExtProfile(spark: SparkSession, dir: String): DataFrame =
    Profiler.profile(t(spark, dir, "orders"), exactDistinct = true)
      .select("column", "n_rows", "n_nulls", "n_distinct", "min", "max")
      .orderBy("column")


  /** Per-column exact quantiles ([[Profiler.quantiles]] exact mode) over
    * lineitem's value columns. Exact `percentile` (linear interpolation on
    * the sorted column) matches DuckDB `quantile_cont` on the same doubles;
    * round(6) absorbs nothing here — both engines interpolate the same two
    * IEEE doubles — but keeps the output format stable.
    */
  def qExtProfileQuantiles(spark: SparkSession, dir: String): DataFrame =
    Profiler.quantiles(t(spark, dir, "lineitem"),
        cols = Seq("l_quantity", "l_extendedprice", "l_discount"),
        probs = Seq(0.25, 0.5, 0.75), exact = true)
      .select(col("column"), round(col("p25"), 6).as("p25"),
        round(col("p50"), 6).as("p50"), round(col("p75"), 6).as("p75"))
      .orderBy("column")


  /** Blocklist curation ([[LookupJoin.antiJoin]]): drop every document
    * whose normalized content hash matches a document from the blocked
    * source — removes the blocked docs AND their exact duplicates
    * elsewhere (the takedown semantics a content blocklist needs).
    */
  def qExtFilterBlocklist(spark: SparkSession, dir: String): DataFrame = {
    // coalesce('') makes the join key NON-NULLABLE so the anti-join infers
    // no isnotnull(md5(...)) constraint filter that would recompute the
    // hash per row (the round-7 IVF lesson, flagged by Explain
    // genfilters). Null text never occurs in the corpus; if it did, ''
    // groups null-text docs under one sentinel hash in BOTH engines (the
    // oracle applies the same coalesce).
    val docs = t(spark, dir, "documents")
      .withColumn("content_hash",
        coalesce(TextDedup.contentHash(col("text")), lit("")))
    val blocked = docs.filter(col("lang") === "und").select("content_hash")
    LookupJoin.antiJoin(docs, blocked, Seq("content_hash"))
      .select("doc_id", "content_hash")
      .orderBy("doc_id")
  }


  /** Deterministic corpus shuffle ([[Sampling.deterministicShuffle]]):
    * epoch-0 training order as a pure function of the data. The global
    * ORDER BY here re-asserts the same (shuffle_key, doc_id) order the
    * operator's range partitioning produces — the oracle checks the order
    * is the md5 one, not Spark's partition layout.
    */
  def qExtShuffleOrder(spark: SparkSession, dir: String): DataFrame =
    Sampling.deterministicShuffle(
        t(spark, dir, "documents").select("doc_id", "source"),
        keyCol = "doc_id", salt = "epoch0")
      .select(col("doc_id"), col("source"), col("__shuffle_key").as("shuffle_key"))
      .orderBy("shuffle_key", "doc_id")


  /** Rollup aggregation: event counts by (type, user-bucket) with
    * subtotals and a grand total — the multi-granularity intake-report
    * shape. `grouping(...)` markers disambiguate "NULL because subtotal"
    * from a genuinely null grouping value, and make the ORDER BY total.
    */
  def qExtAggRollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("user_bucket", (col("user_id") % 10).cast("int"))
      .rollup("event_type", "user_bucket")
      .agg(count(lit(1)).as("n"),
        grouping(col("event_type")).as("g_type"),
        grouping(col("user_bucket")).as("g_bucket"))
      .select("event_type", "user_bucket", "g_type", "g_bucket", "n")
      .orderBy(col("g_type"), col("g_bucket"),
        col("event_type").asc_nulls_first, col("user_bucket").asc_nulls_first)


  /** Full CUBE over (lang, source): all four grouping-set combinations in
    * one pass — the lang × source inspection matrix with margins, the
    * cube sibling of q_ext_agg_rollup. Spark plans a single Expand +
    * aggregate (4 grouping sets), not four scans.
    */
  def qExtAggCube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .cube("lang", "source")
      .agg(count(lit(1)).as("n"),
        grouping(col("lang")).as("g_lang"),
        grouping(col("source")).as("g_source"))
      .select("lang", "source", "g_lang", "g_source", "n")
      .orderBy(col("g_lang"), col("g_source"),
        col("lang").asc_nulls_first, col("source").asc_nulls_first)


  /** Fuzzy key pairs by edit distance: normalized 16-char prefixes of a
    * bounded probe set, levenshtein <= 8 — the typo-tolerant record-link
    * step exact hashing misses. Both engines implement unit-cost
    * Wagner-Fischer over code points: exact integer oracle.
    */
  def qExtFuzzyPairs(spark: SparkSession, dir: String): DataFrame = {
    // coalesce makes the prefix NON-NULLABLE so the cross join infers no
    // isnotnull(<normalize+substring>) constraint filter, which would
    // re-evaluate the whole normalize pipeline per row (recompute guard)
    val d = t(spark, dir, "documents").filter(col("doc_id") < 60)
      .select(col("doc_id"),
        coalesce(substring(TextDedup.normalizeText(col("text")), 1, 16),
          lit("")).as("__p"))
    val a = d.select(col("doc_id").as("id_a"), col("__p").as("__pa"))
    val b = d.select(col("doc_id").as("id_b"), col("__p").as("__pb"))
    b.crossJoin(broadcast(a)).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("__pa"), col("__pb")))
      .filter(col("dist") <= 8)
      .select("id_a", "id_b", "dist")
      .orderBy("id_a", "id_b")
  }


  /** Running totals per user over event time ([[Window]] cumulative frame):
    * event index, cumulative error count, and running max value — the
    * order-sensitive window family (lag/lead/running aggregates) that
    * sessionize builds on, as its own checkable surface. Running sums are
    * restricted to counts/max (exact in FP); ties are impossible because
    * (user_id, ts_us, event_id) is unique.
    */
  def qExtRunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val events = t(spark, dir, "events")
    events
      .select(col("event_id"), col("user_id"),
        Sources.eventTsMicros(events).as("ts_us"),
        col("event_type"), col("value"))
      .withColumn("event_idx", row_number().over(w))
      .withColumn("cum_errors",
        count(when(col("event_type") === "error", lit(1))).over(w))
      .withColumn("run_max_value", round(max(col("value")).over(w), 6))
      .select("event_id", "user_id", "ts_us", "event_idx", "cum_errors",
        "run_max_value")
      .orderBy("user_id", "ts_us", "event_id")
  }


  /** Per-source length quantiles via the deterministic compactor sketch
    * ([[graft.functions.QuantileSketchExpression.MrlQuantiles]]):
    * capacity 1024 >= any sf0.01 group, so the summary is exact and the
    * nearest-rank (ceil) SQL is a true oracle; the compacting regime's
    * error bound is covered by QuantileSketchSpec. The bounded-state
    * alternative to q_ext_profile_quantiles' exact rank-select.
    */
  def qExtQuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val probs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    t(spark, dir, "documents")
      .groupBy("source")
      .agg(graft.functions.QuantileSketchExpression
        .mrl_quantiles(col("n_chars"), capacity = 1024, probs).as("__q"))
      .select(col("source") +: probs.indices.map(i =>
        col("__q").getItem(i).as(s"p${(probs(i) * 100).round}")): _*)
      .orderBy("source")
  }


  /** Per-source winsorization ([[Curation.winsorize]]): clip n_chars into
    * its source's [p05, p95] interpolated-quantile interval. The clip is
    * comparison-only (least/greatest), so outputs are either the input
    * value or the quantile bound — and Spark `percentile` ==
    * DuckDB `quantile_cont` bit-for-bit on this data is already the
    * q_ext_quantiles_by_lang precedent.
    */
  def qExtWinsorize(spark: SparkSession, dir: String): DataFrame =
    // The corpus has no null-source rows, so a deterministic null GROUP is
    // injected (doc_id % 83) — the oracle must exercise the null-safe
    // `<=>` bounds join ([[Curation.winsorize]]), not just the spec
    // (round-12 verdict #6): a plain equi-join would silently drop these
    // rows and the hash compare catches it.
    Curation.winsorize(
        t(spark, dir, "documents").withColumn("source",
          when(col("doc_id") % 83 === 0, lit(null: String))
            .otherwise(col("source"))),
        "source", "n_chars", pLo = 0.05, pHi = 0.95)
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("n_chars_clipped"))
      .orderBy("doc_id")


  /** URL canonicalization ([[UrlOps]]) over deterministic synthetic URLs
    * (the corpus has no URL column; same manufactured-fixture pattern as
    * q_ext_pii_redact). The fixture varies scheme, casing, default vs
    * explicit port, trailing slash, tracking params, and fragments by
    * customer key, so every canonicalization rule fires on real rows.
    * The oracle derives the expected canonical form INDEPENDENTLY from
    * the key arithmetic — a ground-truth statement, not an
    * implementation mirror.
    */
  def qExtUrlCanonical(spark: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val url = concat(
      when(k % 2 === 0, lit("HTTPS://WWW.Shop")).otherwise(lit("http://shop")),
      (k % 50).cast("string"), lit(".Example.COM"),
      when(k % 2 === 0, lit(":443")).otherwise(lit(":8080")),
      lit("/items/item"), k.cast("string"),
      when(k % 3 === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=news&id="), k.cast("string"),
      lit("&utm_campaign=c"), (k % 7).cast("string"),
      when(k % 5 === 0, lit("#frag")).otherwise(lit("")))
    t(spark, dir, "customer")
      .select(k, url.as("url"))
      .select(k, col("url"),
        UrlOps.canonicalUrl(col("url")).as("url_canonical"),
        UrlOps.urlDomain(col("url")).as("domain"))
      .orderBy("c_custkey")
  }


  /** Per-column profile metrics as a UNION ALL over the table's columns —
    * mirrors Profiler.profile with exact distincts.
    */
  private def profileOracleSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS "column", count(*)::BIGINT AS n_rows,
         |  (count(*) - count($c))::BIGINT AS n_nulls,
         |  count(DISTINCT $c)::BIGINT AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min, CAST(max($c) AS VARCHAR) AS max
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")


  /** One quantile row per column: DuckDB `quantile_cont` = Spark exact
    * `percentile` (both linearly interpolate the two adjacent sorted
    * values at rank (n-1)*p — identical IEEE arithmetic).
    */
  private def quantilesOracleSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS "column",
         |  round(quantile_cont($c, 0.25), 6) AS p25,
         |  round(quantile_cont($c, 0.5), 6) AS p50,
         |  round(quantile_cont($c, 0.75), 6) AS p75
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")

  private[queries] lazy val miscTierQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ext_cap_per_source" -> (qExtCapPerSource _),
    "q_ext_pivot_lang_counts" -> (qExtPivotLangCounts _),
    "q_ext_unpivot" -> (qExtUnpivot _),
    "q_ext_ntile_tiers" -> (qExtNtileTiers _),
    "q_ext_quantiles_by_lang" -> (qExtQuantilesByLang _),
    "q_ext_budget_per_source" -> (qExtBudgetPerSource _),
    "q_ext_heavy_hitters" -> (qExtHeavyHitters _),
    "q_ext_sample_weighted" -> (qExtSampleWeighted _),
    "q_ext_sample_weighted_grouped" -> (qExtSampleWeightedGrouped _),
    "q_ext_mixture_weights" -> (qExtMixtureWeights _),
    "q_ext_mixture_realize" -> (qExtMixtureRealize _),
    "q_ext_profile" -> (qExtProfile _),
    "q_ext_train_test_split" -> (qExtTrainTestSplit _),
    "q_ext_pack_sequences" -> (qExtPackSequences _),
    "q_ext_sample_stratified" -> (qExtSampleStratified _),
    "q_ext_multimodal_features" -> (qExtMultimodalFeatures _),
    "q_ext_multimodal_decode" -> (qExtMultimodalDecode _),
    "q_ext_multimodal_pixels" -> (qExtMultimodalPixels _),
    "q_ext_multimodal_resize" -> (qExtMultimodalResize _),
    "q_ext_multimodal_gif" -> (qExtMultimodalGif _),
    "q_ext_multimodal_frames" -> (qExtMultimodalFrames _),
    "q_ext_multimodal_frames_delta" -> (qExtMultimodalFramesDelta _),
    "q_ext_multimodal_jpeg" -> (qExtMultimodalJpeg _),
    "q_ext_multimodal_video" -> (qExtMultimodalVideo _),
    "q_ext_skew_salted_count" -> (qExtSkewSaltedCount _),
    "q_ext_profile_quantiles" -> (qExtProfileQuantiles _),
    "q_ext_filter_blocklist" -> (qExtFilterBlocklist _),
    "q_ext_shuffle_order" -> (qExtShuffleOrder _),
    "q_ext_agg_rollup" -> (qExtAggRollup _),
    "q_ext_agg_cube" -> (qExtAggCube _),
    "q_ext_fuzzy_pairs" -> (qExtFuzzyPairs _),
    "q_ext_running_total" -> (qExtRunningTotal _),
    "q_ext_quantile_sketch" -> (qExtQuantileSketch _),
    "q_ext_winsorize" -> (qExtWinsorize _),
    "q_ext_url_canonical" -> (qExtUrlCanonical _),
  )

  private[queries] lazy val miscTierOracles: Map[String, String] = Map(
    "q_ext_profile_quantiles" -> quantilesOracleSql("lineitem",
      Seq("l_quantity", "l_extendedprice", "l_discount")),
    "q_ext_filter_blocklist" ->
      s"""WITH docs AS (
         |  SELECT doc_id, coalesce(md5($normSql), '') AS content_hash, lang FROM documents
         |), blocked AS (
         |  SELECT DISTINCT content_hash FROM docs WHERE lang = 'und'
         |)
         |SELECT d.doc_id, d.content_hash FROM docs d
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM blocked b WHERE b.content_hash = d.content_hash)
         |ORDER BY d.doc_id""".stripMargin,
    "q_ext_shuffle_order" ->
      """SELECT doc_id, source,
        |       md5('epoch0' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |FROM documents
        |ORDER BY shuffle_key, doc_id""".stripMargin,
    "q_ext_agg_rollup" ->
      """WITH e AS (
        |  SELECT event_type, CAST(user_id % 10 AS INTEGER) AS user_bucket
        |  FROM events
        |)
        |SELECT event_type, user_bucket,
        |       GROUPING(event_type) AS g_type,
        |       GROUPING(user_bucket) AS g_bucket,
        |       count(*) AS n
        |FROM e
        |GROUP BY ROLLUP(event_type, user_bucket)
        |ORDER BY g_type, g_bucket,
        |         event_type NULLS FIRST, user_bucket NULLS FIRST""".stripMargin,
    "q_ext_agg_cube" ->
      """SELECT lang, source,
        |       GROUPING(lang) AS g_lang,
        |       GROUPING(source) AS g_source,
        |       count(*) AS n
        |FROM documents
        |GROUP BY CUBE(lang, source)
        |ORDER BY g_lang, g_source,
        |         lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    "q_ext_fuzzy_pairs" ->
      s"""WITH d AS (
         |  SELECT doc_id, coalesce(substr($normSql, 1, 16), '') AS p
         |  FROM documents WHERE doc_id < 60
         |)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       levenshtein(a.p, b.p) AS dist
         |FROM d a, d b
         |WHERE a.doc_id < b.doc_id AND levenshtein(a.p, b.p) <= 8
         |ORDER BY id_a, id_b""".stripMargin,
    "q_ext_running_total" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
        |         event_type, value
        |  FROM events
        |)
        |SELECT event_id, user_id, ts_us,
        |  row_number() OVER w AS event_idx,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) OVER w AS cum_errors,
        |  round(max(value) OVER w, 6) AS run_max_value
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    // the synthetic orders table carries 6 of the TPC-H columns
    "q_ext_profile" -> profileOracleSql("orders", Seq(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")),
    "q_ext_budget_per_source" ->
      """WITH cum AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(sum(n_chars) OVER (PARTITION BY source
        |                            ORDER BY n_chars DESC, doc_id ASC
        |                            ROWS UNBOUNDED PRECEDING)
        |         AS BIGINT) AS cum_tokens,
        |    CASE WHEN source = 'src1' THEN 5000 ELSE 2000 END AS budget
        |  FROM documents
        |)
        |SELECT doc_id, source, n_chars, cum_tokens FROM cum
        |WHERE cum_tokens - n_chars < budget ORDER BY doc_id""".stripMargin,

    // quantile_cont == Spark percentile: same rank p*(n-1) and two-sided
    // linear interpolation; quarter-probs over ints are FP-exact
    "q_ext_quantiles_by_lang" ->
      """SELECT lang,
        |  quantile_cont(n_chars, 0.25) AS p25,
        |  quantile_cont(n_chars, 0.50) AS p50,
        |  quantile_cont(n_chars, 0.75) AS p75
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // (source, rk) is unique and rk orders within source, so the full
    // output order is pinned
    "q_ext_cap_per_source" ->
      """WITH ranked AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id ASC) AS rk
        |  FROM documents
        |)
        |SELECT doc_id, source, n_chars, rk FROM ranked
        |WHERE rk <= 10 ORDER BY source, rk""".stripMargin,

    "q_ext_pivot_lang_counts" ->
      """SELECT source,
        |  count(*) FILTER (lang = 'en') AS en,
        |  count(*) FILTER (lang = 'zh') AS zh,
        |  count(*) FILTER (lang = 'es') AS es,
        |  count(*) FILTER (lang = 'de') AS de,
        |  count(*) FILTER (lang = 'fr') AS fr
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // melt inverse of the pivot: every (source, lang) cell materializes,
    // zero-count cells as explicit zeros
    "q_ext_unpivot" ->
      """WITH s AS (SELECT DISTINCT source FROM documents),
        |l AS (SELECT unnest(['en','zh','es','de','fr']) AS lang),
        |c AS (SELECT source, lang, count(*)::BIGINT AS n
        |      FROM documents GROUP BY source, lang)
        |SELECT s.source, l.lang, coalesce(c.n, 0)::BIGINT AS n
        |FROM s CROSS JOIN l LEFT JOIN c USING (source, lang)
        |ORDER BY source, lang""".stripMargin,

    // ntile is SQL-standard in both engines (larger buckets first); the
    // window order is total (n_chars DESC, doc_id), so tiers are exact
    "q_ext_ntile_tiers" ->
      """SELECT doc_id, lang, n_chars,
        |  ntile(4) OVER (PARTITION BY lang
        |                 ORDER BY n_chars DESC, doc_id ASC) AS tier
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Mirrors qExtChunkOverlap (W=32, S=24): window count 1 when n <= W,
    // else 1 + ceil((n-W)/S) in integer arithmetic; DuckDB list slicing is
    // 1-based inclusive and clamps, exactly like the native kernel's
    // [i*S, min(i*S+W, n)) ranges. start_tok = i*S; n_tokens re-derived
    // from the emitted window (len of the slice).
    "q_ext_sample_weighted_grouped" ->
      """WITH w AS (SELECT lang, doc_id, n_chars::BIGINT AS wt FROM documents),
        |tot AS (SELECT lang, sum(wt)::HUGEINT AS W FROM w GROUP BY lang),
        |c AS (SELECT lang, doc_id, wt,
        |             sum(wt) OVER (PARTITION BY lang ORDER BY doc_id
        |                           ROWS UNBOUNDED PRECEDING)::HUGEINT AS cum
        |      FROM w)
        |SELECT c.lang, c.doc_id, c.wt AS weight,
        |       ((c.cum * 20) // t.W
        |        - ((c.cum - c.wt) * 20) // t.W)::BIGINT AS copies
        |FROM c JOIN tot t USING (lang)
        |WHERE (c.cum * 20) // t.W > ((c.cum - c.wt) * 20) // t.W
        |ORDER BY doc_id""".stripMargin,

    // sqrt is IEEE-correctly-rounded and the normalizer sums DECIMAL(38,6)
    // (exact, order-independent), so every double op here reproduces
    // bit-for-bit: an exact oracle despite the irrational weights.
    "q_ext_mixture_weights" ->
      """WITH c AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n, round(sqrt(n), 6) AS w FROM c),
        |t AS (SELECT sum(w::DECIMAL(38,6)) AS wtot, sum(n) AS ntot FROM w),
        |r AS (SELECT w.lang, w.n, w.w,
        |             round(w.w / t.wtot::DOUBLE, 6) AS rate, t.ntot AS ntot
        |      FROM w, t)
        |SELECT lang, n, w, rate, round(rate * ntot / n, 6) AS boost
        |FROM r ORDER BY lang""".stripMargin,

    "q_ext_mixture_realize" ->
      """WITH c AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n, round(sqrt(n), 6) AS w FROM c),
        |t AS (SELECT sum(w::DECIMAL(38,6)) AS wtot FROM w),
        |b AS (SELECT w.lang,
        |             floor(round(w.w / t.wtot::DOUBLE, 6) * 20000)::BIGINT AS budget
        |      FROM w, t),
        |d AS (SELECT doc_id, lang, n_chars,
        |             sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |                                ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM documents)
        |SELECT d.doc_id, d.lang, d.n_chars, b.budget
        |FROM d JOIN b USING (lang)
        |WHERE d.cum - d.n_chars < b.budget
        |ORDER BY d.doc_id""".stripMargin,

    "q_ext_sample_weighted" ->
      """WITH w AS (SELECT doc_id, n_chars::BIGINT AS wt FROM documents),
        |tot AS (SELECT sum(wt)::HUGEINT AS W FROM w),
        |c AS (SELECT doc_id, wt,
        |             sum(wt) OVER (ORDER BY doc_id
        |                           ROWS UNBOUNDED PRECEDING)::HUGEINT AS cum
        |      FROM w)
        |SELECT c.doc_id, c.wt AS weight,
        |       ((c.cum * 100) // t.W
        |        - ((c.cum - c.wt) * 100) // t.W)::BIGINT AS copies
        |FROM c, tot t
        |WHERE (c.cum * 100) // t.W > ((c.cum - c.wt) * 100) // t.W
        |ORDER BY doc_id""".stripMargin,

    // Exact-regime Misra-Gries (capacity 64 > 31 distinct tokens): counts
    // equal true frequencies, so the plain top-20 frequency query is a
    // true oracle for the sketch path.
    "q_ext_heavy_hitters" ->
      s"""SELECT tok AS token, count(*)::BIGINT AS cnt
         |FROM (SELECT unnest(string_split($normSql, ' ')) AS tok
         |      FROM documents)
         |GROUP BY tok ORDER BY cnt DESC, token ASC LIMIT 20""".stripMargin,

    // Rational idf (n+1)/(df+1): every double op here (division, multiply)
    // is IEEE-correctly-rounded, so scores are bit-identical to Spark's.
    "q_ext_skew_salted_count" ->
      """SELECT l_returnflag, count(*) AS cnt FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Same md5 bucket as Sampling.hashBucket: first 15 md5 hex chars of
    // salt||key as an integer, mod 100; bucket < 10 -> test, < 20 -> val.
    "q_ext_train_test_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 10 THEN 'test' WHEN b < 20 THEN 'val'
        |       ELSE 'train' END AS split
        |FROM (
        |  SELECT doc_id,
        |    ('0x' || substr(md5('corpus_v1' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS b
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // Offset packing per language: tokens-before-this-doc via integer
    // window sum (cast from HUGEINT — pandas renders HUGEINT as float).
    "q_ext_pack_sequences" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang,
         |         CAST(len(str_split($normSql, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), cum AS (
         |  SELECT doc_id, lang, n_tokens,
         |         CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |                                  ROWS UNBOUNDED PRECEDING)
         |              - n_tokens AS BIGINT) AS before
         |  FROM toks
         |)
         |SELECT doc_id, lang, n_tokens,
         |       before // 512 AS seq_id, before % 512 AS seq_offset
         |FROM cum ORDER BY doc_id""".stripMargin,

    // Same md5 bucket as Sampling.hashBucket, per-stratum threshold.
    "q_ext_sample_stratified" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5('strat_v1' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS b
        |  FROM documents)
        |WHERE b < CASE WHEN lang = 'en' THEN 30
        |               WHEN lang = 'de' THEN 100 ELSE 50 END
        |ORDER BY doc_id""".stripMargin,

    // Fixed-centroid IVF (Ivf.fixedModel: centroids = vectors 0,31,…,465;
    // cid = vec_id // 31): assignment and probing are argmax/top-4 by
    // (cosine, cid) — ties break to the HIGHER cid, mirroring Spark's
    // array_max over (score, id) structs, hence `ORDER BY s DESC, cid DESC`.
    // PQ: the fixed codebook (sub-sliced vectors of ids 0,31,…,465) makes
    // the encode reproducible — per (vector, subspace), argmax of
    // dot − ‖cw‖²/2 with ties to the higher codeword id. list_dot_product
    // and the driver's sequential sum-of-squares are the same index-order
    // IEEE chain, so scores (and hence every code) match bit-for-bit.
    "q_ext_multimodal_features" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, 'image' AS kind, coalesce(text, '') AS t
        |  FROM documents
        |), h AS (
        |  SELECT media_id, kind, octet_length(encode(t)) AS n_bytes,
        |         regexp_replace(hex(encode(t)), '(.).', '\1', 'g') AS nib
        |  FROM d
        |), c AS (
        |  SELECT media_id, kind, n_bytes,
        |         list_transform(range(16), k ->
        |           length(nib) - length(replace(nib,
        |             substr('0123456789ABCDEF', (k + 1)::INT, 1), ''))) AS cnts
        |  FROM h
        |)
        |SELECT media_id, kind, n_bytes,
        |       list_position(cnts, list_max(cnts)) - 1 AS top_bin,
        |       list_max(cnts) AS top_count
        |FROM c ORDER BY media_id""".stripMargin,

    // Ground truth from the GENERATING arithmetic only (see
    // qExtMultimodalDecode's parameter table): the oracle predicts every
    // container field the parser must read — independent of both the JDK
    // encoders that produced the payloads and the MediaCodec parsers that
    // read them back. duration_micros reduces exactly:
    // dataBytes·1e6/byteRate = frames·1e6/rate (integer division).
    "q_ext_multimodal_decode" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'image/png'
        |                  WHEN 1 THEN 'audio/wav'
        |                  WHEN 2 THEN 'image/jpeg'
        |                  ELSE 'image/gif' END AS kind,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN doc_id % 61 + 1
        |            WHEN doc_id % 4 = 2 THEN doc_id % 47 + 1
        |            WHEN doc_id % 4 = 3 THEN doc_id % 31 + 1 END AS VARCHAR) AS width,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN doc_id % 29 + 1
        |            WHEN doc_id % 4 = 2 THEN doc_id % 23 + 1
        |            WHEN doc_id % 4 = 3 THEN doc_id % 17 + 1 END AS VARCHAR) AS height,
        |  CAST(CASE WHEN doc_id % 4 = 1 THEN (doc_id // 4) % 2 + 1
        |            WHEN doc_id % 4 = 3 THEN 1
        |            WHEN (doc_id // 4) % 2 = 0 THEN 1 ELSE 3 END AS VARCHAR) AS channels,
        |  CAST(CASE WHEN doc_id % 4 = 1 THEN 16
        |            WHEN doc_id % 4 = 3 THEN 2 ELSE 8 END AS VARCHAR) AS bit_depth,
        |  CAST(CASE WHEN doc_id % 4 = 1
        |            THEN 8000 * ((doc_id % 9) // 3 + 1) END AS VARCHAR) AS sample_rate_hz,
        |  CAST(CASE WHEN doc_id % 4 = 1
        |            THEN ((doc_id % 97 + 1) * 1000000)
        |                 // (8000 * ((doc_id % 9) // 3 + 1)) END AS VARCHAR) AS duration_micros
        |FROM documents WHERE doc_id % 5 = 0 ORDER BY media_id""".stripMargin,

    // Ground truth for the PIXEL decode: every sample of every RGB PNG is
    // recomputed from the generator arithmetic v = (id + 31x + 17y) % 256
    // over the w×h grid (ids ≡ 4 mod 8 are exactly the truecolor PNGs;
    // all three channels carry v, hence the ×3 on counts and sums) —
    // independent of both the JDK PNG encoder and MediaCodec.decodePng.
    "q_ext_multimodal_pixels" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id % 8 = 4),
        |dims AS (SELECT id, id % 61 + 1 AS w, id % 29 + 1 AS h FROM ids),
        |px AS (
        |  SELECT d.id, d.w, d.h, (d.id + 31 * gx.x + 17 * gy.y) % 256 AS v
        |  FROM dims d
        |  CROSS JOIN LATERAL (SELECT unnest(range(d.w)) AS x) gx
        |  CROSS JOIN LATERAL (SELECT unnest(range(d.h)) AS y) gy
        |)
        |SELECT id AS media_id, w AS width, h AS height,
        |       CAST(count(*) AS BIGINT) AS n_pixels,
        |       CAST(3 * count(*) AS BIGINT) AS n_samples,
        |       CAST(3 * sum(v) AS BIGINT) AS px_sum,
        |       CAST(min(v) AS BIGINT) AS px_min,
        |       CAST(max(v) AS BIGINT) AS px_max
        |FROM px GROUP BY 1, 2, 3 ORDER BY media_id""".stripMargin,

    // GIF-index ground truth: every palette index of every GIF recomputed
    // from the generating arithmetic (id + x + 31y) mod 4 over the w×h
    // grid — the Spark side LZW-decompresses real JDK-written streams.
    "q_ext_multimodal_gif" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id % 4 = 3),
        |dims AS (SELECT id, id % 31 + 1 AS w, id % 17 + 1 AS h FROM ids),
        |px AS (
        |  SELECT d.id, d.w, d.h, (d.id + gx.x + 31 * gy.y) % 4 AS v
        |  FROM dims d
        |  CROSS JOIN LATERAL (SELECT unnest(range(d.w)) AS x) gx
        |  CROSS JOIN LATERAL (SELECT unnest(range(d.h)) AS y) gy
        |)
        |SELECT id AS media_id, w AS width, h AS height,
        |       CAST(count(*) AS BIGINT) AS n_pixels,
        |       CAST(sum(v) AS BIGINT) AS px_sum,
        |       CAST(min(v) AS BIGINT) AS px_min,
        |       CAST(max(v) AS BIGINT) AS px_max
        |FROM px GROUP BY 1, 2, 3 ORDER BY media_id""".stripMargin,

    // Frame-sampling ground truth: every sampled frame's indices recomputed
    // from the per-frame arithmetic (id + x + 31y + 7f) mod 4 — the Spark
    // side LZW-decodes every frame of real JDK sequence-writer animations.
    "q_ext_multimodal_frames" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id % 8 = 6),
        |dims AS (SELECT id, id % 13 + 1 AS w, id % 11 + 1 AS h,
        |                id % 9 + 2 AS nf FROM ids),
        |fr AS (
        |  SELECT d.*, gf.f FROM dims d
        |  CROSS JOIN LATERAL (SELECT unnest(range(0, d.nf, 2)) AS f) gf
        |),
        |px AS (
        |  SELECT fr.id, fr.f, fr.nf, fr.w, fr.h,
        |         (fr.id + gx.x + 31 * gy.y + 7 * fr.f) % 4 AS v
        |  FROM fr
        |  CROSS JOIN LATERAL (SELECT unnest(range(fr.w)) AS x) gx
        |  CROSS JOIN LATERAL (SELECT unnest(range(fr.h)) AS y) gy
        |)
        |SELECT id AS media_id, CAST(f AS INT) AS frame_idx,
        |       CAST(nf AS INT) AS n_frames,
        |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |       CAST(sum(v) AS BIGINT) AS idx_sum,
        |       CAST(min(v) AS BIGINT) AS idx_min,
        |       CAST(max(v) AS BIGINT) AS idx_max
        |FROM px GROUP BY 1, 2, 3, 4, 5 ORDER BY media_id, frame_idx""".stripMargin,

    // Delta-animation composition replay: the per-frame LOCAL pattern
    // (id + 7f + lx + 31·ly) mod 4 composed over the logical screen per
    // GIF89a §23 — frame 1's rect skips its transparent index 2 (canvas
    // shows through), frame 2's rect overwrites. The Spark side writes
    // REAL JDK-metadata delta GIFs and composes them from the container
    // bytes, so a hash match proves encode → walk → LZW → compose exactly.
    "q_ext_multimodal_frames_delta" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id % 8 = 1),
        |dims AS (SELECT id, id % 10 + 4 AS w, id % 7 + 4 AS h FROM ids),
        |grid AS (
        |  SELECT d.id, d.w, d.h, gx.x, gy.y,
        |         (d.id + gx.x + 31 * gy.y) % 4 AS c0
        |  FROM dims d
        |  CROSS JOIN LATERAL (SELECT unnest(range(d.w)) AS x) gx
        |  CROSS JOIN LATERAL (SELECT unnest(range(d.h)) AS y) gy
        |),
        |comp1 AS (
        |  SELECT id, w, h, x, y, c0,
        |    CASE WHEN x BETWEEN 1 AND w - 2 AND y BETWEEN 1 AND h - 2
        |          AND (id + 7 + (x - 1) + 31 * (y - 1)) % 4 <> 2
        |         THEN (id + 7 + (x - 1) + 31 * (y - 1)) % 4 ELSE c0 END AS c1
        |  FROM grid
        |),
        |comp2 AS (
        |  SELECT id, w, h, x, y, c0, c1,
        |    CASE WHEN x BETWEEN 2 AND w - 2 AND y BETWEEN 1 AND h - 3
        |         THEN (id + 14 + (x - 2) + 31 * (y - 1)) % 4 ELSE c1 END AS c2
        |  FROM comp1
        |),
        |px AS (
        |  SELECT id, w, h, gf.f,
        |         CASE gf.f WHEN 0 THEN c0 WHEN 1 THEN c1 ELSE c2 END AS v
        |  FROM comp2
        |  CROSS JOIN LATERAL (SELECT unnest(range(3)) AS f) gf
        |)
        |SELECT id AS media_id, CAST(f AS INT) AS frame_idx,
        |       CAST(3 AS INT) AS n_frames,
        |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |       CAST(sum(v) AS BIGINT) AS idx_sum,
        |       CAST(min(v) AS BIGINT) AS idx_min,
        |       CAST(max(v) AS BIGINT) AS idx_max
        |FROM px GROUP BY 1, 2, 3, 4, 5 ORDER BY media_id, frame_idx""".stripMargin,

    // Every pixel recomputed from the DC-only fixture contract
    // (Multimodal.encodeJpegDc scaladoc): per-block flat values
    // y = 128 + kY(bx,by), chroma sampled at the layout's block scale,
    // then the decoder's NORMATIVE fixed-point YCbCr->RGB (floor
    // rounding; constants round(x*65536)). Independent of the encoder
    // that wrote the stream and the Huffman/IDCT walk that reads it.
    "q_ext_multimodal_jpeg" ->
      """WITH dims AS (
        |  SELECT doc_id AS id, (doc_id % 3) AS chroma,
        |         CASE WHEN doc_id % 3 = 2 THEN 16*(doc_id % 3 + 1)
        |              ELSE 8*(doc_id % 5 + 1) END AS w,
        |         CASE WHEN doc_id % 3 = 2 THEN 16*(doc_id % 2 + 1)
        |              ELSE 8*(doc_id % 3 + 1) END AS h
        |  FROM documents WHERE doc_id % 5 = 2
        |), blk AS (
        |  SELECT id, chroma, w, h,
        |         unnest(flatten(list_transform(range(0, h // 8), by ->
        |           list_transform(range(0, w // 8), bx ->
        |             {'bx': bx, 'by': by})))) AS b
        |  FROM dims
        |), vals AS (
        |  SELECT id, chroma, w, h,
        |         128 + ((id + 7*b.bx + 13*b.by) % 33) - 16 AS y,
        |         ((3*id + 5*(CASE WHEN chroma = 2 THEN b.bx // 2 ELSE b.bx END)
        |                 + 11*(CASE WHEN chroma = 2 THEN b.by // 2 ELSE b.by END)) % 33) - 16 AS cb,
        |         ((5*id + 3*(CASE WHEN chroma = 2 THEN b.bx // 2 ELSE b.bx END)
        |                 + 17*(CASE WHEN chroma = 2 THEN b.by // 2 ELSE b.by END)) % 33) - 16 AS cr
        |  FROM blk
        |), rgb AS (
        |  SELECT id, chroma, w, h, y,
        |         least(255, greatest(0, y + floor((91881*cr + 32768) / 65536.0)))::BIGINT AS r,
        |         least(255, greatest(0, y + floor((-22554*cb - 46802*cr + 32768) / 65536.0)))::BIGINT AS g,
        |         least(255, greatest(0, y + floor((116130*cb + 32768) / 65536.0)))::BIGINT AS bl
        |  FROM vals
        |)
        |SELECT id AS media_id, w::BIGINT AS width, h::BIGINT AS height,
        |       (CASE WHEN chroma = 0 THEN 1 ELSE 3 END)::BIGINT AS channels,
        |       (w*h)::BIGINT AS n_pixels,
        |       (w*h*CASE WHEN chroma = 0 THEN 1 ELSE 3 END)::BIGINT AS n_samples,
        |       sum(CASE WHEN chroma = 0 THEN 64*y ELSE 64*(r+g+bl) END)::BIGINT AS px_sum,
        |       min(CASE WHEN chroma = 0 THEN y ELSE least(r, g, bl) END)::BIGINT AS px_min,
        |       max(CASE WHEN chroma = 0 THEN y ELSE greatest(r, g, bl) END)::BIGINT AS px_max
        |FROM rgb GROUP BY id, chroma, w, h ORDER BY media_id""".stripMargin,

    // Video twin of the JPEG oracle: same DC-block arithmetic with the
    // frame index folded into the seed (s = id + f), one output row per
    // (container, frame). Gray (chroma 0) and 4:4:4 (chroma 1) only —
    // per synthesizeAviMjpeg's parameter contract.
    "q_ext_multimodal_video" ->
      """WITH dims AS (
        |  SELECT doc_id AS id, (doc_id % 2) AS chroma,
        |         8*(doc_id % 4 + 1) AS w, 8*(doc_id % 3 + 1) AS h,
        |         (doc_id % 3 + 2) AS nf
        |  FROM documents WHERE doc_id % 6 = 5
        |), frames AS (
        |  SELECT id, chroma, w, h, nf, unnest(range(0, nf)) AS f
        |  FROM dims
        |), blk AS (
        |  SELECT id, chroma, w, h, nf, f, (id + f) AS s,
        |         unnest(flatten(list_transform(range(0, h // 8), by ->
        |           list_transform(range(0, w // 8), bx ->
        |             {'bx': bx, 'by': by})))) AS b
        |  FROM frames
        |), vals AS (
        |  SELECT id, chroma, w, h, nf, f,
        |         128 + ((s + 7*b.bx + 13*b.by) % 33) - 16 AS y,
        |         ((3*s + 5*b.bx + 11*b.by) % 33) - 16 AS cb,
        |         ((5*s + 3*b.bx + 17*b.by) % 33) - 16 AS cr
        |  FROM blk
        |), rgb AS (
        |  SELECT id, chroma, w, h, nf, f, y,
        |         least(255, greatest(0, y + floor((91881*cr + 32768) / 65536.0)))::BIGINT AS r,
        |         least(255, greatest(0, y + floor((-22554*cb - 46802*cr + 32768) / 65536.0)))::BIGINT AS g,
        |         least(255, greatest(0, y + floor((116130*cb + 32768) / 65536.0)))::BIGINT AS bl
        |  FROM vals
        |)
        |SELECT id AS media_id, f AS frame_idx, nf AS n_frames,
        |       w AS width, h AS height,
        |       (CASE WHEN chroma = 0 THEN 1 ELSE 3 END) AS channels,
        |       sum(CASE WHEN chroma = 0 THEN 64*y ELSE 64*(r+g+bl) END)::BIGINT AS px_sum,
        |       min(CASE WHEN chroma = 0 THEN y ELSE least(r, g, bl) END)::BIGINT AS px_min,
        |       max(CASE WHEN chroma = 0 THEN y ELSE greatest(r, g, bl) END)::BIGINT AS px_max
        |FROM rgb GROUP BY id, chroma, w, h, nf, f
        |ORDER BY media_id, frame_idx""".stripMargin,

    // Resize replay: the same generating arithmetic composed with the
    // nearest-neighbor source map (sx = x*w div 8, sy = y*h div 8) — the
    // Spark side re-encodes and re-decodes REAL PNGs in between, so a
    // match proves decode → NN-sample → encode → decode end-to-end.
    "q_ext_multimodal_resize" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id % 8 = 4),
        |dims AS (SELECT id, id % 61 + 1 AS w, id % 29 + 1 AS h FROM ids),
        |px AS (
        |  SELECT d.id,
        |         (d.id + 31 * ((gx.x * d.w) // 8) + 17 * ((gy.y * d.h) // 8)) % 256 AS v
        |  FROM dims d
        |  CROSS JOIN LATERAL (SELECT unnest(range(8)) AS x) gx
        |  CROSS JOIN LATERAL (SELECT unnest(range(8)) AS y) gy
        |)
        |SELECT id AS media_id, CAST(8 AS BIGINT) AS width,
        |       CAST(8 AS BIGINT) AS height,
        |       CAST(3 * count(*) AS BIGINT) AS n_samples,
        |       CAST(3 * sum(v) AS BIGINT) AS px_sum,
        |       CAST(min(v) AS BIGINT) AS px_min,
        |       CAST(max(v) AS BIGINT) AS px_max
        |FROM px GROUP BY 1 ORDER BY media_id""".stripMargin,

    // DuckDB's native ASOF JOIN is the oracle for the union+window as-of
    // composition (AsofJoin.asofJoin): greatest right ts_us <= left ts_us
    // per user; rights pre-deduped per (user, ts_us) on both sides.
    "q_ext_quantile_sketch" -> {
      val cols = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75",
        0.9 -> "p90", 0.99 -> "p99").map { case (p, name) =>
        s"  max(CASE WHEN rn <= greatest(1, ceil(($p::DOUBLE) * n)) THEN v END) AS $name"
      }.mkString(",\n")
      s"""WITH r AS (
         |  SELECT source, n_chars::DOUBLE AS v,
         |         row_number() OVER (PARTITION BY source
         |                            ORDER BY n_chars::DOUBLE) AS rn,
         |         count(*) OVER (PARTITION BY source) AS n
         |  FROM documents
         |)
         |SELECT source,
         |$cols
         |FROM r GROUP BY source ORDER BY source""".stripMargin
    },

    // Clip is comparison-only; clipped outputs equal either the input or
    // the interpolated bound (quantile_cont == Spark percentile, the
    // q_ext_quantiles_by_lang precedent).
    // d injects the same deterministic null group as the Spark side; the
    // bounds join must be null-safe (IS NOT DISTINCT FROM) or the null
    // group's rows vanish — the exact failure mode the fixture exists to
    // catch.
    "q_ext_winsorize" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 83 = 0 THEN NULL ELSE source END AS source,
        |         n_chars
        |  FROM documents
        |), b AS (
        |  SELECT source,
        |         quantile_cont(n_chars, 0.05) AS lo,
        |         quantile_cont(n_chars, 0.95) AS hi
        |  FROM d GROUP BY source
        |)
        |SELECT d.doc_id, d.source, d.n_chars,
        |       least(greatest(d.n_chars::DOUBLE, b.lo), b.hi) AS n_chars_clipped
        |FROM d LEFT JOIN b ON d.source IS NOT DISTINCT FROM b.source
        |ORDER BY d.doc_id""".stripMargin,

    // Ground-truth oracle: the canonical form is derived directly from
    // the key arithmetic that synthesized the URL (scheme/port by k%2,
    // trailing slash by k%3, fragment by k%5, tracking params always
    // stripped, host lowercased with www. dropped) — independent of the
    // engine's parser.
    "q_ext_url_canonical" ->
      """SELECT c_custkey,
        |  (CASE WHEN c_custkey % 2 = 0
        |        THEN 'HTTPS://WWW.Shop' ELSE 'http://shop' END)
        |  || (c_custkey % 50)::VARCHAR || '.Example.COM'
        |  || (CASE WHEN c_custkey % 2 = 0 THEN ':443' ELSE ':8080' END)
        |  || '/items/item' || c_custkey::VARCHAR
        |  || (CASE WHEN c_custkey % 3 = 0 THEN '/' ELSE '' END)
        |  || '?utm_source=news&id=' || c_custkey::VARCHAR
        |  || '&utm_campaign=c' || (c_custkey % 7)::VARCHAR
        |  || (CASE WHEN c_custkey % 5 = 0 THEN '#frag' ELSE '' END) AS url,
        |  (CASE WHEN c_custkey % 2 = 0 THEN 'https://' ELSE 'http://' END)
        |  || 'shop' || (c_custkey % 50)::VARCHAR || '.example.com'
        |  || (CASE WHEN c_custkey % 2 = 0 THEN '' ELSE ':8080' END)
        |  || '/items/item' || c_custkey::VARCHAR
        |  || '?id=' || c_custkey::VARCHAR AS url_canonical,
        |  'shop' || (c_custkey % 50)::VARCHAR || '.example.com' AS domain
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
