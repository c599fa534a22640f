package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (SURVEY §7.8): token counting,
  * quality metrics, n-gram-heuristic language ID, and document
  * fingerprinting. Pure column expressions — codegen-friendly, oracle-checkable.
  */
object TextStats {

  /** Whitespace token count. */
  def wsTokenCount(c: Column): Column = size(TextDedup.tokens(c))

  /** Deflate compression ratio of the raw text
    * ([[graft.functions.CompressExpression]]): low → templated/repetitive
    * (LZ77 catches long-range duplication the bigram metrics miss), very
    * high → incompressible noise. Engine-deterministic, not cross-engine
    * portable (zlib match choice) — the one TextStats signal without a
    * SQL oracle.
    */
  def compressionRatio(c: Column): Column =
    graft.functions.CompressExpression.compress_ratio(c)

  /** Portable LZ compression ratio ([[graft.functions.LzExpressions]]):
    * the same long-range-duplication signal with a NORMATIVE algorithm —
    * reimplementable bit-for-bit by any engine (LzRatioSpec holds an
    * independent naive implementation to exactly that standard), unlike
    * deflate's zlib-version-dependent byte count.
    */
  def lzRatio(c: Column): Column =
    graft.functions.LzExpressions.lz_ratio(c)

  /** BPE-ish token count: letter runs, single digits, and single
    * non-alphanumeric marks each count as one token (a crude but
    * deterministic proxy for subword tokenizers).
    */
  val bpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(bpeishPattern), lit(0)))

  /** Punctuation character count. */
  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[.,;:!?'\"()]"), lit(0)))

  /** Stopword occurrences (whole-word, lowercase). */
  def stopwordCount(c: Column, stopwords: Seq[String]): Column =
    size(regexp_extract_all(lower(c),
      lit("\\b(" + stopwords.mkString("|") + ")\\b"), lit(0)))

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  // ------------------------------------------------- repetition signals

  /** Word n-grams of the normalized text; EMPTY when fewer than n tokens
    * (no whole-text fallback — repetition fractions need the true n-gram
    * multiset, unlike [[TextDedup.shingles]] where short docs must still
    * participate in joins).
    */
  def wordNgrams(c: Column, n: Int): Column = {
    val toks = TextDedup.tokens(c)
    if (n <= 1) toks
    else when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Fraction of n-gram occurrences that repeat an earlier occurrence:
    * `(total - distinct) / total`, 0 when no n-grams — the Gopher-style
    * repetition quality signal (templated/boilerplate text scores high).
    * Integer-over-integer IEEE division: engine-portable without rounding.
    */
  def dupNgramFraction(c: Column, n: Int): Column = {
    val g = wordNgrams(c, n)
    when(size(g) <= 0, lit(0.0))
      .otherwise((size(g) - size(array_distinct(g))).cast("double")
        / size(g).cast("double"))
  }

  /** Quality metrics bundle: length, token counts, mean token length,
    * punctuation ratio, stopword ratio. Ratios are rounded to 4 places for
    * engine-portable comparison.
    */
  def qualityMetrics(c: Column): Seq[(String, Column)] = {
    val nChars = length(c)
    val nTokens = wsTokenCount(c)
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "mean_token_len" -> round(length(regexp_replace(TextDedup.normalizeText(c), " ", ""))
        .cast("double") / nTokens, 4),
      "punct_ratio" -> round(punctCount(c).cast("double") / nChars, 4),
      "stopword_ratio" -> round(stopwordCount(c, defaultStopwords).cast("double") / nTokens, 4))
  }

  // ------------------------------------------- model-based quality scoring

  /** Linear quality-classifier weights over the [[qualityMetrics]] features
    * (the shape a trained fastText/logistic quality model exports). The
    * engine side of model-based quality filtering is APPLYING weights at
    * corpus scale — training happens offline; weights are data.
    *
    * Defaults are a hand-set heuristic favoring mid-length, low-punct,
    * stopword-bearing prose — replace with trained values.
    */
  final case class QualityWeights(
      bias: Double = -1.0,
      nChars: Double = 0.0005,
      nTokens: Double = 0.002,
      meanTokenLen: Double = 0.08,
      punctRatio: Double = -4.0,
      stopwordRatio: Double = 6.0)

  /** The classifier's raw margin w·features + bias, rounded to 6 places.
    *
    * Deliberately the LOGIT, not a sigmoid probability: the multiply-add
    * chain over the rounded metrics is IEEE-exact in a fixed evaluation
    * order (both engines evaluate left-to-right), so the output is
    * oracle-checkable bit-for-bit — `exp` is not correctly rounded and
    * differs across libm implementations. Thresholding (`logit >= t`) is
    * monotone-equivalent to thresholding the probability.
    */
  def qualityLogit(c: Column, w: QualityWeights = QualityWeights()): Column = {
    val m = qualityMetrics(c).toMap
    round(
      lit(w.bias)
        + lit(w.nChars) * m("n_chars")
        + lit(w.nTokens) * m("n_tokens")
        + lit(w.meanTokenLen) * m("mean_token_len")
        + lit(w.punctRatio) * m("punct_ratio")
        + lit(w.stopwordRatio) * m("stopword_ratio"), 6)
  }

  /** Marker-word profiles for the n-gram language-ID heuristic. Tiny on
    * purpose: language ID at scale is profile-scoring, and the engine side of
    * that is these counting expressions; richer profiles are data, not code.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "en" -> Seq("the", "and", "of", "is", "not"),
    "es" -> Seq("el", "la", "de", "es", "que"),
    "fr" -> Seq("le", "la", "et", "est", "que"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo"))

  /** Per-language marker score: whole-word occurrence count. */
  def langScore(c: Column, markers: Seq[String]): Column =
    size(regexp_extract_all(lower(c),
      lit("\\b(" + markers.mkString("|") + ")\\b"), lit(0)))

  /** Predicted language: argmax of marker scores, ties to the
    * alphabetically-first language, all-zero → "und".
    */
  def langId(c: Column): Column = {
    val scores = langProfiles.map { case (lang, markers) => (lang, langScore(c, markers)) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(best > 0 && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** OpenRefine-style document fingerprint: md5 of the sorted distinct
    * normalized tokens — collapses reorderings and repetitions.
    */
  def fingerprint(c: Column): Column =
    md5(array_join(array_sort(array_distinct(TextDedup.tokens(c))), " "))

  // ---------------------------------------------- quality filtering rules

  /** Gopher-style document-quality rule bundle. Bounds are inclusive-keep:
    * a doc is dropped when a metric falls strictly outside its bound.
    */
  final case class QualityRules(
    minTokens: Int = 5, maxTokens: Int = 100000,
    minMeanTokenLen: Double = 2.0, maxMeanTokenLen: Double = 12.0,
    maxPunctRatio: Double = 0.25, minStopwordRatio: Double = 0.01)

  /** Ordered (ruleName, violated?) flags for a text column. All ratios are
    * unrounded int/int double divisions — IEEE division is correctly
    * rounded, so the comparisons are engine-portable bit-for-bit.
    *
    * The punct denominator is the only one that can be zero (token-count
    * denominators are >= 1: split never yields an empty array). ANSI mode
    * makes that division THROW, so it is guarded to NULL for an empty
    * text — the rule stays un-fired, which also matches the native form's
    * Java division there (0/0 → NaN, and JAVA NaN comparisons are false;
    * Spark instead orders NaN above every double, so NULL — not NaN — is
    * the value that keeps the two forms agreeing).
    */
  def qualityFlags(c: Column, rules: QualityRules): Seq[(String, Column)] = {
    val nTokens = wsTokenCount(c)
    val meanTok = length(regexp_replace(TextDedup.normalizeText(c), " ", ""))
      .cast("double") / nTokens
    val punct = when(length(c) > 0,
      punctCount(c).cast("double") / length(c))
    val stop = stopwordCount(c, defaultStopwords).cast("double") / nTokens
    Seq(
      "too_few_tokens" -> (nTokens < rules.minTokens),
      "too_many_tokens" -> (nTokens > rules.maxTokens),
      "mean_token_too_short" -> (meanTok < rules.minMeanTokenLen),
      "mean_token_too_long" -> (meanTok > rules.maxMeanTokenLen),
      "too_much_punct" -> (punct > rules.maxPunctRatio),
      "too_few_stopwords" -> (stop < rules.minStopwordRatio))
  }

  /** Quality filter verdict: `keep` plus the FIRST violated rule name (rule
    * order is the declaration order above; null when kept). The typical
    * pipeline keeps `filter(col("keep"))`; the labeled drop reasons feed the
    * rejected-documents audit stream.
    *
    * The verdict is one native expression
    * ([[graft.functions.QualityExpressions.QualityFail]]) so a downstream
    * `filter(col("keep"))` costs one pass over the text per row. The CASE
    * built from [[qualityFlags]] is value-identical (QualityExpressionsSpec)
    * but re-derives each rule's metric from scratch — inlined into a Filter
    * condition it tokenizes the document ~6× per row, which the
    * PlanInvariantsSpec recompute-guard audit rejects on registry plans.
    */
  def qualityFilter(df: org.apache.spark.sql.DataFrame, textCol: String,
                    rules: QualityRules = QualityRules()): org.apache.spark.sql.DataFrame =
    df.withColumn("fail_reason", qualityFail(col(textCol), rules))
      .withColumn("keep", col("fail_reason").isNull)

  /** The native one-pass verdict expression for a text column. */
  def qualityFail(c: Column, rules: QualityRules = QualityRules()): Column =
    graft.functions.QualityExpressions.quality_fail(c,
      rules.minTokens, rules.maxTokens, rules.minMeanTokenLen,
      rules.maxMeanTokenLen, rules.maxPunctRatio, rules.minStopwordRatio,
      "\\b(" + defaultStopwords.mkString("|") + ")\\b")

  /** The pre-round-10 column-CASE verdict — kept as the no-custom-expression
    * reference implementation the parity spec checks against.
    */
  private[graft] def qualityFailHof(c: Column, rules: QualityRules): Column = {
    val flags = qualityFlags(c, rules)
    flags.foldRight(lit(null).cast("string")) {
      case ((name, bad), acc) => when(bad, lit(name)).otherwise(acc)
    }
  }

  // ------------------------------------------------- vocabulary induction

  /** Corpus vocabulary: token → (tf = total occurrences, df = documents
    * containing it) — the first step of tokenizer/vocab induction over a
    * training corpus. The per-doc pre-aggregation gives map-side partial
    * combine on the (doc, token) key before the vocab-sized token shuffle,
    * and its output is the same frame [[tfidfTopTerms]] starts from.
    */
  def vocabulary(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String): org.apache.spark.sql.DataFrame = {
    val perDoc = docTokenCounts(docs, idCol, textCol)
    perDoc.groupBy("token")
      .agg(sum("tf").cast("long").as("tf"), count(lit(1)).as("df"))
  }

  /** Coverage curve of the top-N vocabulary: what fraction of the
    * corpus's token mass do the N most frequent tokens cover? The
    * tokenizer-design measure (how big must a vocab be before OOV mass
    * is negligible) and the Zipf sanity check on a new corpus.
    *
    * Scale shape: the full-vocab aggregation is the only corpus-sized
    * work; the top-N selection is TakeOrdered (distributed heap, no
    * global sort), and the cumulative window runs over the N surviving
    * rows — bounded by the constant, like the IVF centroid pulls. The
    * total token mass rides along as a single-row broadcast. Exact
    * BIGINT cumulative sums; coverage is one correctly-rounded IEEE
    * division per row.
    */
  def vocabCoverage(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, topN: Int): org.apache.spark.sql.DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    // ONE job: the total token mass rides IN-PLAN as a single-row
    // broadcast off the same vocabulary subtree (ReuseExchange collapses
    // the doubled agg — the round-14 trick; two separate driver pulls
    // cannot share an exchange and re-tokenized the corpus twice), then
    // the top-N cut collects and the rank / cumulative-sum tail runs on
    // the DRIVER over the ≤ topN rows (TakeOrderedAndProject upstream —
    // distributed heap, no global sort), returning a self-contained
    // LocalRelation. A window form needs a single-partition WindowExec;
    // Spark 4 folds any constant partitionBy key away
    // (EliminateWindowPartitions), so its no-partition WARN cannot be
    // silenced declaratively — and the local tail is strictly less work
    // than exchange+sort+window over the same ≤ topN rows.
    val v = vocabulary(docs, idCol, textCol).select("token", "tf")
    val withTotal = v
      .crossJoin(broadcast(v.agg(sum("tf").cast("long").as("__total"))))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(topN)
      .collect()
    val total = if (withTotal.isEmpty) 0L else withTotal.head.getLong(2)
    val top = withTotal
    var cum = 0L
    val rows = top.zipWithIndex.map { case (r, i) =>
      val tf = r.getLong(1)
      cum += tf
      // same rounding op Spark's round() applies (BigDecimal HALF_UP on
      // the shortest-repr double) — oracle arithmetic unchanged
      val coverage = java.math.BigDecimal.valueOf(cum.toDouble / total)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      org.apache.spark.sql.Row(i + 1, r.getString(0), tf, cum, coverage)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("token",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("tf",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cum_tf",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("coverage",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
  }

  /** Assign deterministic integer ids to a [[vocabulary]] (or any
    * token-frequency table): rank by tf desc, token asc — id 0 is the most
    * frequent token, exactly reproducible by any engine.
    *
    * NOT a global `row_number()` window — that moves the whole vocabulary
    * to one partition (WindowExec warns, and a web-scale vocab is 10^8+
    * rows). Instead: range-partition + sort by the rank order, then
    * `zipWithIndex` (per-partition counts + offsets, one extra tiny job) —
    * the distributed form of global ranking. Partition order IS rank
    * order, so ids match the window form exactly.
    *
    * Determinism across recomputes (executor loss, downstream reuse):
    * every step is a pure function of the input. Range boundaries are
    * sampled, but Spark's RangePartitioner seeds its reservoir sampling
    * from the partition index (byteswap32(idx)), so a recompute over the
    * same input re-draws the SAME boundaries; the within-partition sort
    * breaks all ties (tf desc, token asc is a total order on distinct
    * tokens). A round-5 variant pinned the frame with localCheckpoint
    * "for determinism" instead — the eager full-vocab materialization
    * cost 3x the whole operator and the pin was redundant (BENCH r05,
    * q_ext_vocab 0.65s -> 1.91s; reverted round 6).
    */
  def vocabIds(vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val sorted = vocab.select(col("token").cast("string"), col("tf").cast("long"))
      .repartitionByRange(col("tf").desc, col("token").asc)
      .sortWithinPartitions(col("tf").desc, col("token").asc)
    // zipWithIndex = one tiny count-per-partition job + offset arithmetic;
    // the projection to the bare token string keeps the boxed row narrow.
    sorted.select(col("token")).as[String].rdd
      .zipWithIndex()
      .toDF("token", "token_id")
  }

  /** Encode documents against a (token, token_id) table: each doc becomes
    * its token-id sequence in token order, out-of-vocabulary tokens as -1,
    * plus an OOV count — the bridge from vocabulary induction to sequence
    * packing. The id table broadcasts (vocabularies are MBs); work is one
    * explode + one aggregation keyed by doc id.
    */
  def encodeTokens(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String, ids: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val exploded = docs
      .select(col(idCol),
        posexplode(TextDedup.tokens(col(textCol))).as(Seq("__pos", "token")))
    exploded
      .join(broadcast(ids), Seq("token"), "left")
      .withColumn("token_id", coalesce(col("token_id"), lit(-1L)))
      .groupBy(idCol)
      .agg(
        transform(array_sort(collect_list(struct(col("__pos"), col("token_id")))),
          s => s.getField("token_id")).as("token_ids"),
        sum(when(col("token_id") === -1L, 1L).otherwise(0L)).as("n_oov"))
  }

  /** (doc, token, tf) counts — shared by [[vocabulary]] and
    * [[tfidfTopTerms]].
    */
  def docTokenCounts(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol), explode(TextDedup.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))

  /** Per-document top-k terms by tf-idf. `idfOf(df, n)` defaults to the
    * classic ln((n+1)/(df+1)); pass [[rationalIdf]] for a
    * transcendental-free variant whose doubles are bit-identical across
    * engines (libm log is not guaranteed correctly rounded — IEEE division
    * is), which is what the oracle-checked query uses.
    */
  def tfidfTopTerms(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, k: Int,
                    idfOf: (Column, Long) => Column = logIdf,
                    scoreDecimals: Int = 6): org.apache.spark.sql.DataFrame = {
    val n = docs.count()
    val perDoc = docTokenCounts(docs, idCol, textCol)
    val dfreq = perDoc.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("score").desc, col("token").asc)
    perDoc.join(dfreq, "token")
      .withColumn("score", round(col("tf") * idfOf(col("df"), n), scoreDecimals))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("score"),
        col("rank"))
  }

  val logIdf: (Column, Long) => Column =
    (df, n) => log(lit(n + 1.0) / (df + 1))

  val rationalIdf: (Column, Long) => Column =
    (df, n) => lit(n + 1.0) / (df + 1)

  // ----------------------------------------- data-driven language profiles

  import org.apache.spark.sql.DataFrame

  /** [[langProfiles]] as a (lang, marker) table — profiles are data, not
    * code, at scale.
    */
  def profilesTable(spark: org.apache.spark.sql.SparkSession,
                    profiles: Seq[(String, Seq[String])] = langProfiles): DataFrame = {
    import spark.implicits._
    profiles.flatMap { case (lang, ms) => ms.map(lang -> _) }.toDF("lang", "marker")
  }

  /** Data-driven language ID: documents explode to punctuation-stripped
    * tokens, broadcast-hash-join against the (lang, marker) profile table,
    * count per (doc, lang), argmax with ties to the alphabetically-first
    * language; no marker hit → "und".
    *
    * This is the scale path for rich profiles: a regex alternation
    * ([[langId]]) re-compiles thousands of markers into every row's match,
    * while a broadcast join is one hash probe per token and lets profiles
    * ship as data (updated without a code release). Matching differs from
    * [[langId]] deliberately: token equality after edge-punctuation
    * stripping, not substring word-boundary search.
    */
  def langIdFromProfiles(docs: DataFrame, idCol: String, textCol: String,
                         profiles: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(TextDedup.tokens(col(textCol))).as("__tok"))
      .withColumn("__tok", regexp_replace(col("__tok"), "^\\W+|\\W+$", ""))
    val scores = toks.join(broadcast(profiles), col("__tok") === col("marker"))
      .groupBy(col(idCol), col("lang")).agg(count(lit(1)).as("__score"))
    // Seeding a zero-score "und" row per doc turns the argmax into ONE
    // aggregation — no window sort and no docs⋈best join (which would be a
    // big-big sort-merge join at scale, the only SMJ this registry had).
    // min(struct(-score, lang)) = highest score, ties to the
    // alphabetically-first language; a real hit (score >= 1) always beats
    // the seeded und row (score 0).
    val seeded = scores.unionByName(
      docs.select(col(idCol), lit("und").as("lang"), lit(0L).as("__score")))
    seeded.groupBy(col(idCol))
      .agg(min(struct((-col("__score")).as("s"), col("lang").as("l"))).as("__best"))
      .select(col(idCol), col("__best.l").as("lang"))
  }

  // ------------------------------------------------------ script detection

  /** Unicode-script character classes (BMP literal ranges — the pattern
    * strings embed the boundary characters themselves, so the same
    * pattern text drives any RE2/Java-regex engine; astral planes
    * excluded to keep length() = code points in every engine). Declared
    * order is the [[dominantScript]] tie-break order.
    */
  val scriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "cyrillic" -> "[Ѐ-ӿ]",
    "greek" -> "[Ͱ-Ͽ]",
    "cjk" -> "[一-鿿]")

  /** Characters of `c` in the class: length minus length-after-removal —
    * one codegen'd regexp_replace per class, no explode.
    */
  def scriptCount(c: Column, rangePattern: String): Column =
    length(c) - length(regexp_replace(c, rangePattern, ""))

  /** Dominant script: argmax over [[scriptRanges]] counts, ties to the
    * earlier-declared script, zero everywhere → "none". Script mix is the
    * cheap first split of a multilingual crawl (routes documents to
    * per-script language ID / tokenizers before any model runs).
    */
  def dominantScript(c: Column): Column = {
    val counts = scriptRanges.map { case (name, p) => name -> scriptCount(c, p) }
    val allZero = counts.map(_._2 === 0).reduce(_ && _)
    // fixed-order argmax: the first script whose count is >= all later ones
    val cases = counts.tails.collect {
      case (name, cnt) +: rest if rest.nonEmpty =>
        (name, rest.map { case (_, other) => cnt >= other }.reduce(_ && _))
    }.toSeq
    val chain = cases.foldRight(lit(scriptRanges.last._1): Column) {
      case ((name, cond), els) => when(cond, lit(name)).otherwise(els)
    }
    when(allZero, lit("none")).otherwise(chain)
  }
}
