package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.ops._




/** The Text tier of the extension-query registry —
  * split from the monolithic Qext.scala (round-17 verdict item 7, pure
  * mechanical move: bodies unchanged). [[Qext]] composes the tiers; see
  * its scaladoc for the registry/oracle policy.
  */
private[queries] trait QextTextTier { this: QextBase =>


  // ---------------------------------------------------- text analysis

  def qExtTokenCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        TextStats.wsTokenCount(col("text")).as("ws_tokens"),
        TextStats.bpeishTokenCount(col("text")).as("bpeish_tokens"))
      .orderBy("doc_id")


  def qExtQualityScore(spark: SparkSession, dir: String): DataFrame = {
    val metrics = TextStats.qualityMetrics(col("text"))
    t(spark, dir, "documents")
      .select(col("doc_id") +: metrics.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")
  }


  /** Model-based quality scoring ([[TextStats.qualityLogit]]): a linear
    * classifier's margin over the quality metrics, applied corpus-wide —
    * the engine half of trained quality filtering (training is offline;
    * weights are data). The logit's fixed-order multiply-add over the
    * rounded metrics is IEEE-exact cross-engine, hence the exact oracle;
    * `keep` thresholds at 0.
    */
  def qExtQualityLogit(spark: SparkSession, dir: String): DataFrame = {
    val logit = TextStats.qualityLogit(col("text"))
    t(spark, dir, "documents")
      .select(col("doc_id"), logit.as("logit"), (logit >= 0).as("keep"))
      .orderBy("doc_id")
  }


  /** Gopher-style quality-rule verdict per document: keep flag + first
    * violated rule. All comparisons are on unrounded int/int IEEE
    * divisions, so the verdicts are engine-portable — exact oracle.
    */
  def qExtQualityFilter(spark: SparkSession, dir: String): DataFrame =
    TextStats.qualityFilter(t(spark, dir, "documents"), "text")
      .select("doc_id", "keep", "fail_reason")
      .orderBy("doc_id")


  def qExtLangId(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextStats.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")


  /** Data-driven language ID ([[TextStats.langIdFromProfiles]]): exploded
    * tokens broadcast-joined to a (lang, marker) profile table — the scale
    * path when profiles are thousands of markers shipped as data.
    */
  def qExtLangIdProfile(spark: SparkSession, dir: String): DataFrame =
    TextStats.langIdFromProfiles(
        t(spark, dir, "documents"), "doc_id", "text",
        TextStats.profilesTable(spark))
      .orderBy("doc_id")


  /** Corpus vocabulary top-200 by total frequency (tokenizer-induction
    * first step); integer counts, fully deterministic order.
    */
  /** Unicode-canonical content hashes
    * ([[graft.functions.UnicodeExpressions]]): md5 over NFC-normalized
    * text — the canonicalization content-hash dedup needs so composed and
    * decomposed renderings of the same text collide. Oracle via DuckDB's
    * own `nfc_normalize`; the composed/decomposed collision semantics are
    * spec-covered (the synthetic corpus is ASCII).
    */
  def qExtUnicodeNfc(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        md5(graft.functions.UnicodeExpressions.nfc_normalize(col("text")))
          .as("norm_hash"))
      .orderBy("doc_id")


  /** Compression-ratio quality signal: the portable normative LZ
    * ([[TextStats.lzRatio]], round 11) — greedy LZ77 with every constant
    * (window, min/max match, candidate cap, bit costs) part of the
    * definition, so independent implementations must agree bit-for-bit.
    * Hash-checked against a THIRD, from-scratch implementation: the
    * DuckDB oracle runs the same normative parse as a recursive CTE over
    * character positions (list-lambda candidate scan; valid because the
    * corpus is ASCII — bytes == characters — which
    * OracleAssumptionsSpec asserts). LzRatioSpec keeps the second
    * (naive O(n·W) Scala) implementation locked bit-exact as well.
    *
    * The deflate sibling ([[TextStats.compressionRatio]]) moved out of
    * the hashed projection in round 15 (the round-14 verdict's call):
    * its output depends on the engine's zlib version, so no engine- and
    * library-independent oracle can exist for it. The operator stays —
    * CompressRatioSpec holds its semantics (band test, determinism,
    * signal direction vs lz_ratio) — but the correctness board carries
    * only columns an independent implementation can reproduce.
    * Rounded to 4 for a stable display; ordering column is doc_id alone.
    */
  def qExtCompressRatio(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        round(TextStats.lzRatio(col("text")), 4).as("lz_ratio"))
      .orderBy("doc_id")


  def qExtVocab(spark: SparkSession, dir: String): DataFrame =
    TextStats.vocabulary(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy(col("tf").desc, col("token").asc).limit(200)


  /** Per-doc top-3 terms by tf-idf with the rational idf variant
    * ([[TextStats.rationalIdf]] — IEEE division is correctly rounded, libm
    * log is not, so this is the cross-engine-exact form). df and n come
    * from the full corpus; output restricted to doc_id < 100.
    */
  def qExtTfidfTopk(spark: SparkSession, dir: String): DataFrame =
    TextStats.tfidfTopTerms(t(spark, dir, "documents"), "doc_id", "text",
        k = 3, idfOf = TextStats.rationalIdf)
      .filter(col("doc_id") < 100)
      .orderBy("doc_id", "rank")


  /** Gopher-style repetition signals ([[TextStats.dupNgramFraction]]):
    * fraction of token/2-gram/3-gram occurrences that repeat an earlier
    * one. Integer-over-integer IEEE divisions — exact oracle unrounded.
    */
  def qExtRepetition(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        TextStats.dupNgramFraction(col("text"), 1).as("dup_token_frac"),
        TextStats.dupNgramFraction(col("text"), 2).as("dup_2gram_frac"),
        TextStats.dupNgramFraction(col("text"), 3).as("dup_3gram_frac"))
      .orderBy("doc_id")


  /** Vocabulary encoding ([[TextStats.encodeTokens]]): docs (doc_id < 100)
    * as token-id sequences under the top-200 corpus vocabulary
    * ([[TextStats.vocabIds]] — rank by tf desc, token asc), OOV = -1.
    * Ids emitted as a joined string: engine array types stringify
    * differently in the driver compare, a CSV of longs does not.
    */
  def qExtVocabEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val ids = TextStats.vocabIds(
      TextStats.vocabulary(docs, "doc_id", "text")
        .orderBy(col("tf").desc, col("token").asc).limit(200))
    TextStats.encodeTokens(docs.filter(col("doc_id") < 100), "doc_id", "text", ids)
      .select(col("doc_id"),
        array_join(col("token_ids"), ",").as("token_ids"),
        col("n_oov"))
      .orderBy("doc_id")
  }


  def qExtFingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")


  /** PII detection + redaction ([[Pii.tag]]) over a deterministic synthetic
    * contact blob derived from customer keys (the documents corpus is
    * digit-free, so the PII patterns need manufactured digits to bite).
    * Every pattern family fires once per row — email, SSN, IPv4, phone —
    * and the oracle reproduces the same format_string + regex chain in
    * DuckDB (both engines run leftmost-first regex semantics; patterns are
    * shared verbatim from [[Pii.defaultPatterns]]).
    */
  def qExtPiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val contact = format_string(
      "Contact %s: call 3%02d-555-%04d, email cust%d@example.org, " +
        "host 10.%d.%d.%d, ssn %03d-%02d-%04d.",
      col("c_name"), k % 100, k % 10000, k, k % 256, (k * 7) % 256,
      (k * 13) % 256, k % 900 + 100, k % 89 + 10, k % 9000 + 1000)
    Pii.tag(
        t(spark, dir, "customer").select(k, contact.as("contact")), "contact")
      .select(col("c_custkey"),
        col("n_email").cast("long").as("n_email"),
        col("n_ssn").cast("long").as("n_ssn"),
        col("n_ip").cast("long").as("n_ip"),
        col("n_phone").cast("long").as("n_phone"),
        col("has_pii"), col("contact_redacted"))
      .orderBy("c_custkey")
  }


  /** Script detection ([[TextStats.dominantScript]]) over a mixed-script
    * fixture (the corpus is pure ASCII, so — like the PII and URL
    * fixtures — the script mix is manufactured from customer keys:
    * cyrillic/greek/CJK snippets long enough to outvote the latin name).
    * Counts are length-minus-stripped-length per class; the argmax is a
    * fixed-order CASE — both mirror token-for-token in SQL.
    */
  def qExtScriptDetect(spark: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val text = concat(col("c_name"),
      when(k % 4 === 1, lit(" привет мир"))
        .when(k % 4 === 2, lit(" γειά σου κόσμε"))
        .when(k % 4 === 3, lit(" 你好世界你好世界你好"))
        .otherwise(lit("")))
    val withText = t(spark, dir, "customer").select(k, text.as("text"))
    withText.select(
        k +:
        TextStats.scriptRanges.map { case (name, p) =>
          TextStats.scriptCount(col("text"), p).cast("long").as(s"n_$name")
        } :+
        TextStats.dominantScript(col("text")).as("script"): _*)
      .orderBy("c_custkey")
  }


  /** Bigram-LM quality scoring ([[NgramLm.avgLogProb]]): add-one-smoothed
    * average log-likelihood per document, self-trained on the corpus.
    * Integer nano-nat terms make the per-doc sums exact BIGINTs (the FP
    * double-aggregate hazard never arises); avg_ll is two correctly-
    * rounded IEEE divisions of the same integers on both engines.
    */
  def qExtLmScore(spark: SparkSession, dir: String): DataFrame =
    NgramLm.avgLogProb(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")


  /** DSIR importance weights ([[Dsir.importanceWeights]]): score every
    * document by how much more likely its unigram+bigram bag is under
    * the English subset's feature distribution than the whole corpus's —
    * the published importance-resampling selection signal. Same integer
    * nano-nat discipline as q_ext_lm_score; the hashed fixed-width form
    * is spec-locked (hash not in the oracle surface).
    */
  def qExtDsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dsir.importanceWeights(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text")
      .orderBy("doc_id")
  }


  /** Vocabulary coverage curve ([[TextStats.vocabCoverage]]): cumulative
    * token mass of the top-200 tokens — the tokenizer-sizing measure.
    * TakeOrdered + constant-bounded window; exact BIGINT cumsums.
    */
  def qExtVocabCoverage(spark: SparkSession, dir: String): DataFrame =
    TextStats.vocabCoverage(t(spark, dir, "documents"), "doc_id", "text",
        topN = 200)
      .orderBy("rank")


  /** Cross-source duplicate-overlap matrix ([[TextDedup.sourceOverlap]]).
    * The corpus has no natural cross-source exact dups, so — like the
    * PII/URL/script fixtures — shared boilerplate is manufactured
    * (doc_id % 5 == 0 collapses to one of three shared texts), giving
    * every source pair a non-trivial overlap count. The oracle is the
    * hash self-join the engine's set-explode replaces.
    */
  def qExtSourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val text2 = when(col("doc_id") % 5 === 0,
      concat(lit("shared boilerplate "), (col("doc_id") % 3).cast("string")))
      .otherwise(col("text"))
    TextDedup.sourceOverlap(docs.withColumn("text", text2), "source",
        TextDedup.contentHash(col("text")))
      .orderBy("source_a", "source_b")
  }


  /** Length-bucket padding-waste histogram ([[Packing.lengthBuckets]]):
    * power-of-2 token-length buckets with the padded-slot waste each
    * would cost — the measure that sizes bucketed batching against
    * concat packing. Integer-only bucketing (length(bin(n-1)) bits).
    */
  def qExtLengthBuckets(spark: SparkSession, dir: String): DataFrame =
    Packing.lengthBuckets(t(spark, dir, "documents"),
        TextStats.wsTokenCount(col("text")))
      .orderBy("bucket")


  /** PMI collocations ([[NgramLm.collocations]]): top adjacent pairs by
    * pointwise mutual information with a count floor — multi-word
    * expressions and tokenizer-merge candidates beyond raw frequency.
    * Integer nano-nat PMI, exact compare.
    */
  def qExtCollocations(spark: SparkSession, dir: String): DataFrame =
    NgramLm.collocations(t(spark, dir, "documents"), "text",
      minCount = 5L, topN = 100)


  /** TextStats.langProfiles as a SQL VALUES list for the profile-table
    * oracle (markers are fixed [a-z] words — no quoting hazards).
    */
  private def profileValuesSql: String =
    TextStats.langProfiles
      .flatMap { case (lang, ms) => ms.map(m => s"('$lang', '$m')") }
      .mkString(", ")


  /** PII oracle: same synthetic contact blob (DuckDB printf = Spark
    * format_string for these %-specs), counts/redaction generated from
    * [[Pii.defaultPatterns]] verbatim — the Java patterns use only
    * RE2-portable syntax (\b, \d, bounded reps), and both engines scan
    * leftmost-first, so counts and replacements agree byte-for-byte.
    */
  private def piiOracleSql: String = {
    val contact =
      "printf('Contact %s: call 3%02d-555-%04d, email cust%d@example.org, " +
        "host 10.%d.%d.%d, ssn %03d-%02d-%04d.', " +
        "c_name, c_custkey % 100, c_custkey % 10000, c_custkey, " +
        "c_custkey % 256, (c_custkey * 7) % 256, (c_custkey * 13) % 256, " +
        "c_custkey % 900 + 100, c_custkey % 89 + 10, c_custkey % 9000 + 1000)"
    val counts = Pii.defaultPatterns.map { case (name, re, _) =>
      s"len(regexp_extract_all(contact, '$re'))::BIGINT AS n_$name"
    }.mkString(",\n  ")
    val total = Pii.defaultPatterns.map { case (_, re, _) =>
      s"len(regexp_extract_all(contact, '$re'))"
    }.mkString(" + ")
    val redacted = Pii.defaultPatterns.foldLeft("contact") {
      case (acc, (_, re, ph)) => s"regexp_replace($acc, '$re', '$ph', 'g')"
    }
    s"""WITH src AS (
       |  SELECT c_custkey, $contact AS contact FROM customer
       |)
       |SELECT c_custkey,
       |  $counts,
       |  ($total) > 0 AS has_pii,
       |  $redacted AS contact_redacted
       |FROM src ORDER BY c_custkey""".stripMargin
  }

  private[queries] lazy val textTierQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ext_token_count" -> (qExtTokenCount _),
    "q_ext_quality_score" -> (qExtQualityScore _),
    "q_ext_quality_filter" -> (qExtQualityFilter _),
    "q_ext_quality_logit" -> (qExtQualityLogit _),
    "q_ext_lang_id" -> (qExtLangId _),
    "q_ext_lang_id_profile" -> (qExtLangIdProfile _),
    "q_ext_vocab" -> (qExtVocab _),
    "q_ext_compress_ratio" -> (qExtCompressRatio _),
    "q_ext_unicode_nfc" -> (qExtUnicodeNfc _),
    "q_ext_tfidf_topk" -> (qExtTfidfTopk _),
    "q_ext_fingerprint" -> (qExtFingerprint _),
    "q_ext_pii_redact" -> (qExtPiiRedact _),
    "q_ext_repetition" -> (qExtRepetition _),
    "q_ext_vocab_encode" -> (qExtVocabEncode _),
    "q_ext_script_detect" -> (qExtScriptDetect _),
    "q_ext_lm_score" -> (qExtLmScore _),
    "q_ext_dsir_weights" -> (qExtDsirWeights _),
    "q_ext_vocab_coverage" -> (qExtVocabCoverage _),
    "q_ext_source_overlap" -> (qExtSourceOverlap _),
    "q_ext_length_buckets" -> (qExtLengthBuckets _),
    "q_ext_collocations" -> (qExtCollocations _),
  )

  private[queries] lazy val textTierOracles: Map[String, String] = Map(
    "q_ext_pii_redact" -> piiOracleSql,
    "q_ext_compress_ratio" ->
      """WITH RECURSIVE p AS (
        |  SELECT doc_id, text AS s, length(text)::BIGINT AS n,
        |         1::BIGINT AS i, 0::BIGINT AS bits
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, s, n,
        |         i + CASE WHEN best_len IS NULL THEN 1 ELSE best_len END,
        |         bits + CASE WHEN best_len IS NULL THEN 9 ELSE 24 END
        |  FROM (
        |    SELECT doc_id, s, n, i, bits,
        |      list_max(
        |        list_transform(
        |          list_slice(cands, greatest(1, len(cands) - 127), len(cands)),
        |          j -> coalesce(
        |            nullif(list_position(
        |              list_transform(range(4, least(258, n - i + 1)),
        |                k -> substr(s, (j + k)::INT, 1) != substr(s, (i + k)::INT, 1)),
        |              true), 0) + 3,
        |            least(258, n - i + 1))
        |        )) AS best_len
        |    FROM (
        |      SELECT doc_id, s, n, i, bits,
        |        CASE WHEN i + 3 <= n THEN
        |          list_filter(range(greatest(1, i - 32768), i),
        |            j -> substr(s, j::INT, 4) = substr(s, i::INT, 4))
        |        ELSE [] END AS cands
        |      FROM p WHERE i <= n
        |    )
        |  )
        |)
        |SELECT doc_id,
        |       -- integer HALF-UP of the exact rational bits/(8n) at 4
        |       -- decimals: floor(x + 1/2) = (2*num + den) // (2*den).
        |       -- DuckDB's float round() took the decimal tie 2667/4000 =
        |       -- 0.66675 DOWN (its double sits just below the tie) where
        |       -- Spark's round (BigDecimal of the shortest repr, HALF_UP)
        |       -- goes UP — one sf0.001 doc diverged (round-20 root-cause;
        |       -- the LZ bits agreed exactly on every doc). For non-tie
        |       -- rationals the two agree: with n <= ~1e5 the rational is
        |       -- >= ~6e-10 from any tie, far beyond a double's half-ulp.
        |       CASE WHEN n = 0 THEN 1.0
        |            ELSE ((2 * bits * 10000 + 8 * n) // (16 * n)) / 10000.0
        |       END AS lz_ratio
        |FROM p WHERE i > n ORDER BY doc_id""".stripMargin,

    // Exact pairs via SQL-side prefix filtering (complete recall, see
    // ngramPairsPrefixCtes) — an independent blocking from the engine's
    // LSH, and tractable at every test SF unlike the all-pairs form.
    "q_ext_token_count" ->
      s"""SELECT doc_id,
         |  len(str_split($normSql, ' ')) AS ws_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS bpeish_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_ext_quality_score" ->
      s"""SELECT doc_id,
         |  length(text) AS n_chars,
         |  len(str_split($normSql, ' ')) AS n_tokens,
         |  round(length(regexp_replace($normSql, ' ', '', 'g'))::DOUBLE
         |        / len(str_split($normSql, ' ')), 4) AS mean_token_len,
         |  round(len(regexp_extract_all(text, '[.,;:!?''"()]'))::DOUBLE
         |        / length(text), 4) AS punct_ratio,
         |  round(len(regexp_extract_all(lower(text),
         |        '\\b(the|a|an|and|or|of|to|in|is|it)\\b'))::DOUBLE
         |        / len(str_split($normSql, ' ')), 4) AS stopword_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_ext_quality_logit" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    length(text) AS n_chars,
         |    len(str_split($normSql, ' ')) AS n_tokens,
         |    round(length(regexp_replace($normSql, ' ', '', 'g'))::DOUBLE
         |          / len(str_split($normSql, ' ')), 4) AS mean_token_len,
         |    round(len(regexp_extract_all(text, '[.,;:!?''"()]'))::DOUBLE
         |          / length(text), 4) AS punct_ratio,
         |    round(len(regexp_extract_all(lower(text),
         |          '\\b(the|a|an|and|or|of|to|in|is|it)\\b'))::DOUBLE
         |          / len(str_split($normSql, ' ')), 4) AS stopword_ratio
         |  FROM documents
         |), scored AS (
         |  SELECT doc_id,
         |    round(-1.0 + 0.0005 * n_chars + 0.002 * n_tokens
         |          + 0.08 * mean_token_len + (-4.0) * punct_ratio
         |          + 6.0 * stopword_ratio, 6) AS logit
         |  FROM m
         |)
         |SELECT doc_id, logit, logit >= 0 AS keep
         |FROM scored ORDER BY doc_id""".stripMargin,

    "q_ext_lang_id" ->
      """WITH scores AS (
        |  SELECT doc_id, lang,
        |    len(regexp_extract_all(lower(text), '\b(der|die|und|ist|nicht)\b')) AS s_de,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|is|not)\b')) AS s_en,
        |    len(regexp_extract_all(lower(text), '\b(el|la|de|es|que)\b')) AS s_es,
        |    len(regexp_extract_all(lower(text), '\b(le|la|et|est|que)\b')) AS s_fr,
        |    len(regexp_extract_all(lower(text), '\b(de|shi|le|bu|wo)\b')) AS s_zh
        |  FROM documents
        |)
        |SELECT doc_id, lang,
        |  CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
        |       WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
        |       WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
        |       WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
        |       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
        |       ELSE 'zh' END AS lang_pred
        |FROM scores ORDER BY doc_id""".stripMargin,

    // Same rule order as TextStats.qualityFlags; metrics are unrounded
    // IEEE divisions (identical bits both engines). Division-by-zero paths
    // are unreachable: an empty text has n_tokens = 1 ([""]), < 5, so the
    // first rule fires before any ratio is consulted.
    "q_ext_quality_filter" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    len(str_split(norm, ' ')) AS n_tokens,
         |    length(regexp_replace(norm, ' ', '', 'g'))::DOUBLE
         |      / len(str_split(norm, ' ')) AS mean_tok,
         |    len(regexp_extract_all(text, '[.,;:!?''"()]'))::DOUBLE
         |      / length(text) AS punct,
         |    len(regexp_extract_all(lower(text),
         |      '\\b(the|a|an|and|or|of|to|in|is|it)\\b'))::DOUBLE
         |      / len(str_split(norm, ' ')) AS stop
         |  FROM (SELECT doc_id, text, $normSql AS norm FROM documents)
         |), v AS (
         |  SELECT doc_id,
         |    CASE WHEN n_tokens < 5 THEN 'too_few_tokens'
         |         WHEN n_tokens > 100000 THEN 'too_many_tokens'
         |         WHEN mean_tok < 2.0 THEN 'mean_token_too_short'
         |         WHEN mean_tok > 12.0 THEN 'mean_token_too_long'
         |         WHEN punct > 0.25 THEN 'too_much_punct'
         |         WHEN stop < 0.01 THEN 'too_few_stopwords'
         |         ELSE NULL END AS fail_reason
         |  FROM m
         |)
         |SELECT doc_id, fail_reason IS NULL AS keep, fail_reason
         |FROM v ORDER BY doc_id""".stripMargin,

    // Profile-table language ID: token-equality scoring (edge punctuation
    // stripped), argmax with ties to the alphabetically-first language.
    "q_ext_lang_id_profile" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_replace(tok, '^\\W+|\\W+$$', '', 'g') AS tok FROM (
         |    SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok FROM documents)
         |), profiles(lang, marker) AS (
         |  VALUES $profileValuesSql
         |), scores AS (
         |  SELECT doc_id, lang, count(*) AS score
         |  FROM toks JOIN profiles ON tok = marker GROUP BY doc_id, lang
         |), best AS (
         |  SELECT doc_id, lang FROM (
         |    SELECT doc_id, lang,
         |           row_number() OVER (PARTITION BY doc_id
         |                              ORDER BY score DESC, lang ASC) AS rn
         |    FROM scores) WHERE rn = 1
         |)
         |SELECT d.doc_id, coalesce(b.lang, 'und') AS lang
         |FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q_ext_vocab" ->
      s"""SELECT tok AS token, count(*)::BIGINT AS tf,
         |       count(DISTINCT doc_id)::BIGINT AS df
         |FROM (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
         |      FROM documents)
         |GROUP BY tok ORDER BY tf DESC, token ASC LIMIT 200""".stripMargin,

    "q_ext_unicode_nfc" ->
      """SELECT doc_id, md5(nfc_normalize(text)) AS norm_hash
        |FROM documents ORDER BY doc_id""".stripMargin,

    // rates CTE == q_ext_mixture_weights; budgets floor(rate*20000);
    // admission is the same HUGEINT-exact windowed cumsum as the budget
    // family, boundary doc included
    "q_ext_tfidf_topk" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS token
         |  FROM documents
         |), perdoc AS (
         |  SELECT doc_id, token, count(*)::BIGINT AS tf
         |  FROM toks GROUP BY doc_id, token
         |), dfreq AS (
         |  SELECT token, count(*)::BIGINT AS df FROM perdoc GROUP BY token
         |), total AS (
         |  SELECT count(*)::DOUBLE AS n FROM documents
         |), scored AS (
         |  SELECT p.doc_id, p.token, p.tf, d.df,
         |         round(p.tf * ((total.n + 1) / (d.df + 1)), 6) AS score
         |  FROM perdoc p JOIN dfreq d ON p.token = d.token, total
         |), ranked AS (
         |  SELECT doc_id, token, tf, df, score,
         |         row_number() OVER (PARTITION BY doc_id
         |                            ORDER BY score DESC, token ASC) AS rank
         |  FROM scored
         |)
         |SELECT doc_id, token, tf, df, score, rank FROM ranked
         |WHERE rank <= 3 AND doc_id < 100
         |ORDER BY doc_id, rank""".stripMargin,

    "q_ext_fingerprint" ->
      s"""SELECT doc_id,
         |  md5(array_to_string(list_sort(list_distinct(str_split($normSql, ' '))), ' ')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    // Top-200 vocab ids (tf desc, token asc), tokens joined with pos to
    // preserve order, OOV -> -1; ids emitted as a CSV string.
    "q_ext_vocab_encode" ->
      s"""WITH vocab AS (
         |  SELECT tok AS token, count(*)::BIGINT AS tf
         |  FROM (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
         |        FROM documents)
         |  GROUP BY tok ORDER BY tf DESC, token ASC LIMIT 200
         |), ids AS (
         |  SELECT token,
         |         row_number() OVER (ORDER BY tf DESC, token ASC) - 1 AS token_id
         |  FROM vocab
         |), toks AS (
         |  SELECT doc_id,
         |         unnest(list_transform(t, (x, i) -> {'pos': i, 'token': x})) AS u
         |  FROM (SELECT doc_id, string_split($normSql, ' ') AS t
         |        FROM documents WHERE doc_id < 100)
         |), flat AS (
         |  SELECT doc_id, u.pos AS pos, u.token AS token FROM toks
         |)
         |SELECT k.doc_id,
         |       array_to_string(list(coalesce(ids.token_id, -1) ORDER BY k.pos), ',')
         |         AS token_ids,
         |       CAST(sum(CASE WHEN ids.token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_oov
         |FROM flat k LEFT JOIN ids ON k.token = ids.token
         |GROUP BY k.doc_id ORDER BY k.doc_id""".stripMargin,

    // (total - distinct) / total per n-gram size; n-gram lists mirror
    // TextStats.wordNgrams (EMPTY below n tokens — no whole-text fallback).
    "q_ext_repetition" ->
      s"""WITH tok AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents
         |), g AS (
         |  SELECT doc_id, toks,
         |    CASE WHEN len(toks) >= 2
         |      THEN list_transform(range(0, len(toks) - 1),
         |           i -> array_to_string(list_slice(toks, i + 1, i + 2), ' '))
         |      ELSE CAST([] AS VARCHAR[]) END AS g2,
         |    CASE WHEN len(toks) >= 3
         |      THEN list_transform(range(0, len(toks) - 2),
         |           i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
         |      ELSE CAST([] AS VARCHAR[]) END AS g3
         |  FROM tok
         |)
         |SELECT doc_id,
         |  CASE WHEN len(toks) = 0 THEN 0.0
         |       ELSE (len(toks) - len(list_distinct(toks)))::DOUBLE
         |            / len(toks)::DOUBLE END AS dup_token_frac,
         |  CASE WHEN len(g2) = 0 THEN 0.0
         |       ELSE (len(g2) - len(list_distinct(g2)))::DOUBLE
         |            / len(g2)::DOUBLE END AS dup_2gram_frac,
         |  CASE WHEN len(g3) = 0 THEN 0.0
         |       ELSE (len(g3) - len(list_distinct(g3)))::DOUBLE
         |            / len(g3)::DOUBLE END AS dup_3gram_frac
         |FROM g ORDER BY doc_id""".stripMargin,

    "q_ext_script_detect" -> {
      val mk = "c_name || (CASE WHEN c_custkey % 4 = 1 THEN ' привет мир' " +
        "WHEN c_custkey % 4 = 2 THEN ' γειά σου κόσμε' " +
        "WHEN c_custkey % 4 = 3 THEN ' 你好世界你好世界你好' ELSE '' END)"
      val counts = graft.ops.TextStats.scriptRanges.map { case (name, p) =>
        s"length(text) - length(regexp_replace(text, '$p', '', 'g')) AS n_$name"
      }.mkString(",\n        |       ")
      s"""WITH t AS (SELECT c_custkey, $mk AS text FROM customer),
         |c AS (SELECT c_custkey,
         |       $counts
         |FROM t)
         |SELECT c_custkey, n_latin, n_cyrillic, n_greek, n_cjk,
         |  CASE WHEN n_latin = 0 AND n_cyrillic = 0 AND n_greek = 0
         |            AND n_cjk = 0 THEN 'none'
         |       WHEN n_latin >= n_cyrillic AND n_latin >= n_greek
         |            AND n_latin >= n_cjk THEN 'latin'
         |       WHEN n_cyrillic >= n_greek AND n_cyrillic >= n_cjk
         |            THEN 'cyrillic'
         |       WHEN n_greek >= n_cjk THEN 'greek'
         |       ELSE 'cjk' END AS script
         |FROM c ORDER BY c_custkey""".stripMargin
    },

    // The full-outer-join form the engine's union+groupBy replaces.
    "q_ext_collocations" ->
      s"""WITH big AS (
         |  SELECT (u).a AS w1, (u).b AS w2 FROM (
         |    SELECT unnest(list_transform(range(1, len(ts)),
         |                  j -> {'a': ts[j], 'b': ts[j + 1]})) AS u
         |    FROM (SELECT list_filter(string_split($normSql, ' '),
         |                             x -> x <> '') AS ts FROM documents))
         |), cb AS (SELECT w1, w2, count(*)::BIGINT AS n_pair FROM big GROUP BY w1, w2),
         |cl AS (SELECT w1, count(*)::BIGINT AS n_left FROM big GROUP BY w1),
         |cr AS (SELECT w2, count(*)::BIGINT AS n_right FROM big GROUP BY w2),
         |n AS (SELECT count(*)::BIGINT AS n_total FROM big)
         |SELECT cb.w1, cb.w2, cb.n_pair,
         |       floor(1e9 * (ln(cb.n_pair) + ln((SELECT n_total FROM n))
         |                    - ln(cl.n_left) - ln(cr.n_right))
         |             + 0.5)::BIGINT AS pmi_scaled
         |FROM cb JOIN cl ON cb.w1 = cl.w1 JOIN cr ON cb.w2 = cr.w2
         |WHERE cb.n_pair >= 5
         |ORDER BY pmi_scaled DESC, cb.w1 ASC, cb.w2 ASC LIMIT 100""".stripMargin,

    // Integer nano-nat terms (floor(1e9·(ln(cb+1)−ln(cu+V)) + 0.5)) summed
    // as BIGINT — no double aggregate; avg_ll is two exact-operand IEEE
    // divisions, identical per-value on both engines.
    "q_ext_lm_score" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split($normSql, ' '),
         |                             x -> x <> '') AS ts
         |  FROM documents
         |), big AS (
         |  SELECT doc_id, (u).a AS w1, (u).b AS w2 FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(ts)),
         |                          j -> {'a': ts[j], 'b': ts[j + 1]})) AS u
         |    FROM toks)
         |), cb AS (SELECT w1, w2, count(*)::BIGINT AS cb FROM big GROUP BY w1, w2),
         |cu AS (SELECT w1, count(*)::BIGINT AS cu FROM big GROUP BY w1),
         |v AS (SELECT count(DISTINCT w)::BIGINT AS v FROM
         |        (SELECT unnest(ts) AS w FROM toks)),
         |terms AS (
         |  SELECT b.doc_id,
         |         floor(1e9 * (ln(cb.cb + 1) - ln(cu.cu + (SELECT v FROM v)))
         |               + 0.5)::BIGINT AS t
         |  FROM big b JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
         |             JOIN cu ON b.w1 = cu.w1)
         |SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(t)::BIGINT AS ll_scaled,
         |       round(sum(t)::BIGINT::DOUBLE / count(*) / 1e9, 6) AS avg_ll
         |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // DSIR importance weights: identical nano-nat term shape, computed
    // left-associated exactly as Dsir.termScaled writes it; the target
    // corpus is the lang='en' subset, smoothing space = raw features.
    "q_ext_dsir_weights" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang, list_filter(string_split($normSql, ' '),
         |                                   x -> x <> '') AS ts
         |  FROM documents
         |), feats AS (
         |  SELECT doc_id, lang, unnest(ts) AS f FROM toks
         |  UNION ALL
         |  SELECT doc_id, lang, (u).a || ' ' || (u).b AS f FROM (
         |    SELECT doc_id, lang, unnest(list_transform(range(1, len(ts)),
         |                          j -> {'a': ts[j], 'b': ts[j + 1]})) AS u
         |    FROM toks)
         |), cr AS (SELECT f, count(*)::BIGINT AS cr FROM feats GROUP BY f),
         |ct AS (SELECT f, count(*)::BIGINT AS ct FROM feats
         |       WHERE lang = 'en' GROUP BY f),
         |tot AS (SELECT sum(cr)::BIGINT AS nr, count(*)::BIGINT AS fcard FROM cr),
         |ntot AS (SELECT sum(ct)::BIGINT AS nt FROM ct),
         |terms AS (
         |  SELECT fe.doc_id,
         |         floor(1e9 * (ln(coalesce(ct.ct, 0) + 1)
         |                      - ln((SELECT nt FROM ntot) + (SELECT fcard FROM tot))
         |                      - ln(cr.cr + 1)
         |                      + ln((SELECT nr FROM tot) + (SELECT fcard FROM tot)))
         |               + 0.5)::BIGINT AS t
         |  FROM feats fe JOIN cr ON fe.f = cr.f LEFT JOIN ct ON fe.f = ct.f)
         |SELECT doc_id, count(*)::BIGINT AS n_feats, sum(t)::BIGINT AS logw_scaled,
         |       round(sum(t)::BIGINT::DOUBLE / 1e9, 6) AS logw
         |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Exact BIGINT cumulative sums over the top-200 ranks; coverage is
    // one IEEE division per row against the broadcast total.
    "q_ext_vocab_coverage" ->
      s"""WITH v AS (
         |  SELECT tok AS token, count(*)::BIGINT AS tf
         |  FROM (SELECT unnest(string_split($normSql, ' ')) AS tok
         |        FROM documents)
         |  GROUP BY tok
         |), tot AS (SELECT sum(tf)::BIGINT AS total FROM v),
         |top AS (SELECT token, tf FROM v ORDER BY tf DESC, token ASC LIMIT 200),
         |c AS (
         |  SELECT row_number() OVER (ORDER BY tf DESC, token ASC)::INT AS rank,
         |         token, tf,
         |         sum(tf) OVER (ORDER BY tf DESC, token ASC
         |                       ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tf
         |  FROM top)
         |SELECT rank, token, tf, cum_tf,
         |       round(cum_tf::DOUBLE / (SELECT total FROM tot), 6) AS coverage
         |FROM c ORDER BY rank""".stripMargin,

    // Same integer pow-2 bucketing (bits via length(bin(n-1)), shift on
    // BIGINT); the only FP step is one division per bucket.
    "q_ext_length_buckets" ->
      s"""WITH n AS (
         |  SELECT len(str_split($normSql, ' '))::BIGINT AS n FROM documents
         |), p AS (
         |  SELECT n, CASE WHEN n <= 1 THEN n
         |                 ELSE 1::BIGINT << length(bin(n - 1)) END AS bucket
         |  FROM n WHERE n > 0
         |), a AS (
         |  SELECT bucket, count(*)::BIGINT AS n_docs, sum(n)::BIGINT AS sum_tokens,
         |         max(n)::BIGINT AS max_tokens
         |  FROM p GROUP BY bucket)
         |SELECT bucket, n_docs, sum_tokens, max_tokens,
         |       n_docs * bucket AS padded_tokens,
         |       round((n_docs * bucket - sum_tokens)::DOUBLE
         |             / (n_docs * bucket) * 100, 4) AS waste_pct
         |FROM a ORDER BY bucket""".stripMargin,

    // The hash self-join form the engine's set-explode replaces; string
    // comparison is byte-lexicographic in both engines.
    "q_ext_source_overlap" ->
      s"""WITH d AS (
         |  SELECT source,
         |         CASE WHEN doc_id % 5 = 0
         |              THEN 'shared boilerplate ' || (doc_id % 3)
         |              ELSE text END AS text
         |  FROM documents
         |), h AS (SELECT DISTINCT md5($normSql) AS h, source FROM d)
         |SELECT a.source AS source_a, b.source AS source_b,
         |       count(*)::BIGINT AS n_shared
         |FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
         |GROUP BY source_a, source_b ORDER BY source_a, source_b""".stripMargin,

    // Ground truth derived independently of the history machinery: the
    // state live between the drops IS snapshot A (every January version
    // survives until the Feb 1 merge), so merge-then-asOf must
    // reconstruct it exactly.
  )
}
