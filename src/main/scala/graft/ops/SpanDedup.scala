package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.ShingleExpressions

/** Duplicate-SPAN removal: cut every token k-gram occurrence that repeats
  * elsewhere in the corpus, keeping only the corpus-wide first occurrence —
  * the exact-substring deduplication step of an LLM training-data pipeline
  * (Lee et al., "Deduplicating Training Data Makes Language Models Better",
  * ACL 2022: memorized spans repeat verbatim across otherwise-distinct
  * pages; document-level dedup never fires because the surrounding text
  * differs, and line-level dedup ([[LineDedup]]) only catches spans that
  * happen to be whole lines).
  *
  * The reference implementation builds a corpus-wide suffix array — a
  * fundamentally single-machine design (shared-memory random access over
  * the whole concatenated corpus). The distributed re-expression here is
  * the fixed-k rolling-window form: every k-token window is a candidate
  * span, windows are matched corpus-wide by hash, and every occurrence
  * except the global first is cut. Fixed k trades the paper's
  * maximal-match lengths for a fully relational, linear, skew-proof plan;
  * runs longer than k are still removed in full, because every k-window
  * inside a repeated run is itself a repeated k-gram (a run of L >= k
  * duplicated tokens is covered by its L-k+1 duplicated windows).
  *
  * Scale posture — everything is linear and nothing windows over a
  * skewed partition:
  *  - ONE explode into (doc, pos, md5(gram)) rows, persisted (the table
  *    feeds both the stats aggregation and the join-back; without the
  *    persist Catalyst re-tokenizes the corpus for each use).
  *  - Duplicate detection is a two-stage hash aggregation keyed by the
  *    32-byte gram hash (map-side partial combine). The corpus-wide
  *    "first" occurrence is `min(struct(doc, pos))` — an ALGEBRAIC
  *    aggregate, deliberately not `row_number() OVER (PARTITION BY
  *    gram)`: a boilerplate pile makes one gram carry millions of
  *    occurrences, which a rank window funnels into one task while a
  *    min-aggregate combines map-side.
  *  - Occurrence→position expansion explodes only the DROPPED mass (×k),
  *    then one distinct; the final rebuild is the [[LineDedup]] shape —
  *    an (id, pos)-keyed equi-join of unique keys against unique keys
  *    (no blowup possible) and one reassembly aggregation keyed by doc.
  *    The per-doc HOF alternative (join a covered-positions array and
  *    `filter` tokens by `array_contains`) was rejected: membership is a
  *    linear scan, so a fully-duplicated T-token document costs O(T^2)
  *    in one task.
  */
object SpanDedup {

  /** Strict k-windows of the token array: positions 0..len-k, EMPTY for
    * documents shorter than k tokens (unlike [[TextDedup.shingles]], which
    * falls back to the whole text — a short document is doc-level dedup's
    * job, not a span).
    */
  private def strictGrams(toks: Column, k: Int): Column =
    when(size(toks) >= k, ShingleExpressions.shingle_windows(toks, k))
      .otherwise(array().cast("array<string>"))

  /** One row per k-gram occurrence: `idCol`, `gpos` (0-based token position
    * of the window start), `gram_hash` (md5 of the space-joined window —
    * fixed 32 bytes into the shuffle regardless of k).
    */
  def spanOccurrences(docs: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame = {
    require(k >= 2, s"span width must be >= 2, got $k")
    docs
      .select(col(idCol),
        posexplode(strictGrams(TextDedup.tokens(col(textCol)), k))
          .as(Seq("gpos", "__gram")))
      .select(col(idCol), col("gpos"), md5(col("__gram")).as("gram_hash"))
  }

  /** The duplicated-span report: one row per k-gram repeated at least
    * `minCount` times corpus-wide, with its occurrence count and the
    * corpus-wide first occurrence (minimum `(idCol, gpos)`), which
    * [[dedupSpans]] keeps.
    */
  def duplicateSpans(occ: DataFrame, idCol: String,
                     minCount: Long = 2): DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    occ.groupBy("gram_hash")
      .agg(count(lit(1)).as("n_occurrences"),
        min(struct(col(idCol), col("gpos"))).as("__first"))
      .filter(col("n_occurrences") >= minCount)
      .select(col("gram_hash"), col("n_occurrences"),
        col("__first").getField(idCol).as("first_" + idCol),
        col("__first").getField("gpos").as("first_gpos"))
  }

  /** Rebuild every document with its repeated spans cut: one row per input
    * document with `idCol`, the deduplicated text (`outCol` — space-joined
    * surviving tokens in original order; null iff the input text was null),
    * `n_tokens` (input token count, 0 for null text) and `n_dropped`
    * (tokens removed). A token is removed iff it lies inside any
    * occurrence of a >= `minCount`-repeated k-gram other than that gram's
    * corpus-wide first occurrence; the first occurrence always survives
    * its own gram, though an overlapping dropped occurrence of a
    * DIFFERENT gram may still cut part of it (position-union semantics —
    * deterministic, and strictly closer to the paper's "remove all but
    * one copy" than guarding kept windows would be).
    */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
                 k: Int = 8, minCount: Long = 2,
                 outCol: String = "text_spandedup"): DataFrame =
    dedupSpansManaged(docs, idCol, textCol, k, minCount, outCol).df

  /** [[dedupSpans]] with a [[Managed]] handle over the persisted occurrence
    * table (it feeds both the duplicate-stats aggregation and the
    * join-back; see the class doc for lifecycle).
    */
  def dedupSpansManaged(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 8, minCount: Long = 2,
                        outCol: String = "text_spandedup"): Managed = {
    val occ = Managed.ensurePersisted(
      spanOccurrences(docs, idCol, textCol, k), StorageLevel.MEMORY_AND_DISK)
    val dup = duplicateSpans(occ, idCol, minCount)
    val dropped = occ
      .join(dup, "gram_hash")
      .filter(!(col(idCol) === col("first_" + idCol) &&
        col("gpos") === col("first_gpos")))
    val covered = dropped
      .select(col(idCol),
        explode(sequence(col("gpos"), col("gpos") + lit(k - 1))).as("__tp"))
      .distinct()
      .withColumn("__cut", lit(true))
    val tokRows = docs.select(col(idCol),
      posexplode_outer(TextDedup.tokens(col(textCol))).as(Seq("__tp", "__tok")))
    val flagged = tokRows
      .join(covered, Seq(idCol, "__tp"), "left")
      .withColumn("__cut", coalesce(col("__cut"), lit(false)))
    val rebuilt = flagged.groupBy(idCol)
      .agg(
        when(count(col("__tok")) > 0,
          array_join(
            transform(
              array_sort(collect_list(when(!col("__cut"),
                struct(col("__tp").as("p"), col("__tok").as("t"))))),
              s => s.getField("t")),
            " "))
          .otherwise(lit(null).cast("string")).as(outCol),
        count(col("__tok")).as("n_tokens"),
        sum(when(col("__cut"), 1L).otherwise(0L)).as("n_dropped"))
    new Managed(rebuilt, Seq(occ))
  }
}
