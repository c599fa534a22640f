package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.vec_cosine
import graft.ops.Similarity

/** Streaming-native embedding near-dup tagging: label each arriving vector
  * with its cosine-similar neighbors in a STATIC corpus, at per-event
  * latency — the embedding counterpart of [[LshStream]].
  *
  * Simpler than the MinHash tagger: sign-LSH assigns ONE bucket per vector
  * (no bands, no explode, no per-pair band dedup), so the plan is exactly
  * sign → stream-static bucket join → exact-cosine verify. Every operator
  * is stateless: append mode, no watermark, no state store (the spec
  * asserts `stateOperators` stays empty on a live query).
  *
  * Plan shape (the [[LshStream]] lessons, applied from the start): the
  * STREAM side is broadcast — a micro-batch is small by construction, so
  * the corpus index is only scanned and hash-probed per batch, never
  * shuffled, never collected; `lsh_sign` is non-nullable, so the bucket
  * join infers no isnotnull recompute filter; and the signature kernel is
  * the native constant-size-codegen expression at any nbits × dim.
  *
  * Recall is sign-LSH bucket recall: neighbors landing in a different
  * bucket are missed — tune nbits down (bigger buckets) or run the batch
  * [[Similarity.cosineNearDups]] path for the offline-complete sweep; use
  * [[Similarity.md5Hyperplanes]] when the bucket assignment must be
  * reproducible outside Spark.
  */
object VecStream {

  /** Build the static side once: (idCol, vecCol, __bucket) under `planes`.
    * Persist it (or write it bucketed by `__bucket` to the store) — it is
    * the index the stream joins against.
    */
  def corpusIndex(corpus: DataFrame, idCol: String, vecCol: String,
                  planes: Seq[Array[Double]]): DataFrame =
    corpus.select(col(idCol), col(vecCol),
      Similarity.lshSignature(col(vecCol), planes).as("__bucket"))

  /** [[corpusIndex]] with exact-duplicate collapse — the embedding
    * counterpart of [[LshStream.serveCollapsed]]: corpus rows with an
    * IDENTICAL vector are indexed once as their minimum-id representative
    * with a `__members` multiplicity column (ignored by the tagger,
    * available to consumers). An arriving near-dup of a pile of identical
    * embeddings then tags as one rep row per event, not pile-size output.
    * Opt-in for the same reason as the LSH variant: the reported pair set
    * changes to representatives; scores are unchanged (an identical
    * vector has identical cosine to every probe).
    */
  def corpusIndexCollapsed(corpus: DataFrame, idCol: String, vecCol: String,
                           planes: Seq[Array[Double]]): DataFrame =
    corpus.groupBy(col(vecCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("__members"))
      .select(col(idCol), col(vecCol),
        Similarity.lshSignature(col(vecCol), planes).as("__bucket"),
        col("__members"))

  /** Tag a vector stream against the corpus index: one output row per
    * (arriving vector, corpus vector) sharing a bucket with cosine >=
    * threshold. Works identically on a batch frame (the spec asserts
    * parity with a plain bucket-blocked self-join). Self-pairs
    * (stream id == corpus id) are filtered, so re-tagging a stored vector
    * won't report itself.
    *
    * Output: (stream_id, corpus_id, cosine), cosine rounded to
    * `scoreDecimals` like the batch searchers.
    */
  def nearDupTagStream(stream: DataFrame, corpusIndex: DataFrame,
                       idCol: String, vecCol: String,
                       planes: Seq[Array[Double]],
                       threshold: Double,
                       scoreDecimals: Int = 6): DataFrame = {
    val s = stream.select(col(idCol).as("stream_id"),
      col(vecCol).as("__sv"),
      Similarity.lshSignature(col(vecCol), planes).as("__bucket"))
    val c = corpusIndex.select(col(idCol).as("corpus_id"),
      col(vecCol).as("__cv"), col("__bucket"))
    broadcast(s).join(c, Seq("__bucket"))
      .filter(col("stream_id") =!= col("corpus_id"))
      .withColumn("cosine",
        round(vec_cosine(col("__sv"), col("__cv")), scoreDecimals))
      .filter(col("cosine") >= threshold)
      .select("stream_id", "corpus_id", "cosine")
  }
}
