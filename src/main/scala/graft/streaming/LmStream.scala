package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.NgramLm

/** Streaming bigram-LM quality scoring: score arriving documents against a
  * STATIC trained model ([[NgramLm.train]]) — the ingest-time fluency
  * filter (drop/route garbage before it reaches the corpus store), sibling
  * of [[LshStream]]'s near-dup tagger in the low-latency tier.
  *
  * Shape: the stream explodes to its bigrams (stateless, event time rides
  * along), LEFT stream-static joins attach the model counts (OOV pairs
  * score the add-one floor ln(1/V) instead of silently dropping — a batch
  * inner join would hide exactly the unseen mass a quality filter exists
  * to catch), and one watermarked window+doc aggregation reassembles the
  * per-document score. The only state is the open windows' partial sums —
  * bounded by the watermark horizon, not the stream length.
  *
  * Scale posture: the model frames are static tables — broadcast while
  * they fit, shuffled stream-static joins otherwise; a 100 TB-corpus
  * model should be count-pruned (drop cb==1 hapaxes) before serving,
  * which changes smoothing only at the floor the OOV path already
  * handles. Per-doc sums are exact BIGINTs, so a rescore of the same doc
  * in batch ([[NgramLm.withTermScaled]] + groupBy) reproduces the
  * streaming answer bit-for-bit.
  */
object LmStream {

  /** Score a streaming (idCol, tsCol, textCol) frame against `model`.
    * Emits (window, idCol, n_bigrams, ll_scaled, avg_ll) in append mode
    * once the watermark closes each window. Docs with <2 tokens emit
    * nothing (no bigrams — same contract as the batch scorer).
    */
  def scoreStream(stream: DataFrame, idCol: String, tsCol: String,
                  textCol: String, model: NgramLm.Model,
                  watermark: String = "10 minutes",
                  windowDuration: String = "1 hour"): DataFrame = {
    val big = NgramLm.docBigrams(
      stream.withWatermark(tsCol, watermark), idCol, textCol,
      keep = Seq(tsCol))
    NgramLm.withTermScaled(big, model)
      .groupBy(window(col(tsCol), windowDuration), col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("t").as("ll_scaled"))
      .withColumn("avg_ll",
        round(col("ll_scaled").cast("double") / col("n_bigrams")
          / NgramLm.LnScale, 6))
  }
}
