package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dsir

/** Streaming DSIR scoring: weigh arriving documents against a STATIC
  * fitted model ([[Dsir.fit]], persisted once) — the ingest-time data
  * selection filter (route off-target documents before they reach the
  * corpus store), sibling of [[LmStream]]'s fluency scorer in the
  * low-latency tier.
  *
  * Shape (the [[LmStream.scoreStream]] pattern): the stream explodes to
  * its unigram+bigram features (stateless, event time rides along), LEFT
  * stream-static joins attach the model counts — a feature the fitted
  * corpus never saw floors at add-one on both sides and scores the
  * corpus-ratio constant instead of silently dropping ([[Dsir
  * .withTermScaled]]) — and one watermarked window+doc aggregation
  * reassembles the per-document log-weight. The only state is the open
  * windows' partial sums, bounded by the watermark horizon.
  *
  * Scale posture: with the hashed model (`buckets = Some(b)`) the two
  * count frames are ≤ b rows — broadcast stream-static joins at ANY
  * corpus size; exact-ngram models are shuffled stream-static joins.
  * Per-doc sums are exact BIGINTs, so a batch rescore of the same
  * documents ([[Dsir.score]]) reproduces the streaming answer
  * bit-for-bit (spec-locked).
  */
object DsirStream {

  /** Score a streaming (idCol, tsCol, textCol) frame against `model`.
    * Emits (window, idCol, n_feats, logw_scaled, logw) in append mode
    * once the watermark closes each window. Token-free docs emit
    * nothing (no features — the batch scorer's contract). `buckets`
    * must match the model's fit-time setting.
    */
  def scoreStream(stream: DataFrame, idCol: String, tsCol: String,
                  textCol: String, model: Dsir.Model,
                  buckets: Option[Int] = None,
                  watermark: String = "10 minutes",
                  windowDuration: String = "1 hour"): DataFrame = {
    val feats0 = Dsir.docFeatures(
      stream.withWatermark(tsCol, watermark), idCol, textCol,
      keep = Seq(tsCol))
    val feats = buckets match {
      case Some(b) =>
        require(b > 0, s"buckets must be positive, got $b")
        feats0.withColumn("f", pmod(xxhash64(col("f")), lit(b.toLong)))
      case None => feats0
    }
    Dsir.withTermScaled(feats, model)
      .groupBy(window(col(tsCol), windowDuration), col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum("t").as("logw_scaled"))
      .withColumn("logw",
        round(col("logw_scaled").cast("double") / Dsir.LnScale, 6))
  }
}
