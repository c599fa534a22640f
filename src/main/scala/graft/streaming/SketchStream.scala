package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SketchExpressions
import graft.ops.TextDedup

/** Streaming sketch tier: running corpus summaries whose STATE is the
  * mergeable sketch itself.
  *
  * [[runningTokenHeavyHitters]] keeps a live "what dominates the stream so
  * far" view: tokens explode per micro-batch, the Misra-Gries aggregate
  * ([[SketchExpressions.MisraGries]]) partials within the batch, and
  * Spark's streaming-aggregation state store holds the serialized summary
  * buffer between batches — the merge rule that makes the sketch correct
  * across partitions is exactly what makes it correct across TIME. No
  * watermark: the summary is bounded by construction (≤ capacity
  * counters), so state never grows with the stream; emit under
  * complete/update output mode.
  *
  * Guarantees across any batch arrival order (Agarwal et al., mergeable
  * summaries): counts are lower bounds short by at most
  * n_tokens/(capacity+1); exact while capacity covers the live vocabulary.
  */
object SketchStream {

  /** Running heavy-hitter summary of a streaming (or batch) document
    * frame: one row holding array<struct<token, cnt>> sorted by count
    * desc, token asc. Downstream: `explode` + rank in the sink query, or
    * [[graft.ops.Sketches.tokenHeavyHitters]] for the batch form.
    */
  def runningTokenHeavyHitters(docs: DataFrame, textCol: String,
                               capacity: Int): DataFrame =
    docs.select(explode(TextDedup.tokens(col(textCol))).as("token"))
      .agg(SketchExpressions.misra_gries(col("token"), capacity).as("hh"))

  /** Running per-group quantile summary
    * ([[graft.functions.QuantileSketchExpression.MrlQuantiles]]): the
    * compactor stack lives in the streaming-aggregation state store, so a
    * live "p50/p90/p99 document length per source" view costs
    * O(capacity * log n) state per group — never the stream. Same
    * bounded-state/no-watermark posture as the heavy-hitters summary:
    * exact while a group's total stays under capacity, deterministic
    * MRL error bound after.
    */
  def runningQuantiles(rows: DataFrame, groupCol: String, valueCol: String,
                       capacity: Int, probs: Seq[Double]): DataFrame =
    rows.groupBy(col(groupCol))
      .agg(graft.functions.QuantileSketchExpression
        .mrl_quantiles(col(valueCol), capacity, probs).as("quantiles"))

  /** Running per-group top-k ([[graft.functions.TopKExpressions.TopKBy]]):
    * a live "k best items per group so far" leaderboard with O(k) state
    * per group — the heap IS the streaming state, and because (ord desc,
    * payload asc) is a total order the running answer equals the batch
    * answer over everything seen, independent of batch boundaries.
    */
  def runningTopK(rows: DataFrame, groupCol: String, ordCol: String,
                  payloadCol: String, k: Int): DataFrame =
    rows.groupBy(col(groupCol))
      .agg(graft.functions.TopKExpressions
        .top_k_by(col(ordCol), col(payloadCol), k).as("top"))
}
