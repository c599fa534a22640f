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
}
