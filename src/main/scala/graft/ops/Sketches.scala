package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SketchExpressions

/** Bounded-state corpus summaries over the sketch aggregates
  * ([[graft.functions.SketchExpressions]]).
  */
object Sketches {

  /** Top-`topN` heavy-hitter tokens of a document corpus via Misra-Gries:
    * tokens explode map-side, each partition keeps at most `capacity`
    * counters, partials merge to one final summary — per-partition traffic
    * is O(capacity), independent of corpus size (contrast
    * [[TextStats.vocabulary]], which shuffles every distinct token).
    *
    * Counts are exact when `capacity` >= |distinct tokens| (no decrement
    * ever fires — the oracle-checked regime); otherwise they are lower
    * bounds short by at most n_tokens/(capacity+1), and only items above
    * that frequency are guaranteed present.
    */
  def tokenHeavyHitters(docs: DataFrame, textCol: String,
                        capacity: Int, topN: Int): DataFrame =
    docs.select(explode(TextDedup.tokens(col(textCol))).as("token"))
      .agg(SketchExpressions.misra_gries(col("token"), capacity).as("__hh"))
      .select(posexplode(col("__hh")).as(Seq("__pos", "__e")))
      .filter(col("__pos") < topN)
      .select(col("__e.token").as("token"), col("__e.cnt").as("cnt"))
}
