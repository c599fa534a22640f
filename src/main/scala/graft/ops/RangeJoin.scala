package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-equality range join: left rows matched to the right rows whose
  * `[startCol, endCol]` interval (same key) contains the left time — event
  * → session assignment, ts → validity-window lookups.
  *
  * Plan shape: because the key is an EQUALITY predicate, Catalyst plans a
  * hash join (broadcast or shuffled by the key) and applies the interval
  * bounds as a post-join filter — never the broadcast-nested-loop cross
  * product a pure interval predicate would force. At scale the join
  * co-partitions both sides on the key; per-key interval counts bound the
  * fan-out. For keyless interval joins, bucketize the time dimension into
  * a synthetic join key first (not provided here — every reference use
  * case carries a key).
  */
object RangeJoin {

  /** `how` ∈ inner/left_outer/…; bounds are inclusive on both ends by
    * default (`endExclusive = true` for [start, end) windows).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                timeCol: String, startCol: String, endCol: String,
                how: String = "inner", endExclusive: Boolean = false): DataFrame = {
    val keyCond = keys.map(k => left(k) === right(k)).reduce(_ && _)
    val upper: Column =
      if (endExclusive) left(timeCol) < right(endCol)
      else left(timeCol) <= right(endCol)
    val joined = left.join(right, keyCond && left(timeCol) >= right(startCol) && upper, how)
    // drop the right-side duplicates of the key columns
    keys.foldLeft(joined)((df, k) => df.drop(right(k)))
  }
}
