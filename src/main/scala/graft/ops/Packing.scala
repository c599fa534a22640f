package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training
  * sequences — the step between a filtered corpus and a tokenized batch
  * (training consumes dense sequences of ~budget tokens, not ragged docs).
  *
  * This is OFFSET packing: docs line up in a deterministic order, and a
  * doc's sequence is `floor(tokens_before_it / budget)` — a document may
  * straddle a boundary and continue into the next sequence ("pack then
  * split at token level", the common pretraining layout). Exact greedy
  * no-straddle packing is a prefix-dependent sequential recurrence —
  * not expressible as a window function; its streaming counterpart is a
  * mapGroupsWithState fold. Offset packing is the relational, shuffle-
  * bounded form: one window per partition key.
  *
  * Scale posture: `partitionBy` keys the window — pack per shard/language
  * (as real pipelines do) and each partition sorts independently; an empty
  * `partitionBy` means one global sort, fine for a bounded corpus slice,
  * wrong for 100 TB.
  */
object Packing {

  /** Adds `n_tokens`, `seq_id` (sequence index within the partition), and
    * `seq_offset` (token offset of this doc within its sequence) under a
    * deterministic `orderBy` within each `partitionBy` group.
    */
  def packOffsets(df: DataFrame, tokens: Column, budget: Long,
                  partitionBy: Seq[Column], orderBy: Seq[Column]): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokens)
      .withColumn("__before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", floor(col("__before") / budget))
      .withColumn("seq_offset", col("__before") % budget)
      .drop("__before")
  }

  /** Per-sequence summary of [[packOffsets]] output: how full each packed
    * sequence is (the utilization metric a packing job reports).
    */
  def sequenceStats(packed: DataFrame, partitionBy: Seq[Column]): DataFrame =
    packed.groupBy(partitionBy :+ col("seq_id"): _*)
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
}
