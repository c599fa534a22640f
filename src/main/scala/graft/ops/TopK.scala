package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopKExpressions

/** Per-group top-k rows via the bounded-heap aggregate
  * ([[graft.functions.TopKExpressions.TopKBy]]) instead of a
  * rank-window.
  *
  * The window form shuffles and sorts every row of every group; this
  * shape reduces each partition to <= k candidates per group map-side,
  * so the exchange carries O(|groups| x k) structs. Same answer
  * (deterministic: ord desc, payload asc is a total order), radically
  * different scaling — the window's per-group sort is also a skew
  * hazard (one giant group = one giant sort task); the heap is O(k)
  * state regardless of group size.
  */
object TopK {

  /** Top `k` payloads per group by `ord` descending (ties: smallest
    * payload wins). Output: groupCols ++ (rank starting at 1, payload,
    * ord), one row per kept entry.
    */
  def perGroupTopK(df: DataFrame, groupCols: Seq[String], ordCol: Column,
                   payloadCol: Column, k: Int,
                   rankName: String = "rank", payloadName: String = "payload",
                   ordName: String = "ord"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(TopKExpressions.top_k_by(ordCol, payloadCol, k).as("__top"))
      .select(groupCols.map(col) :+
        posexplode(col("__top")).as(Seq("__pos", "__e")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("__pos") + 1).cast("int").as(rankName),
        col("__e.payload").as(payloadName),
        col("__e.ord").as(ordName)): _*)
}
