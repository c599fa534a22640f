package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Timed multi-step funnel: the product-analytics staple the plain
  * funnel (`Qext.qExtEventFunnel`, signup→purchase, unbounded gap)
  * doesn't cover — each step must occur within `maxGapUs` of the
  * PREVIOUS step's chosen event, so conversion decays with both step
  * depth and latency ("signed up, clicked within 3 days, purchased
  * within 3 days of the click").
  *
  * Semantics (first-touch greedy, the convention of funnel tooling and
  * exactly reproducible in SQL): step 1 = the user's earliest
  * `steps(0)` event; step k = the earliest `steps(k-1)` event STRICTLY
  * after step k-1's time and within `maxGapUs` of it. Greedy is a
  * DEFINITION, not an optimization: a user who would only convert via a
  * later step-1 anchor counts as not-converted, in every engine the
  * same way (min-chains make the whole thing order-independent and
  * integer-exact over microsecond timestamps).
  *
  * Scale shape: per step one type-filtered scan joined co-keyed on the
  * user column against the |users|-bounded accumulator, then a
  * min-aggregate — K-1 user-keyed shuffles whose volume is (events of
  * that type + users), never the full event table twice. No windows, no
  * per-user sort; AQE reuses the user partitioning across the chain.
  *
  * Returns one row per user who reached step 1: (userCol, step1_us ..
  * stepK_us nullable, reached ∈ [1, K]).
  */
object Funnel {

  def timedFunnel(events: DataFrame, userCol: String, typeCol: String,
                  tsUsCol: String, steps: Seq[String],
                  maxGapUs: Long): DataFrame = {
    require(steps.size >= 2, s"need at least 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    require(maxGapUs > 0, s"maxGapUs must be positive, got $maxGapUs")
    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(col(tsUsCol)).as("step1_us"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = s"step${i}_us"
      val cur = s"step${i + 1}_us"
      val nxt = events.filter(col(typeCol) === st)
        .select(col(userCol), col(tsUsCol).as("__ts"))
        .join(acc.select(col(userCol), col(prev)), Seq(userCol))
        .filter(col("__ts") > col(prev) &&
          col("__ts") <= col(prev) + lit(maxGapUs))
        .groupBy(userCol).agg(min("__ts").as(cur))
      acc = acc.join(nxt, Seq(userCol), "left")
    }
    val reached = steps.indices.drop(1)
      .map(i => when(col(s"step${i + 1}_us").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    acc.withColumn("reached", reached)
  }
}
