package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Last-touch attribution: credit each conversion event to the most
    * recent touch event (any of `touchTypes`) STRICTLY before it and
    * within `windowUs` — the standard marketing-attribution primitive
    * (first-touch is the same shape with min instead of max). Ties on
    * timestamp break to the LARGEST tie-break value (deterministic;
    * max_by over the (ts, tieBreak) pair), so the whole credit
    * assignment is an exact function of the data.
    *
    * Scale shape: conversions × touches join co-keyed on the user column
    * with the window predicate as a join-side filter — volume is the
    * per-user (conversions × in-window touches) pair set, bounded by
    * activity locality, never |events|²; one groupBy on the conversion
    * key picks the winner. Unattributed conversions (no in-window touch)
    * are kept with null credit — the "organic" bucket every attribution
    * report needs.
    *
    * Returns (userCol, conv_us, conv_id, touch_us, touch_id, touch_type)
    * — one row per conversion event.
    */
  def lastTouchAttribution(events: DataFrame, userCol: String,
                           typeCol: String, tsUsCol: String, idCol: String,
                           convertType: String, touchTypes: Seq[String],
                           windowUs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convertType),
      "convertType must not be a touch type")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val conv = events.filter(col(typeCol) === convertType)
      .select(col(userCol), col(tsUsCol).as("conv_us"),
        col(idCol).as("conv_id"))
    val touch = events.filter(col(typeCol).isInCollection(touchTypes))
      .select(col(userCol), col(tsUsCol).as("__t_us"),
        col(idCol).as("__t_id"), col(typeCol).as("__t_type"))
    // ONE left join + ONE aggregate: the window predicate moves inside
    // the max (a null struct when out-of-window or no touch at all —
    // max ignores nulls, organic conversions surface as null credit), so
    // no join-back is needed to keep them; the shuffle_hash hint keeps
    // the user-keyed join off the SortMergeJoin fallback (the touch side
    // is event-scale — never broadcastable; co-keyed hash is the shape)
    conv.join(touch.hint("shuffle_hash"), Seq(userCol), "left")
      .groupBy(col(userCol), col("conv_us"), col("conv_id"))
      .agg(max(when(
        col("__t_us") < col("conv_us") &&
          col("__t_us") >= col("conv_us") - lit(windowUs),
        struct(col("__t_us"), col("__t_id"), col("__t_type")))).as("__w"))
      .select(col(userCol), col("conv_us"), col("conv_id"),
        col("__w.__t_us").as("touch_us"), col("__w.__t_id").as("touch_id"),
        col("__w.__t_type").as("touch_type"))
  }

  /** First-touch attribution: [[lastTouchAttribution]]'s mirror — each
    * conversion credits the EARLIEST in-window touch (min over the
    * (ts, id, type) struct: earliest ts, ties to the smallest id — the
    * deterministic mirror of last-touch's largest-id rule). Same one
    * join + one aggregate shape, same organic null-credit bucket.
    */
  def firstTouchAttribution(events: DataFrame, userCol: String,
                            typeCol: String, tsUsCol: String, idCol: String,
                            convertType: String, touchTypes: Seq[String],
                            windowUs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convertType),
      "convertType must not be a touch type")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val conv = events.filter(col(typeCol) === convertType)
      .select(col(userCol), col(tsUsCol).as("conv_us"),
        col(idCol).as("conv_id"))
    val touch = events.filter(col(typeCol).isInCollection(touchTypes))
      .select(col(userCol), col(tsUsCol).as("__t_us"),
        col(idCol).as("__t_id"), col(typeCol).as("__t_type"))
    conv.join(touch.hint("shuffle_hash"), Seq(userCol), "left")
      .groupBy(col(userCol), col("conv_us"), col("conv_id"))
      .agg(min(when(
        col("__t_us") < col("conv_us") &&
          col("__t_us") >= col("conv_us") - lit(windowUs),
        struct(col("__t_us"), col("__t_id"), col("__t_type")))).as("__w"))
      .select(col(userCol), col("conv_us"), col("conv_id"),
        col("__w.__t_us").as("touch_us"), col("__w.__t_id").as("touch_id"),
        col("__w.__t_type").as("touch_type"))
  }

  /** Multi-touch attribution: one row per (conversion, in-window touch)
    * with integer basis-point credit under TWO normative models —
    * `credit_bp_linear` (each of n touches gets `10000 div n`, the
    * remainder to the LAST touch) and `credit_bp_position` (U-shaped:
    * n=1 → 10000; n=2 → 5000/5000; n≥3 → first 4000, middles
    * `2000 div (n-2)` each, last 4000 plus the middle remainder). The
    * remainder-to-last rule is part of the DEFINITION: floor division is
    * identical in every engine, so credits sum to exactly 10000 per
    * conversion and the whole report is hash-exact cross-engine —
    * fractional credit models are partition-order-dependent the moment
    * doubles enter a sum.
    *
    * Scale shape: the same user-keyed hinted hash join as
    * [[lastTouchAttribution]] (pair volume = per-user conversions ×
    * in-window touches), then ONE conversion-keyed window (row_number +
    * count share it) — conversion ids are unique, so the window
    * partition is per-conversion-bounded, immune to user skew. Organic
    * conversions (no in-window touch) arrive via a second anti-join
    * branch with pos=0, n_touches=0, full 10000 credit in both models.
    *
    * Returns (userCol, conv_us, conv_id, touch_us, touch_id, touch_type,
    * pos, n_touches, credit_bp_linear, credit_bp_position).
    */
  def multiTouchAttribution(events: DataFrame, userCol: String,
                            typeCol: String, tsUsCol: String, idCol: String,
                            convertType: String, touchTypes: Seq[String],
                            windowUs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convertType),
      "convertType must not be a touch type")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val conv = events.filter(col(typeCol) === convertType)
      .select(col(userCol), col(tsUsCol).as("conv_us"),
        col(idCol).as("conv_id"))
    val touch = events.filter(col(typeCol).isInCollection(touchTypes))
      .select(col(userCol).as("__t_user"), col(tsUsCol).as("__t_us"),
        col(idCol).as("__t_id"), col(typeCol).as("__t_type"))
    val inWindow = conv(userCol) === col("__t_user") &&
      col("__t_us") < conv("conv_us") &&
      col("__t_us") >= conv("conv_us") - lit(windowUs)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("__t_us"), col("__t_id"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id"))
    val credited = conv
      .join(touch.hint("shuffle_hash"), inWindow)
      .withColumn("pos", row_number().over(wOrd).cast("long"))
      .withColumn("n_touches", count(lit(1)).over(wAll))
      .withColumn("credit_bp_linear",
        when(col("pos") === col("n_touches"),
          lit(10000L) - (col("n_touches") - 1) *
            expr("10000 div n_touches"))
          .otherwise(expr("10000 div n_touches")))
      .withColumn("credit_bp_position",
        when(col("n_touches") === 1, lit(10000L))
          .when(col("n_touches") === 2, lit(5000L))
          .when(col("pos") === 1, lit(4000L))
          .when(col("pos") === col("n_touches"),
            lit(6000L) - (col("n_touches") - 2) *
              expr("2000 div (n_touches - 2)"))
          .otherwise(expr("2000 div (n_touches - 2)")))
      .select(col(userCol), col("conv_us"), col("conv_id"),
        col("__t_us").as("touch_us"), col("__t_id").as("touch_id"),
        col("__t_type").as("touch_type"), col("pos"), col("n_touches"),
        col("credit_bp_linear"), col("credit_bp_position"))
    val organic = conv
      .join(touch.hint("shuffle_hash"), inWindow, "left_anti")
      .select(col(userCol), col("conv_us"), col("conv_id"),
        lit(null).cast("long").as("touch_us"),
        lit(null).cast("long").as("touch_id"),
        lit(null).cast("string").as("touch_type"),
        lit(0L).as("pos"), lit(0L).as("n_touches"),
        lit(10000L).as("credit_bp_linear"),
        lit(10000L).as("credit_bp_position"))
    credited.unionByName(organic)
  }

  /** Time-decay attribution: one row per (conversion, in-window touch)
    * with integer basis-point credit under a NORMATIVE exponential-decay
    * model — the recency-weighted middle ground between last-touch
    * (all credit to the newest) and linear (age-blind). The model is
    * defined in integers so every engine reproduces it bit-for-bit:
    *
    *   halvings h = (conv_us − touch_us) div halfLifeUs   (age in half-lives)
    *   weight   w = 10000 >> min(h, 13)                   (floor halving, ≥1)
    *   credit_i   = (10000 · w_i) div Σw, remainder to the LAST touch
    *
    * The remainder-to-last rule and the 13-halving floor (weight never
    * reaches 0, so an in-window touch never silently loses its row) are
    * part of the DEFINITION, exactly the [[multiTouchAttribution]]
    * discipline — fractional exponentials would be partition-order-
    * dependent the moment doubles enter a sum.
    *
    * Scale shape: identical to [[multiTouchAttribution]] — the user-keyed
    * hinted hash join, then ONE conversion-keyed window pass (row_number,
    * count, and the weight sum share it). Organic conversions surface with
    * pos 0 / full credit.
    *
    * Returns (userCol, conv_us, conv_id, touch_us, touch_id, touch_type,
    * pos, n_touches, halvings, weight, credit_bp_decay).
    */
  def timeDecayAttribution(events: DataFrame, userCol: String,
                           typeCol: String, tsUsCol: String, idCol: String,
                           convertType: String, touchTypes: Seq[String],
                           windowUs: Long, halfLifeUs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convertType),
      "convertType must not be a touch type")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    require(halfLifeUs > 0, s"halfLifeUs must be positive, got $halfLifeUs")
    val conv = events.filter(col(typeCol) === convertType)
      .select(col(userCol), col(tsUsCol).as("conv_us"),
        col(idCol).as("conv_id"))
    val touch = events.filter(col(typeCol).isInCollection(touchTypes))
      .select(col(userCol).as("__t_user"), col(tsUsCol).as("__t_us"),
        col(idCol).as("__t_id"), col(typeCol).as("__t_type"))
    val inWindow = conv(userCol) === col("__t_user") &&
      col("__t_us") < conv("conv_us") &&
      col("__t_us") >= conv("conv_us") - lit(windowUs)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("__t_us"), col("__t_id"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id"))
    val credited = conv
      .join(touch.hint("shuffle_hash"), inWindow)
      .withColumn("halvings",
        least(expr(s"(conv_us - __t_us) div ${halfLifeUs}L"), lit(13L)))
      .withColumn("weight", expr("shiftright(10000L, cast(halvings AS INT))"))
      .withColumn("pos", row_number().over(wOrd).cast("long"))
      .withColumn("n_touches", count(lit(1)).over(wAll))
      .withColumn("__wsum", sum(col("weight")).over(wAll))
      // floored share for every touch, then the LAST touch absorbs the
      // flooring remainder: 10000 − Σ others' floored shares — expressed
      // as 10000 − Σ all + own so the three aggregates share one window
      .withColumn("__c", expr("10000L * weight div __wsum"))
      .withColumn("__csum", sum(col("__c")).over(wAll))
      .withColumn("credit_bp_decay",
        when(col("pos") === col("n_touches"),
          lit(10000L) - col("__csum") + col("__c"))
          .otherwise(col("__c")))
      .select(col(userCol), col("conv_us"), col("conv_id"),
        col("__t_us").as("touch_us"), col("__t_id").as("touch_id"),
        col("__t_type").as("touch_type"), col("pos"), col("n_touches"),
        col("halvings"), col("weight"), col("credit_bp_decay"))
    val organic = conv
      .join(touch.hint("shuffle_hash"), inWindow, "left_anti")
      .select(col(userCol), col("conv_us"), col("conv_id"),
        lit(null).cast("long").as("touch_us"),
        lit(null).cast("long").as("touch_id"),
        lit(null).cast("string").as("touch_type"),
        lit(0L).as("pos"), lit(0L).as("n_touches"), lit(0L).as("halvings"),
        lit(0L).as("weight"), lit(10000L).as("credit_bp_decay"))
    credited.unionByName(organic)
  }

  /** Top event paths (k-step sequence mining by support): every
    * length-`k` window of CONSECUTIVE events in a user's (ts, tie-break)
    * order is one path occurrence; paths rank by total occurrences —
    * "what do users actually do", the navigation/behavior-mining
    * counterpart of the funnel's "did they do THIS".
    *
    * Scale shape: one user-keyed sort window with k-1 lead() columns
    * (the same single exchange the sessionize family pays — leads all
    * share one window), a partial-combined groupBy on the path, and a
    * TakeOrdered top-N (bounded heaps, no global sort). Deterministic
    * ranking: occurrences desc, then path lexicographically.
    *
    * Returns (path — the " > "-joined type sequence, n_occurrences),
    * topN rows.
    */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
               tsUsCol: String, tieBreak: Column, k: Int,
               topN: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsUsCol), col("__tb"))
    val withLeads = (1 until k).foldLeft(
      events.select(col(userCol), col(typeCol), col(tsUsCol),
        tieBreak.as("__tb"))) { (df, i) =>
      df.withColumn(s"__n$i", lead(col(typeCol), i).over(w))
    }
    val path = concat_ws(" > ",
      col(typeCol) +: (1 until k).map(i => col(s"__n$i")): _*)
    withLeads
      .filter((1 until k).map(i => col(s"__n$i").isNotNull).reduce(_ && _))
      .select(path.as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("path").asc)
      .limit(topN)
  }
}
