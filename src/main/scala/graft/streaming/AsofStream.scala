package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterparts of [[graft.ops.AsofJoin]] — enrich events with
  * the latest at-or-before right-side version as they arrive.
  *
  * Two shapes for two dim regimes:
  *
  *  - [[asofEnrich]] (stream-static): the dim's version history per key is
  *    collapsed batch-side into ONE sorted array column and broadcast; the
  *    as-of match is a pure array expression on the stream side. No state,
  *    no watermark, exact per event — the right default whenever the
  *    versioned dim fits the broadcast threshold (effective-dated lookup
  *    tables practically always do).
  *  - [[asofStream]] (stream-stream): right-side updates arrive AS a
  *    stream; flatMapGroupsWithState holds the latest right row per key.
  *    Exact when arrival order respects event time across micro-batches
  *    (within-batch disorder is handled by sorting); a left event arriving
  *    after a later-timestamped right from an earlier batch takes the
  *    processing-time view — the standard low-latency enrichment
  *    trade-off, stated rather than hidden.
  */
object AsofStream {

  /** Stream-static as-of enrichment: each `stream` row gains `payload`
    * columns from the `dim` row with the greatest `rightTime <=
    * leftTime` for its `keys` (null when none precedes — same contract as
    * [[graft.ops.AsofJoin.asofJoin]], including the atomic whole-row
    * match). Works identically on batch frames, which is how the spec
    * proves parity with the batch operator.
    */
  def asofEnrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
                 leftTime: String, rightTime: String,
                 payload: Seq[String]): DataFrame = {
    require(payload.forall(p => !stream.columns.contains(p)),
      s"payload columns ${payload.filter(stream.columns.contains)} collide with stream columns")
    val versions = dim
      .filter(col(rightTime).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(
        struct(col(rightTime).as("__vt") +: payload.map(col): _*)))
        .as("__versions"))
    val matched = try_element_at(
      filter(col("__versions"), v => v.getField("__vt") <= col(leftTime)),
      lit(-1))
    val joined = stream.join(broadcast(versions), keys, "left")
      .withColumn("__asof_row", matched)
    payload.foldLeft(joined) { (df, p) =>
      df.withColumn(p, col("__asof_row").getField(p))
    }.drop("__versions", "__asof_row")
  }

  /** One interleaved as-of input row: rights are dim-version updates
    * (`is_right = true`, carrying `payload`), lefts are events to enrich.
    */
  final case class Tick(key: Long, ts: Long, seq: Long, is_right: Boolean,
                        payload: Long)

  /** A left tick enriched with the latest at-or-before right payload (None
    * when no right preceded it).
    */
  final case class Enriched(key: Long, ts: Long, seq: Long,
                            payload: Option[Long], payload_ts: Option[Long])

  /** Per-key state of [[asofStream]]: the latest right row seen (public —
    * Spark's state-encoder codegen cannot access private classes).
    */
  final case class LastRight(ts: Long, payload: Long)

  /** Stream-stream as-of: lefts and right-updates in ONE keyed stream;
    * per-key state is just the latest right row (constant size — the
    * as-of state a sort-merge would keep, made explicit). Within a
    * micro-batch rows process in (ts, lefts-after-rights, seq) order, so
    * equal-timestamp rights win (`<=` semantics) and disorder inside a
    * batch is invisible.
    */
  def asofStream(ticks: Dataset[Tick]): Dataset[Enriched] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.groupByKey(_.key)
      .flatMapGroupsWithState[LastRight, Enriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[LastRight]) =>
          val out = Seq.newBuilder[Enriched]
          // order rights BEFORE lefts at equal ts (false < true on the
          // negated flag) so an equal-timestamp right is visible — `<=`
          // semantics, same tie rule as the batch operator's __side sort
          val ordered = rows.toSeq.sortBy(t => (t.ts, !t.is_right, t.seq))
          ordered.foreach { t =>
            if (t.is_right) {
              if (state.getOption.forall(_.ts <= t.ts))
                state.update(LastRight(t.ts, t.payload))
            } else {
              val m = state.getOption.filter(_.ts <= t.ts)
              out += Enriched(key, t.ts, t.seq, m.map(_.payload), m.map(_.ts))
            }
          }
          out.result().iterator
      }
  }
}
