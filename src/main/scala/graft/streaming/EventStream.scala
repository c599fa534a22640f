package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` schema (event_id, ts,
  * user_id, event_type, value, props).
  *
  * The reference is batch-only (GitHub-Actions triggered), so this module is
  * the engine's forward-looking stream path: the same event-time aggregation
  * shapes as `Qext.qExtEventsDaily`, expressed as an unbounded query with
  * watermarked state, plus gap-based sessionization via
  * flatMapGroupsWithState (custom state the built-in window can't express).
  *
  * Scale posture: state is keyed by (window, user) / user — partitioned by
  * key across executors; the watermark bounds state size; no collect, no
  * global state.
  */
object EventStream {

  /** Tumbling event-time window counts per user with a watermark. Works on
    * any events-shaped frame, batch or streaming. Pass `watermark = None`
    * when the input is already watermarked (e.g. downstream of
    * [[dedupWithinWatermark]]) — Spark disallows redefining it.
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: Option[String] = Some("2 hours")): DataFrame =
    watermark.fold(events)(events.withWatermark("ts", _))
      .groupBy(window(col("ts"), window_), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "error", lit(1))).as("n_errors"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("user_id"), col("n_events"), col("n_errors"))

  /** Batch gap sessionization as pure window functions (lag → new-session
    * flag → running sum = session index → per-session aggregate). Same
    * semantics as [[sessionize]] but relational and oracle-checkable; the
    * stateful variant below exists for unbounded streams where the window
    * form can't run. `tsMicros` must be a bigint epoch-micros column;
    * ordering ties are broken by `tieBreak` for determinism.
    */
  def batchSessionize(events: DataFrame, tsMicros: org.apache.spark.sql.Column,
                      tieBreak: org.apache.spark.sql.Column,
                      gapMicros: Long): DataFrame =
    stitched(events, tsMicros, tieBreak, gapMicros)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__ts_us")).as("start_us"),
        max(col("__ts_us")).as("end_us"))

  /** The gap-stitching window stack shared by [[batchSessionize]] and
    * [[classifySessions]] — the gap rule lives HERE, once: events tagged
    * with `__ts_us` and a running `session_idx` per user (one user_id
    * exchange for the whole stack).
    */
  private def stitched(events: DataFrame,
                       tsMicros: org.apache.spark.sql.Column,
                       tieBreak: org.apache.spark.sql.Column,
                       gapMicros: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(tsMicros, tieBreak)
    events
      .withColumn("__ts_us", tsMicros)
      .withColumn("__new_session",
        when(col("__ts_us") - lag(col("__ts_us"), 1).over(byUser) > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("__new_session")).over(byUser))
  }

  /** Per-session OUTCOME classification — the funnel-adjacent question
    * "of the sessions we stitched, which bounced, which abandoned, which
    * converted?": same gap-sessionization as [[batchSessionize]] (one
    * user_id exchange shared by the window stack and the session
    * aggregate), with the per-type conversion count folded into the same
    * aggregate. Precedence is a DEFINITION: `converted` if the session
    * contains any `convertType` event (even a one-event session),
    * else `bounce` if it has exactly one event, else `abandoned`.
    * duration_us = end - start (0 for bounces) — all integer, so the
    * whole classification is oracle-exact.
    */
  def classifySessions(events: DataFrame,
                       tsMicros: org.apache.spark.sql.Column,
                       tieBreak: org.apache.spark.sql.Column,
                       gapMicros: Long, convertType: String): DataFrame = {
    stitched(events, tsMicros, tieBreak, gapMicros)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__ts_us")).as("start_us"),
        max(col("__ts_us")).as("end_us"),
        sum(when(col("event_type") === convertType, 1L).otherwise(0L))
          .as("n_conversions"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .withColumn("outcome",
        when(col("n_conversions") > 0, "converted")
          .when(col("n_events") === 1, "bounce")
          .otherwise("abandoned"))
  }

  /** Streaming exact dedup: drops rows whose `keys` were already seen within
    * the watermark horizon — the unbounded-stream counterpart of
    * `Dedup`/`TextDedup.exactDedup` (state bounded by the watermark, evicted
    * automatically). Works on batch frames too (plain dropDuplicates there).
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
                           watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else events.dropDuplicates(keys)

  /** Stream-static enrichment join: the unbounded-stream counterpart of
    * `LookupJoin.lookupLeft` — each micro-batch broadcast-joins the static
    * dim (re-read per batch for file sources, so dim updates flow through).
    * Dim is deduped on the keys first, same fan-out contract as batch.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim.dropDuplicates(keys)), keys, "left")

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long)

  /** Gap-based sessionization: a user's session closes after `gapMs` of
    * event-time silence (tracked via processing-time timeout for stream use).
    * This is the mapGroupsWithState shape — custom state beyond built-in
    * windows. One state machine: this is [[sessionizeClassified]] with a
    * never-matching conversion type, projected to the plain Session shape
    * (the gap rule exists once on the streaming side, as `stitched` is
    * once on the batch side).
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    sessionizeClassified(events, gapMs, convertType = "\u0000never")
      .map(cs => Session(cs.user_id, cs.session_start, cs.session_end,
        cs.n_events))
  }

  /** State for [[sessionizeClassified]] (and via delegation
    * [[sessionize]]): session bounds, event count, and the running
    * conversion count (public: Catalyst instantiates reflectively).
    */
  final case class ClassState(start: Long, lastSeen: Long, nEvents: Long,
                              nConversions: Long)

  final case class ClassifiedSession(user_id: Long, session_start: Timestamp,
                                     session_end: Timestamp, n_events: Long,
                                     n_conversions: Long, outcome: String)

  /** Streaming form of [[classifySessions]]: [[sessionize]]'s
    * close-on-silence state machine with the conversion count carried in
    * state, so every CLOSED session emits with its outcome label — same
    * precedence definition as the batch form (conversion wins over
    * bounce). State per user stays one fixed-size record.
    */
  def sessionizeClassified(events: Dataset[Event], gapMs: Long,
                           convertType: String): Dataset[ClassifiedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    def emit(userId: Long, s: ClassState): ClassifiedSession =
      ClassifiedSession(userId, new Timestamp(s.start),
        new Timestamp(s.lastSeen), s.nEvents, s.nConversions,
        if (s.nConversions > 0) "converted"
        else if (s.nEvents == 1) "bounce"
        else "abandoned")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ClassState, ClassifiedSession](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (userId, rows, state: GroupState[ClassState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(userId, s))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[ClassifiedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              val conv = if (e.event_type == convertType) 1L else 0L
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = t, nEvents = s.nEvents + 1,
                    nConversions = s.nConversions + conv))
                case Some(s) =>
                  closed ::= emit(userId, s)
                  cur = Some(ClassState(t, t, 1, conv))
                case None =>
                  cur = Some(ClassState(t, t, 1, conv))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
