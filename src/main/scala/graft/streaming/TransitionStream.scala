package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Markov-transition extraction: the unbounded form of
  * `Qext.qExtEventTransitions`'s lead() — per user, each arriving event
  * pairs with the previous one into a (from_type → to_type) transition
  * record, at per-event latency. Downstream a plain (windowed) streaming
  * aggregation turns the transition stream into live transition-matrix
  * counts; emitting the RECORDS rather than the counts keeps this
  * operator append-mode and composable (route, alert, or aggregate).
  *
  * State per user is one (ts, event_id, event_type) triple — O(users),
  * no watermark needed (the latest event stays relevant until
  * superseded). Within a micro-batch events apply in the batch query's
  * (ts, event_id) order, so the emitted transitions are identical
  * whether events arrive in one batch or one-per-batch (spec'd);
  * out-of-order stragglers at-or-older than the held event — including
  * an at-least-once redelivery of the held event itself — are dropped
  * and counted nowhere (exactly the rows the batch lead() would never
  * pair in that order either).
  */
object TransitionStream {

  final case class Ev(user_id: Long, event_id: Long, ts: Timestamp,
                      event_type: String)

  final case class Transition(user_id: Long, from_type: String,
                              to_type: String, from_ts: Timestamp,
                              to_ts: Timestamp)

  /** Per-user held event (public: Catalyst codegen instantiates state
    * classes reflectively).
    */
  final case class Last(tsMs: Long, eventId: Long, eventType: String)

  implicit private val lastEnc: Encoder[Last] = Encoders.product[Last]

  /** The transition fold shared by every retention form (sorted input):
    * apply events to the held (ts, id, type) triple; returns (new held,
    * emitted transitions). Stale stragglers and at-least-once
    * redeliveries of the held event itself ((ts, id) <= held) are
    * dropped — emitting on equality would fabricate a phantom
    * self-transition with from_ts == to_ts.
    */
  private[streaming] def foldTransitions(userId: Long, sorted: Seq[Ev],
                                         prior: Option[Last]): (Option[Last], Iterator[Transition]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
    var cur = prior
    sorted.foreach { e =>
      cur match {
        case Some(c) if e.ts.getTime < c.tsMs ||
            (e.ts.getTime == c.tsMs && e.event_id <= c.eventId) =>
        case Some(c) =>
          out += Transition(userId, c.eventType, e.event_type,
            new Timestamp(c.tsMs), e.ts)
          cur = Some(Last(e.ts.getTime, e.event_id, e.event_type))
        case None =>
          cur = Some(Last(e.ts.getTime, e.event_id, e.event_type))
      }
    }
    (cur, out.iterator)
  }

  /** `idleTtl`: optional processing-time state TTL — the
    * [[FunnelStream]] convention: None (default) never expires (semantics
    * of record, state O(all-time users)); Some(d) drops a user's held
    * event after `d` of inactivity, so a returner's first new event opens
    * a fresh chain (no transition emitted across the expiry gap).
    */
  def transitions(events: Dataset[Ev],
                  idleTtl: Option[java.time.Duration] = None): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Last, Transition](
        OutputMode.Append(), FunnelStream.timeoutConf(idleTtl)) {
        case (userId, rows, state: GroupState[Last]) if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case (userId, rows, state: GroupState[Last]) =>
          val (cur, out) = foldTransitions(userId,
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)),
            state.getOption)
          cur.foreach(state.update)
          FunnelStream.armTtl(state, idleTtl)
          out
      }
  }

  /** [[transitions]] with EVENT-time expiry (the [[FunnelStream]]
    * `*EventTtl` contract): requires `withWatermark("ts", ...)` upstream;
    * a user's held event drops when the event-time watermark passes
    * `eventTtl` beyond it, so a returner's first new event opens a fresh
    * chain — and, unlike the processing-time form, a REPLAYED backfill
    * expires (and therefore outputs) identically every run. The anchor is
    * the held event's own timestamp (`Last.tsMs` IS the user's max
    * accepted event time — stale stragglers never move it backwards).
    */
  def transitionsEventTtl(events: Dataset[Ev],
                          eventTtl: java.time.Duration): Dataset[Transition] = {
    require(!eventTtl.isNegative && !eventTtl.isZero, "eventTtl must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val ttlMs = eventTtl.toMillis
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Last, Transition](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[Last]) if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case (userId, rows, state: GroupState[Last]) =>
          val (cur, out) = foldTransitions(userId,
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)),
            state.getOption)
          cur.foreach { c =>
            state.update(c)
            FunnelStream.armEventTtl(state, c.tsMs, ttlMs)
          }
          out
      }
  }
}
