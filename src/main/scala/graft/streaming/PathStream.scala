package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming k-step path mining: the unbounded form of
  * [[graft.ops.Funnel.topPaths]]'s lead() windows — per user, every
  * arriving event completes the length-`k` window that ENDS on it, emitting
  * one path record at per-event latency. Downstream a plain streaming
  * aggregation turns the record stream into live path-support counts;
  * emitting records rather than counts keeps the operator append-mode and
  * composable (the [[TransitionStream]] convention — a transition IS the
  * k=2 path).
  *
  * State per user is the last k-1 (ts, event_id, type) triples — O(k),
  * fixed by construction. Ordering contract as [[TransitionStream]]:
  * within a micro-batch events apply in (ts, event_id) order, so the
  * emitted records are identical under any batch split of an in-order
  * stream (spec'd); stragglers at-or-older than the newest held event —
  * including at-least-once redeliveries — are dropped, exactly the rows
  * the batch lead() would never window in that order.
  */
object PathStream {

  final case class Ev(user_id: Long, event_id: Long, ts: Timestamp,
                      event_type: String)

  /** One completed window: the " > "-joined type sequence (batch `path`
    * format) plus the window's start/end event times.
    */
  final case class PathHit(user_id: Long, path: String, start_ts: Timestamp,
                           end_ts: Timestamp)

  /** Per-user held tail, oldest first (public: Catalyst instantiates
    * state reflectively).
    */
  final case class Tail(tsMs: List[Long], eventIds: List[Long],
                        types: List[String])

  implicit private val tailEnc: Encoder[Tail] = Encoders.product[Tail]

  /** The path fold shared by every retention form (sorted input): apply
    * events to the held tail, emit each completed k-window; returns
    * (new tail if non-empty, hits). Stragglers at-or-older than the
    * newest held event — including at-least-once redeliveries — drop.
    */
  private[streaming] def foldPaths(k: Int, userId: Long, sorted: Seq[Ev],
                                   prior: Option[Tail]): (Option[Tail], Iterator[PathHit]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[PathHit]
    var ts = prior.map(_.tsMs).getOrElse(Nil)
    var ids = prior.map(_.eventIds).getOrElse(Nil)
    var tps = prior.map(_.types).getOrElse(Nil)
    sorted.foreach { e =>
      val t = e.ts.getTime
      val stale = ts.nonEmpty && (t < ts.last ||
        (t == ts.last && e.event_id <= ids.last))
      if (!stale) {
        ts :+= t; ids :+= e.event_id; tps :+= e.event_type
        if (ts.size > k) { ts = ts.tail; ids = ids.tail; tps = tps.tail }
        if (ts.size == k)
          out += PathHit(userId, tps.mkString(" > "),
            new Timestamp(ts.head), new Timestamp(t))
      }
    }
    val tail = if (ts.isEmpty) None
      else Some(Tail(ts.takeRight(k - 1), ids.takeRight(k - 1),
        tps.takeRight(k - 1)))
    (tail, out.iterator)
  }

  /** `idleTtl`: optional processing-time state TTL — the
    * [[FunnelStream]] convention: None (default) never expires (semantics
    * of record, state O(all-time users)); Some(d) drops a user's held
    * tail after `d` of inactivity, so a returner's window restarts (no
    * path spans the expiry gap).
    */
  def paths(events: Dataset[Ev], k: Int,
            idleTtl: Option[java.time.Duration] = None): Dataset[PathHit] = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Tail, PathHit](
        OutputMode.Append(), FunnelStream.timeoutConf(idleTtl)) {
        case (userId, rows, state: GroupState[Tail]) if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case (userId, rows, state: GroupState[Tail]) =>
          val (tail, out) = foldPaths(k, userId,
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)),
            state.getOption)
          tail.foreach(state.update)
          FunnelStream.armTtl(state, idleTtl)
          out
      }
  }

  /** [[paths]] with EVENT-time expiry (the [[FunnelStream]] `*EventTtl`
    * contract): requires `withWatermark("ts", ...)` upstream; a user's
    * held tail drops when the event-time watermark passes `eventTtl`
    * beyond its newest event, so no path spans the expiry gap — and,
    * unlike the processing-time form, a REPLAYED backfill expires (and
    * therefore outputs) identically every run. The anchor is the tail's
    * newest timestamp (its max accepted event time — stale stragglers
    * never move it backwards).
    */
  def pathsEventTtl(events: Dataset[Ev], k: Int,
                    eventTtl: java.time.Duration): Dataset[PathHit] = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(!eventTtl.isNegative && !eventTtl.isZero, "eventTtl must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val ttlMs = eventTtl.toMillis
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Tail, PathHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[Tail]) if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case (userId, rows, state: GroupState[Tail]) =>
          val (tail, out) = foldPaths(k, userId,
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)),
            state.getOption)
          tail.foreach { tl =>
            state.update(tl)
            FunnelStream.armEventTtl(state, tl.tsMs.last, ttlMs)
          }
          out
      }
  }
}
