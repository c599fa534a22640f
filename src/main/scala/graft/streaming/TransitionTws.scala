package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.streaming.TransitionStream.{Ev, Last, Transition}

/** `transformWithState` forms of the streaming Markov-transition
  * extractor — the shared [[TransitionStream.foldTransitions]] is the
  * semantics of record; retention is the state store's, per the
  * [[FunnelTws]] tier contract (native `TTLConfig` for the idle form,
  * re-armed timers for the event-time form, RocksDB required, and the
  * same scheduling caveats: a TTL'd ProcessingTime query never
  * quiesces — Trigger.Once per drain or always-on; TimeMode.EventTime
  * drops rows at-or-behind the watermark at the operator boundary).
  *
  * Event-time expiry anchors on the HELD event's own timestamp
  * (`Last.tsMs` is the user's max accepted event time — the GroupState
  * form's anchor), so no extra horizon field is needed in state.
  */
object TransitionTws {

  implicit private val trEnc: Encoder[Transition] = Encoders.product[Transition]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Semantics of record: [[TransitionStream.transitions]]. */
  def transitions(events: Dataset[Ev],
                  idleTtl: Option[java.time.Duration] = None): Dataset[Transition] = {
    FunnelTws.requireRocksDb(events)
    events.groupByKey(_.user_id)
      .transformWithState(
        new IdleProcessor(idleTtl.map(_.toMillis)),
        if (idleTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Semantics of record: [[TransitionStream.transitionsEventTtl]];
    * `withWatermark("ts", ...)` upstream is REQUIRED.
    */
  def transitionsEventTtl(events: Dataset[Ev],
                          eventTtl: java.time.Duration): Dataset[Transition] = {
    require(!eventTtl.isNegative && !eventTtl.isZero, "eventTtl must be positive")
    FunnelTws.requireRocksDb(events)
    events.groupByKey(_.user_id)
      .transformWithState(
        new EventTtlProcessor(eventTtl.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }

  private final class IdleProcessor(ttlMs: Option[Long])
    extends StatefulProcessor[Long, Ev, Transition] {

    @transient private var st: ValueState[Last] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl = ttlMs.map(ms => TTLConfig(java.time.Duration.ofMillis(ms)))
        .getOrElse(TTLConfig.NONE)
      st = getHandle.getValueState[Last]("last", Encoders.product[Last], ttl)
    }

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[Transition] = {
      val prior = if (st.exists()) Some(st.get()) else None
      val (cur, out) = TransitionStream.foldTransitions(userId,
        rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)), prior)
      // any held event rewrites state — the every-batch TTL refresh
      // (a dropped stale straggler still counts as user activity,
      // matching the GroupState form's unconditional armTtl)
      cur.foreach(st.update)
      out
    }
  }

  private final class EventTtlProcessor(ttlMs: Long)
    extends StatefulProcessor[Long, Ev, Transition] {

    @transient private var st: ValueState[Last] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Last]("last", Encoders.product[Last],
        TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[Transition] = {
      val prior = if (st.exists()) Some(st.get()) else None
      val (cur, out) = TransitionStream.foldTransitions(userId,
        rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)), prior)
      cur.foreach { c =>
        st.update(c)
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(c.tsMs + ttlMs)
      }
      out
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Transition] = {
      st.clear()
      Iterator.empty
    }
  }
}
