package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.streaming.PathStream.{Ev, PathHit, Tail}

/** `transformWithState` forms of the streaming k-step path miner — the
  * shared [[PathStream.foldPaths]] is the semantics of record; retention
  * is the state store's, per the [[FunnelTws]] tier contract (native
  * `TTLConfig` for the idle form, re-armed timers for the event-time
  * form, RocksDB required, and the same scheduling caveats). Event-time
  * expiry anchors on the held tail's newest timestamp (its max accepted
  * event time), as the GroupState form does.
  */
object PathTws {

  implicit private val hitEnc: Encoder[PathHit] = Encoders.product[PathHit]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Semantics of record: [[PathStream.paths]]. */
  def paths(events: Dataset[Ev], k: Int,
            idleTtl: Option[java.time.Duration] = None): Dataset[PathHit] = {
    require(k >= 2, s"k must be >= 2, got $k")
    FunnelTws.requireRocksDb(events)
    events.groupByKey(_.user_id)
      .transformWithState(
        new IdleProcessor(k, idleTtl.map(_.toMillis)),
        if (idleTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Semantics of record: [[PathStream.pathsEventTtl]];
    * `withWatermark("ts", ...)` upstream is REQUIRED.
    */
  def pathsEventTtl(events: Dataset[Ev], k: Int,
                    eventTtl: java.time.Duration): Dataset[PathHit] = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(!eventTtl.isNegative && !eventTtl.isZero, "eventTtl must be positive")
    FunnelTws.requireRocksDb(events)
    events.groupByKey(_.user_id)
      .transformWithState(
        new EventTtlProcessor(k, eventTtl.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }

  private final class IdleProcessor(k: Int, ttlMs: Option[Long])
    extends StatefulProcessor[Long, Ev, PathHit] {

    @transient private var st: ValueState[Tail] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl = ttlMs.map(ms => TTLConfig(java.time.Duration.ofMillis(ms)))
        .getOrElse(TTLConfig.NONE)
      st = getHandle.getValueState[Tail]("tail", Encoders.product[Tail], ttl)
    }

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[PathHit] = {
      val prior = if (st.exists()) Some(st.get()) else None
      val (tail, out) = PathStream.foldPaths(k, userId,
        rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)), prior)
      // rewrite on any held tail — the every-batch TTL refresh
      tail.foreach(st.update)
      out
    }
  }

  private final class EventTtlProcessor(k: Int, ttlMs: Long)
    extends StatefulProcessor[Long, Ev, PathHit] {

    @transient private var st: ValueState[Tail] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Tail]("tail", Encoders.product[Tail],
        TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[PathHit] = {
      val prior = if (st.exists()) Some(st.get()) else None
      val (tail, out) = PathStream.foldPaths(k, userId,
        rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)), prior)
      tail.foreach { tl =>
        st.update(tl)
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(tl.tsMs.last + ttlMs)
      }
      out
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[PathHit] = {
      st.clear()
      Iterator.empty
    }
  }
}
