package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.streaming.FunnelStream.{Attribution, Ev, EvT, FunnelAdvance,
  FunnelState, FunnelStateT, TouchState, TouchStateT}

/** `transformWithState` forms of the streaming timed funnel and
  * last-touch attribution — the same arithmetic as [[FunnelStream]] (the
  * shared [[FunnelStream.foldFunnel]]/[[FunnelStream.foldLastTouch]] ARE
  * the semantics of record), but per-key retention is delegated to the
  * Spark 4 state-store runtime instead of hand-armed `GroupState`
  * timeouts:
  *
  *   - [[timedFunnel]] — PROCESSING-time idle TTL via the store's native
  *     `TTLConfig`: the value-state row expires `ttl` after its last
  *     write. Parity with [[FunnelStream.timedFunnel]]'s every-batch
  *     `armTtl` refresh is preserved by REWRITING the (unchanged) state
  *     on every batch in which the user appears — an idle gap is then
  *     measured from the user's latest activity in both engines.
  *     Scheduling caveat (vs the GroupState form): TimeMode.ProcessingTime
  *     keeps `shouldRunAnotherBatch` true — the runtime schedules empty
  *     micro-batches indefinitely to evaluate TTL against the advancing
  *     wall clock, so a TTL'd query never quiesces: `processAllAvailable()`
  *     never returns under the default trigger, and even
  *     `Trigger.AvailableNow()` keeps scheduling (measured: 3k+ empty
  *     batches — the runtime honors shouldRunAnotherBatch past offset
  *     exhaustion). A TTL'd funnel is therefore either a genuinely
  *     always-on query (the production shape — empty batches are cheap
  *     RocksDB no-ops) or a `Trigger.Once`-per-drain batch loop (the
  *     spec's shape; expiry is evaluated on read at the next run). The
  *     no-TTL form requests TimeMode.None and drains normally.
  *   - [[timedFunnelEventTtl]] — EVENT-time expiry via state-store
  *     timers: one timer per user at `lastSeen + ttl`, re-armed (delete +
  *     register) as the user's horizon advances; `handleExpiredTimer`
  *     clears the funnel (FORGETTING, the [[FunnelStream]] convention).
  *     No watermark clamp is needed here: unlike
  *     `GroupState.setTimeoutTimestamp`, registering a timer at-or-behind
  *     the watermark is legal and fires at the next micro-batch — the
  *     same observable expiry instant the hand-rolled clamp produced.
  *     One semantic DIFFERENCE from the GroupState form: TimeMode.EventTime
  *     drops input rows at-or-behind the previous batch's watermark at the
  *     operator boundary (`numRowsDroppedByWatermark`), where
  *     `flatMapGroupsWithState` hands every row to the fold and lets the
  *     greedy commit decide. The two are identical on in-order streams
  *     (spec-locked); under out-of-order delivery, size the `withWatermark`
  *     delay to the lateness you need applied.
  *
  * Operational contract: `transformWithState` requires the RocksDB state
  * store provider (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`); both entry points `require` it
  * up front so a mis-configured session fails with guidance, not a
  * runtime state-store error. At scale this is the point: RocksDB keeps
  * per-key state off-heap and spillable, so 10⁸ concurrent funnels cost
  * disk, not executor heap, and native TTL evicts without a full state
  * scan per batch.
  *
  * Output parity with the GroupState forms is spec-locked both
  * inside-TTL (identical advances) and across expiry (returner restarts
  * at step 0) in FunnelTwsSpec.
  */
object FunnelTws {

  private val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private[streaming] def requireRocksDb(ds: Dataset[_]): Unit = {
    val got = ds.sparkSession.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass").getOrElse("")
    require(got.endsWith("RocksDBStateStoreProvider"),
      "transformWithState needs the RocksDB state store: set " +
        s"spark.sql.streaming.stateStore.providerClass=$RocksDbProvider " +
        s"(got '$got')")
  }

  implicit private val advEnc: Encoder[FunnelAdvance] =
    Encoders.product[FunnelAdvance]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Timed funnel with the state store's native processing-time TTL
    * (None = never expire). Semantics of record:
    * [[FunnelStream.timedFunnel]].
    */
  def timedFunnel(events: Dataset[Ev], steps: Seq[String], maxGapUs: Long,
                  idleTtl: Option[java.time.Duration] = None): Dataset[FunnelAdvance] = {
    require(steps.size >= 2, s"need at least 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    require(maxGapUs > 0, s"maxGapUs must be positive, got $maxGapUs")
    requireRocksDb(events)
    events.groupByKey(_.user_id)
      .transformWithState(
        new IdleProcessor(steps.zipWithIndex.toMap, steps.size, maxGapUs,
          idleTtl.map(_.toMillis)),
        // ProcessingTime mode makes shouldRunAnotherBatch always-true (the
        // wall clock "advanced", so the runtime keeps scheduling empty
        // batches to evaluate TTL) — request it only when a TTL actually
        // needs the clock; a default trigger then wants Trigger.AvailableNow
        // or a real interval, not processAllAvailable-style draining
        if (idleTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Timed funnel with event-time expiry via state-store timers.
    * `withWatermark("ts", ...)` upstream is REQUIRED (TimeMode.EventTime
    * queries fail at start without one). Semantics of record:
    * [[FunnelStream.timedFunnelEventTtl]].
    */
  def timedFunnelEventTtl(events: Dataset[EvT], steps: Seq[String],
                          maxGapUs: Long,
                          eventTtl: java.time.Duration): Dataset[FunnelAdvance] = {
    require(steps.size >= 2, s"need at least 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    require(maxGapUs > 0, s"maxGapUs must be positive, got $maxGapUs")
    require(!eventTtl.isNegative && !eventTtl.isZero, "eventTtl must be positive")
    requireRocksDb(events)
    events.groupByKey(_.user_id)
      .transformWithState(
        new EventTtlProcessor(steps.zipWithIndex.toMap, steps.size, maxGapUs,
          eventTtl.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // -------------------------------------------- last-touch attribution

  implicit private val attrEnc: Encoder[Attribution] =
    Encoders.product[Attribution]

  /** Last-touch attribution with the store's native processing-time TTL.
    * Semantics of record: [[FunnelStream.lastTouch]] (shared fold).
    */
  def lastTouch(events: Dataset[Ev], convertType: String,
                touchTypes: Seq[String], windowUs: Long,
                idleTtl: Option[java.time.Duration] = None): Dataset[Attribution] = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convertType),
      "convertType must not be a touch type")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    requireRocksDb(events)
    events.groupByKey(_.user_id)
      .transformWithState(
        new TouchIdleProcessor(convertType, touchTypes.toSet, windowUs,
          idleTtl.map(_.toMillis)),
        if (idleTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Last-touch attribution with event-time expiry via state-store
    * timers; `withWatermark("ts", ...)` upstream is REQUIRED. Semantics
    * of record: [[FunnelStream.lastTouchEventTtl]].
    */
  def lastTouchEventTtl(events: Dataset[EvT], convertType: String,
                        touchTypes: Seq[String], windowUs: Long,
                        eventTtl: java.time.Duration): Dataset[Attribution] = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convertType),
      "convertType must not be a touch type")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    require(!eventTtl.isNegative && !eventTtl.isZero, "eventTtl must be positive")
    requireRocksDb(events)
    events.groupByKey(_.user_id)
      .transformWithState(
        new TouchEventTtlProcessor(convertType, touchTypes.toSet, windowUs,
          eventTtl.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Processing-time form: the held touch in a TTL'd value state. */
  private final class TouchIdleProcessor(convertType: String,
                                         touches: Set[String],
                                         windowUs: Long, ttlMs: Option[Long])
    extends StatefulProcessor[Long, Ev, Attribution] {

    @transient private var st: ValueState[TouchState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl = ttlMs.map(ms => TTLConfig(java.time.Duration.ofMillis(ms)))
        .getOrElse(TTLConfig.NONE)
      st = getHandle.getValueState[TouchState]("touch",
        Encoders.product[TouchState], ttl)
    }

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[Attribution] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val prior = if (st.exists()) Some(st.get()) else None
      val (held, out) = FunnelStream.foldLastTouch(
        convertType, touches, windowUs, userId, sorted, prior)
      // update on ANY held touch (even unchanged): resets the TTL clock,
      // matching the GroupState form's every-batch armTtl refresh
      held.foreach(st.update)
      out
    }
  }

  /** Event-time form: optional held touch + horizon anchor, one timer. */
  private final class TouchEventTtlProcessor(convertType: String,
                                             touches: Set[String],
                                             windowUs: Long, ttlMs: Long)
    extends StatefulProcessor[Long, EvT, Attribution] {

    @transient private var st: ValueState[TouchStateT] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[TouchStateT]("touch",
        Encoders.product[TouchStateT], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[EvT],
                                 tv: TimerValues): Iterator[Attribution] = {
      val sorted = rows.toSeq.map(FunnelStream.toEv)
        .sortBy(e => (e.ts_us, e.event_id))
      val prior = if (st.exists()) Some(st.get()) else None
      val (held, out) = FunnelStream.foldLastTouch(
        convertType, touches, windowUs, userId, sorted,
        prior.flatMap(_.touch))
      val lastSeenMs = math.max(
        prior.map(_.lastSeenMs).getOrElse(Long.MinValue),
        if (sorted.isEmpty) Long.MinValue
        else Math.floorDiv(sorted.map(_.ts_us).max, 1000L))
      st.update(TouchStateT(held, lastSeenMs))
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(lastSeenMs + ttlMs)
      out
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Attribution] = {
      st.clear()
      Iterator.empty
    }
  }

  /** Processing-time form: funnel state in a TTL'd value state. */
  private final class IdleProcessor(stepIdx: Map[String, Int], nSteps: Int,
                                    maxGapUs: Long, ttlMs: Option[Long])
    extends StatefulProcessor[Long, Ev, FunnelAdvance] {

    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl = ttlMs.map(ms => TTLConfig(java.time.Duration.ofMillis(ms)))
        .getOrElse(TTLConfig.NONE)
      st = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], ttl)
    }

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[FunnelAdvance] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val prior = if (st.exists()) st.get().times else Nil
      val (advanced, out) = FunnelStream.foldFunnel(
        stepIdx, nSteps, maxGapUs, userId, sorted, prior)
      advanced match {
        case Some(t) => st.update(FunnelState(t))
        // every-batch TTL refresh parity with FunnelStream.armTtl: any
        // activity rewrites the unchanged state, resetting its TTL clock
        case None => if (st.exists()) st.update(FunnelState(prior))
      }
      out
    }
  }

  /** Event-time form: funnel state + horizon anchor, one re-armed timer. */
  private final class EventTtlProcessor(stepIdx: Map[String, Int], nSteps: Int,
                                        maxGapUs: Long, ttlMs: Long)
    extends StatefulProcessor[Long, EvT, FunnelAdvance] {

    @transient private var st: ValueState[FunnelStateT] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelStateT]("funnel",
        Encoders.product[FunnelStateT], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[EvT],
                                 tv: TimerValues): Iterator[FunnelAdvance] = {
      val sorted = rows.toSeq.map(FunnelStream.toEv)
        .sortBy(e => (e.ts_us, e.event_id))
      val prior = if (st.exists()) Some(st.get()) else None
      val (advanced, out) = FunnelStream.foldFunnel(
        stepIdx, nSteps, maxGapUs, userId, sorted,
        prior.map(_.times).getOrElse(Nil))
      val lastSeenMs = math.max(
        prior.map(_.lastSeenMs).getOrElse(Long.MinValue),
        if (sorted.isEmpty) Long.MinValue
        else Math.floorDiv(sorted.map(_.ts_us).max, 1000L))
      st.update(FunnelStateT(
        advanced.getOrElse(prior.map(_.times).getOrElse(Nil)), lastSeenMs))
      // re-arm the single expiry timer on the latest horizon — a
      // within-lateness straggler never pulls it backwards (max above)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(lastSeenMs + ttlMs)
      out
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[FunnelAdvance] = {
      st.clear() // FORGET: a returner restarts at step 0
      Iterator.empty
    }
  }
}
