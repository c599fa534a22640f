package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming forms of the round-11 event analytics pair
  * ([[graft.ops.Funnel.timedFunnel]] / [[graft.ops.Funnel.lastTouchAttribution]]):
  * per-user fixed-size state in `flatMapGroupsWithState`, the
  * [[EventStream.sessionizeClassified]] shape.
  *
  * Ordering contract (shared with [[TransitionStream]]): within a
  * micro-batch events apply in (ts, event_id) order, so results are
  * identical however the in-order stream is batch-split (spec'd); the
  * batch operators are the semantics of record for an in-order event log.
  * The batch funnel's greedy chain is prefix-stable — step k's chosen time
  * depends only on events up to it — so incremental processing reproduces
  * it exactly; a straggler older than already-fixed state is dropped (the
  * greedy DEFINITION has already committed).
  *
  * State is O(1) per user: the funnel holds at most `steps.size`
  * microsecond stamps; attribution holds one (ts, id, type) touch triple.
  *
  * State TTL — two bounded-retention forms, both FORGETTING on expiry (a
  * returner restarts the funnel at step 0 / loses touch history, the
  * [[CohortStream.changesWindowed]] convention), both exactly equal to
  * the never-expiring default while no idle gap exceeds the TTL
  * (spec-locked both directions):
  *   - `idleTtl = Some(d)` — PROCESSING-time: a user's state drops after
  *     `d` of wall-clock inactivity. Operationally simple (no watermark),
  *     but NOT replay-deterministic: re-running a backfill fast never
  *     expires anyone.
  *   - the `*EventTtl` overloads (round 15) — EVENT-time: events carry a
  *     watermarked timestamp ([[EvT]]; `withWatermark` upstream is
  *     REQUIRED), and a user's state drops when the event-time watermark
  *     passes `ttl` beyond their latest seen event. Expiry is a function
  *     of the DATA, not the wall clock, so a replayed backfill expires —
  *     and therefore outputs — identically every run
  *     (EventTtlSpec locks replay-determinism and inside-horizon parity).
  *     The timeout anchors on the user's latest activity ACROSS batches
  *     (a within-lateness straggler batch never pulls the horizon
  *     backwards — the changesWindowed discipline), clamped above the
  *     current watermark (Spark rejects a timeout at-or-behind it).
  */
object FunnelStream {

  /** Timeout conf + per-key deadline refresh for the optional idle TTL —
    * one definition so every operator here bounds state the same way.
    */
  private[streaming] def timeoutConf(idleTtl: Option[java.time.Duration]): GroupStateTimeout =
    if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
    else GroupStateTimeout.NoTimeout()

  private[streaming] def armTtl(state: GroupState[_],
                               idleTtl: Option[java.time.Duration]): Unit =
    if (state.exists) idleTtl.foreach(d => state.setTimeoutDuration(d.toMillis))

  /** Arm an EVENT-time expiry at `lastSeenMs + ttlMs`, clamped strictly
    * above the current watermark (setTimeoutTimestamp rejects a deadline
    * the watermark has already passed — reachable when a within-lateness
    * straggler arrives for a user whose horizon has effectively elapsed;
    * the clamp expires them at the next watermark advance, the earliest
    * legal moment).
    */
  private[streaming] def armEventTtl(state: GroupState[_], lastSeenMs: Long,
                                     ttlMs: Long): Unit =
    state.setTimeoutTimestamp(
      math.max(lastSeenMs + ttlMs, state.getCurrentWatermarkMs() + 1))

  /** Event with microsecond event time — the funnel/attribution tiers
    * compare against gap/window bounds in µs, matching the batch queries.
    */
  final case class Ev(user_id: Long, event_id: Long, ts_us: Long,
                      event_type: String)

  /** [[Ev]] with a real (watermarkable) timestamp column — the input type
    * of the `*EventTtl` forms. `withWatermark("ts", ...)` upstream is
    * required (EventTimeTimeout queries fail at start without one).
    */
  final case class EvT(user_id: Long, event_id: Long, ts: Timestamp,
                       event_type: String)

  /** Exact µs of a Timestamp (getTime carries ms; nanos carries the
    * sub-second part — only its sub-ms remainder adds information).
    */
  private[streaming] def usOf(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000

  private[streaming] def toEv(e: EvT): Ev = Ev(e.user_id, e.event_id, usOf(e.ts), e.event_type)

  // ------------------------------------------------------- timed funnel

  /** Per-user chosen step times, in step order (public: Catalyst
    * instantiates state classes reflectively). `times.length` IS the
    * reached count; times never change once fixed (greedy commit).
    */
  final case class FunnelState(times: List[Long])

  /** [[FunnelState]] plus the event-time horizon anchor: the user's
    * latest seen event (ms) across batches — non-matching events arm the
    * TTL too, exactly like the idle form's every-batch refresh.
    */
  final case class FunnelStateT(times: List[Long], lastSeenMs: Long)

  /** Change-record output: the user's funnel row as of this advance —
    * step times in step order padded with nulls downstream. The LATEST
    * record per user (max `reached`) equals the batch
    * [[graft.ops.Funnel.timedFunnel]] row; earlier records are the
    * progression history a live dashboard consumes directly.
    */
  final case class FunnelAdvance(user_id: Long, reached: Int,
                                 step_us: Seq[Long])

  implicit private val stEnc: Encoder[FunnelState] = Encoders.product[FunnelState]
  implicit private val stEncT: Encoder[FunnelStateT] = Encoders.product[FunnelStateT]

  /** The funnel fold shared by both TTL forms: apply pre-SORTED events to
    * the prior step times; returns (new times if advanced, output).
    */
  private[streaming] def foldFunnel(stepIdx: Map[String, Int], nSteps: Int,
                         maxGapUs: Long, userId: Long, sorted: Seq[Ev],
                         prior: List[Long]): (Option[List[Long]], Iterator[FunnelAdvance]) = {
    val before = prior.size
    // state holds step order; `times` works newest-first (O(1) prepend,
    // head = last fixed step) and re-reverses at the edges
    var times = prior.reverse
    sorted.foreach { e =>
      val need = times.size
      if (need < nSteps && stepIdx.get(e.event_type).contains(need)) {
        val accept =
          if (need == 0) true
          else e.ts_us > times.head && e.ts_us <= times.head + maxGapUs
        if (accept) times ::= e.ts_us
      }
    }
    if (times.size > before) {
      val inOrder = times.reverse
      (Some(inOrder), Iterator.single(FunnelAdvance(userId, times.size, inOrder)))
    } else (None, Iterator.empty)
  }

  /** Streaming timed funnel: step k must occur strictly after step k-1
    * and within `maxGapUs` of it (the batch greedy-first-touch
    * definition). Emits one [[FunnelAdvance]] per user per micro-batch in
    * which their reached-level advanced.
    */
  def timedFunnel(events: Dataset[Ev], steps: Seq[String], maxGapUs: Long,
                  idleTtl: Option[java.time.Duration] = None): Dataset[FunnelAdvance] = {
    require(steps.size >= 2, s"need at least 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    require(maxGapUs > 0, s"maxGapUs must be positive, got $maxGapUs")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val nSteps = steps.size
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append(), timeoutConf(idleTtl)) {
        case (userId, rows, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val (advanced, out) = foldFunnel(stepIdx, nSteps, maxGapUs,
              userId, sorted, state.getOption.map(_.times).getOrElse(Nil))
            advanced.foreach(t => state.update(FunnelState(t)))
            armTtl(state, idleTtl)
            out
          }
      }
  }

  /** [[timedFunnel]] with EVENT-time expiry (see the object doc's TTL
    * contract): identical funnel arithmetic via the shared fold.
    */
  def timedFunnelEventTtl(events: Dataset[EvT], steps: Seq[String],
                          maxGapUs: Long,
                          eventTtl: java.time.Duration): Dataset[FunnelAdvance] = {
    require(steps.size >= 2, s"need at least 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    require(maxGapUs > 0, s"maxGapUs must be positive, got $maxGapUs")
    require(!eventTtl.isNegative && !eventTtl.isZero, "eventTtl must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val nSteps = steps.size
    val ttlMs = eventTtl.toMillis
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelStateT, FunnelAdvance](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[FunnelStateT]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.map(toEv).sortBy(e => (e.ts_us, e.event_id))
            val prior = state.getOption
            val (advanced, out) = foldFunnel(stepIdx, nSteps, maxGapUs,
              userId, sorted, prior.map(_.times).getOrElse(Nil))
            val lastSeenMs = math.max(
              prior.map(_.lastSeenMs).getOrElse(Long.MinValue),
              if (sorted.isEmpty) Long.MinValue
              else Math.floorDiv(sorted.map(_.ts_us).max, 1000L))
            state.update(FunnelStateT(
              advanced.getOrElse(prior.map(_.times).getOrElse(Nil)), lastSeenMs))
            armEventTtl(state, lastSeenMs, ttlMs)
            out
          }
      }
  }

  // -------------------------------------------------- last-touch attribution

  /** Per-user most-recent touch (public for Catalyst reflection). */
  final case class TouchState(tsUs: Long, eventId: Long, eventType: String)

  /** Event-time form of [[TouchState]]: the optional held touch plus the
    * horizon anchor (conversions and non-touch events arm the TTL too).
    */
  final case class TouchStateT(touch: Option[TouchState], lastSeenMs: Long)

  /** One row per conversion event, same fields as the batch
    * [[graft.ops.Funnel.lastTouchAttribution]]; organic conversions (no
    * in-window touch) carry null credit.
    */
  final case class Attribution(user_id: Long, conv_us: Long, conv_id: Long,
                               touch_us: Option[Long], touch_id: Option[Long],
                               touch_type: Option[String])

  implicit private val touchEnc: Encoder[TouchState] = Encoders.product[TouchState]
  implicit private val touchEncT: Encoder[TouchStateT] = Encoders.product[TouchStateT]

  /** The last-touch fold shared by both TTL forms (sorted input). */
  private[streaming] def foldLastTouch(convertType: String, touches: Set[String],
                            windowUs: Long, userId: Long, sorted: Seq[Ev],
                            prior: Option[TouchState]): (Option[TouchState], Iterator[Attribution]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Attribution]
    var held = prior
    sorted.foreach { e =>
      if (e.event_type == convertType) {
        // strict `<` at use time: a same-µs touch processed earlier
        // in this batch must not take credit (batch predicate is
        // __t_us < conv_us)
        val credit = held.filter(t =>
          t.tsUs < e.ts_us && t.tsUs >= e.ts_us - windowUs)
        out += Attribution(userId, e.ts_us, e.event_id,
          credit.map(_.tsUs), credit.map(_.eventId),
          credit.map(_.eventType))
      } else if (touches(e.event_type)) {
        val supersedes = held.forall(t =>
          e.ts_us > t.tsUs || (e.ts_us == t.tsUs && e.event_id > t.eventId))
        if (supersedes) held = Some(TouchState(e.ts_us, e.event_id,
          e.event_type))
      }
    }
    (held, out.iterator)
  }

  /** Streaming last-touch attribution: each arriving conversion credits
    * the most recent held touch strictly before it and within `windowUs`
    * — per-event latency, exactly one output row per conversion. Touches
    * supersede the held one in (ts, id) order, reproducing the batch
    * max-(ts, id) tie-break.
    */
  def lastTouch(events: Dataset[Ev], convertType: String,
                touchTypes: Seq[String], windowUs: Long,
                idleTtl: Option[java.time.Duration] = None): Dataset[Attribution] = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convertType),
      "convertType must not be a touch type")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val spark = events.sparkSession
    import spark.implicits._
    val touches = touchTypes.toSet
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Attribution](
        OutputMode.Append(), timeoutConf(idleTtl)) {
        case (userId, rows, state: GroupState[TouchState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val (held, out) = foldLastTouch(convertType, touches, windowUs,
              userId, sorted, state.getOption)
            held.foreach(state.update)
            armTtl(state, idleTtl)
            out
          }
      }
  }

  /** [[lastTouch]] with EVENT-time expiry (see the object doc's TTL
    * contract): identical attribution arithmetic via the shared fold.
    */
  def lastTouchEventTtl(events: Dataset[EvT], convertType: String,
                        touchTypes: Seq[String], windowUs: Long,
                        eventTtl: java.time.Duration): Dataset[Attribution] = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convertType),
      "convertType must not be a touch type")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    require(!eventTtl.isNegative && !eventTtl.isZero, "eventTtl must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val touches = touchTypes.toSet
    val ttlMs = eventTtl.toMillis
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchStateT, Attribution](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[TouchStateT]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.map(toEv).sortBy(e => (e.ts_us, e.event_id))
            val prior = state.getOption
            val (held, out) = foldLastTouch(convertType, touches, windowUs,
              userId, sorted, prior.flatMap(_.touch))
            val lastSeenMs = math.max(
              prior.map(_.lastSeenMs).getOrElse(Long.MinValue),
              if (sorted.isEmpty) Long.MinValue
              else Math.floorDiv(sorted.map(_.ts_us).max, 1000L))
            state.update(TouchStateT(held, lastSeenMs))
            armEventTtl(state, lastSeenMs, ttlMs)
            out
          }
      }
  }

  // -------------------------------------------------- multi-touch attribution

  /** Per-user in-window touch history, oldest-first (public for Catalyst
    * reflection). Bounded by the attribution window, not by stream length:
    * every processed event prunes touches older than `ts − windowUs`, and
    * the in-order contract makes that prune safe — the same per-user
    * in-window-activity bound as the batch join's pair volume.
    */
  final case class MultiTouchState(touches: List[TouchState])

  /** Event-time form of [[MultiTouchState]] with the horizon anchor. */
  final case class MultiTouchStateT(touches: List[TouchState], lastSeenMs: Long)

  /** One row per (conversion, in-window touch) — the batch
    * [[graft.ops.Funnel.multiTouchAttribution]] row: position, touch
    * count, and the two integer basis-point credit models; organic
    * conversions carry pos 0 / n 0 / full credit.
    */
  final case class MultiAttribution(user_id: Long, conv_us: Long,
                                    conv_id: Long, touch_us: Option[Long],
                                    touch_id: Option[Long],
                                    touch_type: Option[String], pos: Long,
                                    n_touches: Long, credit_bp_linear: Long,
                                    credit_bp_position: Long)

  implicit private val mtEnc: Encoder[MultiTouchState] =
    Encoders.product[MultiTouchState]
  implicit private val mtEncT: Encoder[MultiTouchStateT] =
    Encoders.product[MultiTouchStateT]

  /** The multi-touch fold shared by both TTL forms (sorted input).
    * Returns the new held list (oldest-first) and the output rows.
    */
  private[streaming] def foldMultiTouch(convertType: String, touches: Set[String],
                             windowUs: Long, userId: Long, sorted: Seq[Ev],
                             prior: List[TouchState]): (List[TouchState], Iterator[MultiAttribution]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[MultiAttribution]
    // newest-first for O(1) prepend; edges re-reverse (the
    // FunnelState convention)
    var held = prior.reverse
    sorted.foreach { e =>
      // window prune — safe under the in-order contract: no future
      // conversion can reach further back than this event's window
      held = held.takeWhile(_.tsUs >= e.ts_us - windowUs)
      if (e.event_type == convertType) {
        // strict `<` mirrors the batch predicate: a same-µs touch
        // must not take credit
        val inWin = held.reverse.filter(t => t.tsUs < e.ts_us)
        val n = inWin.size.toLong
        if (n == 0)
          out += MultiAttribution(userId, e.ts_us, e.event_id,
            None, None, None, 0L, 0L, 10000L, 10000L)
        else inWin.zipWithIndex.foreach { case (t, i) =>
          val pos = i + 1L
          val linear =
            if (pos == n) 10000L - (n - 1) * (10000L / n)
            else 10000L / n
          val position =
            if (n == 1) 10000L
            else if (n == 2) 5000L
            else if (pos == 1) 4000L
            else if (pos == n) 6000L - (n - 2) * (2000L / (n - 2))
            else 2000L / (n - 2)
          out += MultiAttribution(userId, e.ts_us, e.event_id,
            Some(t.tsUs), Some(t.eventId), Some(t.eventType), pos, n,
            linear, position)
        }
      } else if (touches(e.event_type)) {
        held ::= TouchState(e.ts_us, e.event_id, e.event_type)
      }
    }
    (held.reverse, out.iterator)
  }

  /** Streaming multi-touch attribution: each arriving conversion credits
    * EVERY held in-window touch under the batch's two normative integer
    * credit models (linear with remainder-to-last; U-shaped 40/20/40) —
    * per-event latency, exactly `max(n_touches, 1)` rows per conversion.
    * Touches append in (ts, id) order and never consume (a later
    * conversion re-credits the same touches, as in the batch join);
    * conversions do not clear state.
    */
  def multiTouch(events: Dataset[Ev], convertType: String,
                 touchTypes: Seq[String], windowUs: Long,
                 idleTtl: Option[java.time.Duration] = None): Dataset[MultiAttribution] = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convertType),
      "convertType must not be a touch type")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val spark = events.sparkSession
    import spark.implicits._
    val touches = touchTypes.toSet
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[MultiTouchState, MultiAttribution](
        OutputMode.Append(), timeoutConf(idleTtl)) {
        case (userId, rows, state: GroupState[MultiTouchState])
            if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case (userId, rows, state: GroupState[MultiTouchState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val (held, out) = foldMultiTouch(convertType, touches, windowUs,
            userId, sorted, state.getOption.map(_.touches).getOrElse(Nil))
          state.update(MultiTouchState(held))
          armTtl(state, idleTtl)
          out
      }
  }

  /** [[multiTouch]] with EVENT-time expiry (see the object doc's TTL
    * contract): identical credit arithmetic via the shared fold.
    */
  def multiTouchEventTtl(events: Dataset[EvT], convertType: String,
                         touchTypes: Seq[String], windowUs: Long,
                         eventTtl: java.time.Duration): Dataset[MultiAttribution] = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convertType),
      "convertType must not be a touch type")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    require(!eventTtl.isNegative && !eventTtl.isZero, "eventTtl must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val touches = touchTypes.toSet
    val ttlMs = eventTtl.toMillis
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[MultiTouchStateT, MultiAttribution](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[MultiTouchStateT])
            if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case (userId, rows, state: GroupState[MultiTouchStateT]) =>
          val sorted = rows.toSeq.map(toEv).sortBy(e => (e.ts_us, e.event_id))
          val prior = state.getOption
          val (held, out) = foldMultiTouch(convertType, touches, windowUs,
            userId, sorted, prior.map(_.touches).getOrElse(Nil))
          val lastSeenMs = math.max(
            prior.map(_.lastSeenMs).getOrElse(Long.MinValue),
            if (sorted.isEmpty) Long.MinValue
            else Math.floorDiv(sorted.map(_.ts_us).max, 1000L))
          state.update(MultiTouchStateT(held, lastSeenMs))
          armEventTtl(state, lastSeenMs, ttlMs)
          out
      }
  }

  // -------------------------------------------------- time-decay attribution

  /** One row per (conversion, in-window touch) — the batch
    * [[graft.ops.Funnel.timeDecayAttribution]] row (integer halvings by
    * age, floored shares, remainder to the last touch).
    */
  final case class DecayAttribution(user_id: Long, conv_us: Long,
                                    conv_id: Long, touch_us: Option[Long],
                                    touch_id: Option[Long],
                                    touch_type: Option[String], pos: Long,
                                    n_touches: Long, halvings: Long,
                                    weight: Long, credit_bp_decay: Long)

  /** The time-decay fold shared by both TTL forms (sorted input). */
  private[streaming] def foldTimeDecay(convertType: String, touches: Set[String],
                            windowUs: Long, halfLifeUs: Long, userId: Long,
                            sorted: Seq[Ev],
                            prior: List[TouchState]): (List[TouchState], Iterator[DecayAttribution]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[DecayAttribution]
    var held = prior.reverse
    sorted.foreach { e =>
      held = held.takeWhile(_.tsUs >= e.ts_us - windowUs)
      if (e.event_type == convertType) {
        val inWin = held.reverse.filter(t => t.tsUs < e.ts_us)
        val n = inWin.size.toLong
        if (n == 0)
          out += DecayAttribution(userId, e.ts_us, e.event_id,
            None, None, None, 0L, 0L, 0L, 0L, 10000L)
        else {
          val weighted = inWin.map { t =>
            val h = math.min((e.ts_us - t.tsUs) / halfLifeUs, 13L)
            (t, h, 10000L >> h)
          }
          val wsum = weighted.map(_._3).sum
          val floored = weighted.map { case (t, h, w) =>
            (t, h, w, 10000L * w / wsum)
          }
          val csum = floored.map(_._4).sum
          floored.zipWithIndex.foreach { case ((t, h, w, c), i) =>
            val pos = i + 1L
            val credit = if (pos == n) 10000L - csum + c else c
            out += DecayAttribution(userId, e.ts_us, e.event_id,
              Some(t.tsUs), Some(t.eventId), Some(t.eventType), pos, n,
              h, w, credit)
          }
        }
      } else if (touches(e.event_type)) {
        held ::= TouchState(e.ts_us, e.event_id, e.event_type)
      }
    }
    (held.reverse, out.iterator)
  }

  /** Streaming time-decay attribution: the [[multiTouch]] state machinery
    * (window-pruned in-window touch history) with the batch's integer
    * exponential-decay credit model applied at conversion arrival — ages
    * are exact at credit time because every held touch carries its own
    * timestamp. Per-event latency, credits sum to exactly 10000 bp per
    * conversion.
    */
  def timeDecay(events: Dataset[Ev], convertType: String,
                touchTypes: Seq[String], windowUs: Long, halfLifeUs: Long,
                idleTtl: Option[java.time.Duration] = None): Dataset[DecayAttribution] = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convertType),
      "convertType must not be a touch type")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    require(halfLifeUs > 0, s"halfLifeUs must be positive, got $halfLifeUs")
    val spark = events.sparkSession
    import spark.implicits._
    val touches = touchTypes.toSet
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[MultiTouchState, DecayAttribution](
        OutputMode.Append(), timeoutConf(idleTtl)) {
        case (userId, rows, state: GroupState[MultiTouchState])
            if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case (userId, rows, state: GroupState[MultiTouchState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val (held, out) = foldTimeDecay(convertType, touches, windowUs,
            halfLifeUs, userId, sorted,
            state.getOption.map(_.touches).getOrElse(Nil))
          state.update(MultiTouchState(held))
          armTtl(state, idleTtl)
          out
      }
  }

  /** [[timeDecay]] with EVENT-time expiry (see the object doc's TTL
    * contract): identical decay arithmetic via the shared fold.
    */
  def timeDecayEventTtl(events: Dataset[EvT], convertType: String,
                        touchTypes: Seq[String], windowUs: Long,
                        halfLifeUs: Long,
                        eventTtl: java.time.Duration): Dataset[DecayAttribution] = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convertType),
      "convertType must not be a touch type")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    require(halfLifeUs > 0, s"halfLifeUs must be positive, got $halfLifeUs")
    require(!eventTtl.isNegative && !eventTtl.isZero, "eventTtl must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val touches = touchTypes.toSet
    val ttlMs = eventTtl.toMillis
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[MultiTouchStateT, DecayAttribution](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[MultiTouchStateT])
            if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case (userId, rows, state: GroupState[MultiTouchStateT]) =>
          val sorted = rows.toSeq.map(toEv).sortBy(e => (e.ts_us, e.event_id))
          val prior = state.getOption
          val (held, out) = foldTimeDecay(convertType, touches, windowUs,
            halfLifeUs, userId, sorted, prior.map(_.touches).getOrElse(Nil))
          val lastSeenMs = math.max(
            prior.map(_.lastSeenMs).getOrElse(Long.MinValue),
            if (sorted.isEmpty) Long.MinValue
            else Math.floorDiv(sorted.map(_.ts_us).max, 1000L))
          state.update(MultiTouchStateT(held, lastSeenMs))
          armEventTtl(state, lastSeenMs, ttlMs)
          out
      }
  }
}
