package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming weekly cohort retention: the unbounded form of
  * `Qext.qExtCohortRetention` — per user, track the first-activity week
  * (the cohort) and every active week, and maintain live
  * (cohort_week, week_offset) -> distinct-user counts.
  *
  * Emits CHANGE RECORDS, not counts: each user event produces zero or
  * more (cohort_week, week_offset, delta ±1) rows, and a downstream
  * aggregation (`counts`, a plain streaming/batch groupBy-sum) turns the
  * change stream into the retention matrix. The record form keeps the
  * operator append-mode and composable (same design as
  * [[TransitionStream]]) AND makes out-of-order arrival exact: when a
  * straggler reveals an EARLIER first week, the user's whole cohort row
  * moves — the operator retracts every previously-emitted offset (-1 at
  * the old cohort) and re-emits at the new one, so the summed matrix
  * equals the batch computation on any arrival order / batch split
  * (spec'd: one-batch == per-event == shuffled).
  *
  * State per user: cohort week + the set of active weeks — O(active
  * weeks) per user, the same cardinality the batch distinct carries per
  * user, with no watermark needed (retention is all-time by contract;
  * a bounded-horizon variant would add a timeout).
  */
object CohortStream {

  final case class Ev(user_id: Long, ts: Timestamp)

  /** One retention-matrix change: delta is +1 or -1. */
  final case class Change(cohort_week: Long, week_offset: Long, delta: Long)

  /** Per-user state (public: Catalyst instantiates reflectively).
    * `lastSeenMs` (ms epoch) anchors the
    * bounded-horizon form's timeout to the user's LATEST activity across
    * batches — without it a within-lateness straggler batch would regress
    * the timeout toward its own (older) max timestamp and expire a
    * recently-active user early (round-11 review finding).
    */
  final case class Cohort(cohortWeek: Long, weeks: Seq[Long],
                          lastSeenMs: Long)

  implicit private val cohortEnc: Encoder[Cohort] = Encoders.product[Cohort]

  private val WeekMs: Long = 86400000L * 7

  def changes(events: Dataset[Ev]): Dataset[Change] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Cohort, Change](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[Cohort]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Change]
          var cur = state.getOption
          // batch-internal order is irrelevant: the transition function
          // below is arrival-order-exact by construction (retractions),
          // but sorting keeps the common in-order path retraction-free
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val w = Math.floorDiv(e.ts.getTime, WeekMs)
            val seen = math.max(e.ts.getTime, cur.map(_.lastSeenMs).getOrElse(Long.MinValue))
            cur match {
              case None =>
                out += Change(w, 0L, 1L)
                cur = Some(Cohort(w, Seq(w), seen))
              case Some(c) if c.weeks.contains(w) => // known week: no-op
                cur = Some(c.copy(lastSeenMs = seen))
              case Some(c) if w >= c.cohortWeek =>
                out += Change(c.cohortWeek, w - c.cohortWeek, 1L)
                cur = Some(Cohort(c.cohortWeek, c.weeks :+ w, seen))
              case Some(c) =>
                // straggler BEFORE the known first week: the user's
                // cohort moves — retract every emitted offset, re-emit
                // the full week set against the new cohort
                c.weeks.foreach(s => out += Change(c.cohortWeek, s - c.cohortWeek, -1L))
                val weeks = w +: c.weeks
                weeks.foreach(s => out += Change(w, s - w, 1L))
                cur = Some(Cohort(w, weeks, seen))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** The live retention matrix from a change stream (or a collected
    * change table in a spec): sum of deltas per (cohort_week,
    * week_offset). In a streaming query use `outputMode("update")` (or
    * `"complete"`) downstream of [[changes]]; rows whose net count is 0
    * (fully retracted) are filtered.
    */
  def counts(changes: DataFrame): DataFrame =
    changes.groupBy(col("cohort_week"), col("week_offset"))
      .agg(sum(col("delta")).as("n_users"))
      .filter(col("n_users") > 0)

  /** Bounded-horizon form of [[changes]] for TRUE-unbounded deployments:
    * per-user state times out `horizonWeeks` of EVENT TIME after the
    * user's latest activity (requires `events` to carry a watermark on
    * `ts` — `withWatermark` upstream). Semantics change, deliberately:
    * a user silent past the horizon who later returns starts a NEW
    * cohort at the return week (the "resurrected user" convention of
    * bounded-retention dashboards) — their pre-horizon rows REMAIN in
    * the summed matrix (historical cohorts are immutable once their
    * horizon passes; nothing is retracted by a timeout). Within the
    * horizon the semantics — including the cohort-moving retraction
    * path — are exactly [[changes]]'s. State per user: one cohort week
    * + at most `horizonWeeks` active weeks, and the user count with
    * live state is bounded by the horizon's active users, not all-time
    * users — the property the all-time form cannot offer.
    */
  def changesWindowed(events: Dataset[Ev], horizonWeeks: Int): Dataset[Change] = {
    require(horizonWeeks >= 1, s"horizonWeeks must be >= 1, got $horizonWeeks")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Cohort, Change](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[Cohort]) =>
          if (state.hasTimedOut) {
            // horizon passed in event time: drop the state, retract
            // nothing — the cohort's history stands
            state.remove()
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[Change]
            var cur = state.getOption
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val w = Math.floorDiv(e.ts.getTime, WeekMs)
              val seen = math.max(e.ts.getTime,
                cur.map(_.lastSeenMs).getOrElse(Long.MinValue))
              cur match {
                case None =>
                  out += Change(w, 0L, 1L)
                  cur = Some(Cohort(w, Seq(w), seen))
                case Some(c) if c.weeks.contains(w) =>
                  cur = Some(c.copy(lastSeenMs = seen))
                case Some(c) if w >= c.cohortWeek =>
                  out += Change(c.cohortWeek, w - c.cohortWeek, 1L)
                  cur = Some(Cohort(c.cohortWeek, c.weeks :+ w, seen))
                case Some(c) =>
                  c.weeks.foreach(s =>
                    out += Change(c.cohortWeek, s - c.cohortWeek, -1L))
                  val weeks = w +: c.weeks
                  weeks.foreach(s => out += Change(w, s - w, 1L))
                  cur = Some(Cohort(w, weeks, seen))
              }
            }
            cur.foreach { c =>
              state.update(c)
              // anchor on the user's LATEST activity ACROSS batches (the
              // state's lastSeenMs, not this batch's max): a
              // within-lateness straggler batch must never pull the
              // horizon backwards (spec'd)
              state.setTimeoutTimestamp(
                c.lastSeenMs + horizonWeeks.toLong * WeekMs)
            }
            out.iterator
          }
      }
  }
}
