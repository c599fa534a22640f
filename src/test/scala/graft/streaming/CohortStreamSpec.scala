package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.CohortStream.{Change, Ev}

/** [[CohortStream]]: live retention matrix == the batch computation on
  * any batch split, including a cohort-shifting out-of-order straggler
  * (the retraction path).
  */
class CohortStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def run(batches: Seq[Seq[Ev]], name: String): Seq[Change] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = CohortStream.changes(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(name).as[Change].collect().toSeq
    } finally query.stop()
  }

  /** The batch ground truth (same algebra as Qext.qExtCohortRetention). */
  private def batchMatrix(evs: Seq[Ev]): Map[(Long, Long), Long] = {
    val weeks = evs.map(e => (e.user_id, Math.floorDiv(e.ts.getTime, 86400000L * 7)))
      .distinct
    val first = weeks.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    weeks.groupBy { case (u, w) => (first(u), w - first(u)) }
      .map { case (k, us) => k -> us.map(_._1).distinct.size.toLong }
  }

  private def matrix(changes: Seq[Change]): Map[(Long, Long), Long] =
    changes.groupBy(c => (c.cohort_week, c.week_offset))
      .map { case (k, cs) => k -> cs.map(_.delta).sum }
      .filter(_._2 > 0)

  // user 1: weeks 0, 1, 3 of 2024; user 2: week 1 only; user 3: weeks 1, 2
  private val evs = Seq(
    Ev(1L, ts("2024-01-03 10:00:00")), Ev(1L, ts("2024-01-04 09:00:00")),
    Ev(1L, ts("2024-01-10 10:00:00")), Ev(1L, ts("2024-01-24 10:00:00")),
    Ev(2L, ts("2024-01-11 08:00:00")),
    Ev(3L, ts("2024-01-09 08:00:00")), Ev(3L, ts("2024-01-18 08:00:00")))

  "changes" should "reproduce the batch retention matrix in one batch" in {
    matrix(run(Seq(evs), "co_a")) shouldBe batchMatrix(evs)
  }

  it should "be batch-boundary independent (per-event feed)" in {
    matrix(run(evs.map(Seq(_)), "co_b")) shouldBe batchMatrix(evs)
  }

  it should "retract and re-emit when a straggler moves a user's cohort" in {
    // user 3's first event arrives LAST and lies two weeks EARLIER than
    // the cohort week the stream had assigned — the whole user-3 row
    // must move cohorts, exercising the retraction path
    val straggler = Ev(3L, ts("2023-12-27 08:00:00"))
    val full = evs :+ straggler
    val got = run(Seq(evs, Seq(straggler)), "co_c")
    got.exists(_.delta == -1L) shouldBe true // retraction actually fired
    matrix(got) shouldBe batchMatrix(full)
  }

  it should "ignore duplicate deliveries of a known week" in {
    val dup = evs.head.copy(ts = ts("2024-01-03 23:00:00")) // same week
    matrix(run(Seq(evs, Seq(dup)), "co_d")) shouldBe batchMatrix(evs)
  }

  private def runWindowed(batches: Seq[Seq[Ev]], horizonWeeks: Int,
                          name: String): Seq[Change] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // 30-day allowed lateness: stragglers inside it reach the state
    // function (a 0s watermark would filter them as late data before the
    // operator ever saw them); timeouts still fire once the watermark
    // (= max event time - 30d) passes a user's horizon
    val query = CohortStream.changesWindowed(
        input.toDS().withWatermark("ts", "30 days"), horizonWeeks)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(name).as[Change].collect().toSeq
    } finally query.stop()
  }

  "changesWindowed" should "match the all-time form inside the horizon" in {
    matrix(runWindowed(Seq(evs), horizonWeeks = 52, "cow_a")) shouldBe
      batchMatrix(evs)
  }

  it should "start a returning user as a NEW cohort after the horizon" in {
    // user 9 active in week W, silent 10 weeks (>> horizon 2), returns:
    // the return must be cohort_week = return week / offset 0, NOT an
    // offset-10 row of the original cohort — and the original row stays
    val early = Ev(9L, ts("2024-01-03 10:00:00"))
    val late = Ev(9L, ts("2024-03-13 10:00:00")) // 10 weeks later
    // a third user's late event advances the watermark past 9's horizon
    val tick = Ev(8L, ts("2024-03-12 00:00:00"))
    val got = matrix(runWindowed(
      Seq(Seq(early), Seq(tick), Seq(late)), horizonWeeks = 2, "cow_b"))
    val wEarly = Math.floorDiv(early.ts.getTime, 86400000L * 7)
    val wLate = Math.floorDiv(late.ts.getTime, 86400000L * 7)
    got((wEarly, 0L)) shouldBe 1L // history immutable
    got((wLate, 0L)) should be >= 1L // resurrected as a new cohort
    got.keySet should not contain ((wEarly, wLate - wEarly)) // no offset-10 row
  }

  it should "not regress the horizon when a within-lateness straggler arrives" in {
    // u9 is active at 03-01; a straggler at 02-10 (inside the 30d
    // lateness) then merges in. The timeout must stay anchored at the
    // LATEST activity (03-01 + 2w), not the straggler batch's max
    // (02-10 + 2w): the tick advances the watermark past the buggy
    // deadline but not the correct one, and u9's return at 03-05 must
    // continue the existing cohort — a regressed horizon would have
    // dropped the state and restarted them as a new cohort
    val a = Ev(9L, ts("2024-03-01 12:00:00"))
    val strag = Ev(9L, ts("2024-02-10 12:00:00"))
    val tick = Ev(8L, ts("2024-03-30 00:00:00"))
    val ret = Ev(9L, ts("2024-03-05 12:00:00"))
    val got = matrix(runWindowed(
      Seq(Seq(a), Seq(strag), Seq(tick), Seq(ret)), horizonWeeks = 2,
      "cow_reg"))
    got shouldBe batchMatrix(Seq(a, strag, tick, ret))
  }

  it should "keep the retraction path within the horizon" in {
    val a = Ev(5L, ts("2024-01-10 10:00:00"))
    val b = Ev(5L, ts("2024-01-03 10:00:00")) // earlier week, inside horizon
    val got = runWindowed(Seq(Seq(a), Seq(b)), horizonWeeks = 52, "cow_c")
    got.exists(_.delta == -1L) shouldBe true
    matrix(got) shouldBe batchMatrix(Seq(a, b))
  }

  "counts" should "sum the change stream into the live matrix" in {
    val changes = run(Seq(evs), "co_e")
    val live = CohortStream.counts(changes.toDF())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    live shouldBe batchMatrix(evs)
  }
}
