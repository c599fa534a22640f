package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.streaming.TransitionStream.{Ev, Transition}

/** [[TransitionStream]]: per-user pairing, batch-boundary independence,
  * and straggler handling.
  */
class TransitionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def run(batches: Seq[Seq[Ev]], name: String): Seq[Transition] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = TransitionStream.transitions(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(name).as[Transition].collect().toSeq
    } finally query.stop()
  }

  private val evs = Seq(
    Ev(1L, 1L, ts("2024-01-01 00:00:00"), "signup"),
    Ev(1L, 2L, ts("2024-01-01 00:05:00"), "click"),
    Ev(1L, 3L, ts("2024-01-01 00:09:00"), "purchase"),
    Ev(2L, 4L, ts("2024-01-01 00:01:00"), "click"))

  "transitions" should "pair consecutive per-user events" in {
    val out = run(Seq(evs), "tr_a")
    out.map(t => (t.user_id, t.from_type, t.to_type)).toSet shouldBe Set(
      (1L, "signup", "click"), (1L, "click", "purchase"))
  }

  it should "be batch-boundary independent" in {
    val one = run(Seq(evs), "tr_b").toSet
    val perEvent = run(evs.map(Seq(_)), "tr_c").toSet
    perEvent shouldBe one
  }

  it should "drop an at-least-once redelivery of the held event" in {
    // Exact duplicate of the latest event (same ts AND event_id): must be
    // dropped, not emitted as a phantom self-transition with from_ts==to_ts.
    val dup = evs.find(_.event_id == 3L).get
    val out = run(Seq(evs, Seq(dup)), "tr_dup")
    out.size shouldBe 2
    out.exists(t => t.from_ts == t.to_ts) shouldBe false
  }

  it should "drop stragglers older than the held event" in {
    val late = Ev(1L, 9L, ts("2023-12-31 00:00:00"), "ancient")
    val out = run(Seq(evs, Seq(late)), "tr_d")
    out.map(_.from_type) should not contain "ancient"
    out.map(_.to_type) should not contain "ancient"
    out.size shouldBe 2
  }
}
