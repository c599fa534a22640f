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

  it should "expire idle state under idleTtl: no transition spans the gap" in {
    // ProcessingTimeTimeout queries never latch noNewData, so
    // processAllAvailable would hang (the EventStreamSpec finding): poll
    // the sink and let the engine's no-data batches fire the expiry.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = TransitionStream.transitions(input.toDS(),
        idleTtl = Some(java.time.Duration.ofMillis(200)))
      .writeStream.format("memory").queryName("tr_ttl")
      .outputMode("append").start()
    def awaitRows(n: Long): Unit = {
      val t0 = System.currentTimeMillis()
      while (spark.table("tr_ttl").count() < n) {
        if (System.currentTimeMillis() - t0 > 60000)
          fail(s"timed out waiting for $n rows")
        Thread.sleep(50)
      }
    }
    try {
      input.addData(Ev(1L, 1L, ts("2024-01-01 00:00:00"), "signup"),
        Ev(1L, 2L, ts("2024-01-01 00:01:00"), "view"))
      awaitRows(1) // signup -> view proves the batch landed
      Thread.sleep(1500) // > TTL: expiry fires in no-data batches
      // returner: held event forgotten — click pairs with NOTHING (no
      // view -> click across the gap); the fresh chain emits click -> purchase
      input.addData(Ev(1L, 3L, ts("2024-01-01 02:00:00"), "click"),
        Ev(1L, 4L, ts("2024-01-01 02:01:00"), "purchase"))
      awaitRows(2)
      Thread.sleep(300)
      val u1 = spark.table("tr_ttl").as[Transition].collect()
        .filter(_.user_id == 1L).sortBy(_.from_ts.getTime)
      u1.map(t => (t.from_type, t.to_type)).toSeq shouldBe
        Seq(("signup", "view"), ("click", "purchase"))
    } finally query.stop()
  }
}
