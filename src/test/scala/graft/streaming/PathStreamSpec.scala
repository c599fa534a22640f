package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.PathStream.{Ev, PathHit}

/** [[PathStream]]: per-event window completion, cross-batch tails,
  * batch-boundary independence, straggler handling, and count parity with
  * the batch [[graft.ops.Funnel.topPaths]] on a randomized in-order stream.
  */
class PathStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  private def run(batches: Seq[Seq[Ev]], k: Int, name: String): Seq[PathHit] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = PathStream.paths(input.toDS(), k)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(name).as[PathHit].collect().toSeq
    } finally query.stop()
  }

  private val evs = Seq(
    Ev(1L, 1L, ts(1000), "a"), Ev(1L, 2L, ts(2000), "b"),
    Ev(1L, 3L, ts(3000), "c"), Ev(1L, 4L, ts(4000), "d"),
    Ev(2L, 5L, ts(1000), "a"), Ev(2L, 6L, ts(2000), "b"))

  "paths" should "emit every consecutive k-window per user" in {
    val out = run(Seq(evs), 3, "ps_a")
    out.filter(_.user_id == 1L).map(_.path).toSet shouldBe
      Set("a > b > c", "b > c > d")
    out.filter(_.user_id == 2L) shouldBe empty // only 2 events, k=3
  }

  it should "carry tails cross-batch and be batch-boundary independent" in {
    val one = run(Seq(evs), 3, "ps_b").map(p => (p.user_id, p.path)).sorted
    val perEvent = run(evs.map(Seq(_)), 3, "ps_c").map(p => (p.user_id, p.path)).sorted
    perEvent shouldBe one
  }

  it should "drop stragglers and redeliveries without corrupting the tail" in {
    val redelivered = evs.find(_.event_id == 3L).get
    val ancient = Ev(1L, 9L, ts(500), "z")
    val out = run(Seq(evs, Seq(redelivered, ancient)), 3, "ps_d")
    out.map(_.path) should not contain "c > d > c"
    out.count(_.user_id == 1L) shouldBe 2
    out.map(_.path).exists(_.contains("z")) shouldBe false
  }

  it should "match ops.Funnel.topPaths counts on a randomized in-order stream" in {
    val rnd = new scala.util.Random(99)
    val types = Seq("a", "b", "c", "d")
    val fixture = (1L to 300L).map { id =>
      Ev(rnd.nextInt(12).toLong, id, ts(id * 1000), types(rnd.nextInt(types.size)))
    }.sortBy(e => (e.ts.getTime, e.event_id))
    val k = 3
    val streaming = run(fixture.grouped(29).map(_.toSeq).toSeq, k, "ps_rand")
      .groupBy(_.path).view.mapValues(_.size.toLong).toMap
    val batch = graft.ops.Funnel.topPaths(
        fixture.toDF().withColumn("ts_us", col("ts").cast("long")),
        "user_id", "event_type", "ts_us", col("event_id"), k, topN = 1000)
      .collect().map(r => r.getAs[String]("path") ->
        r.getAs[Long]("n_occurrences")).toMap
    streaming shouldBe batch
  }

  it should "expire idle tails under idleTtl: no path spans the gap" in {
    // ProcessingTimeTimeout queries never latch noNewData, so
    // processAllAvailable would hang (the EventStreamSpec finding): poll
    // the sink and let the engine's no-data batches fire the expiry.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = PathStream.paths(input.toDS(), k = 2,
        idleTtl = Some(java.time.Duration.ofMillis(200)))
      .writeStream.format("memory").queryName("ps_ttl")
      .outputMode("append").start()
    def awaitRows(n: Long): Unit = {
      val t0 = System.currentTimeMillis()
      while (spark.table("ps_ttl").count() < n) {
        if (System.currentTimeMillis() - t0 > 60000)
          fail(s"timed out waiting for $n rows")
        Thread.sleep(50)
      }
    }
    try {
      input.addData(Ev(1L, 1L, ts(1000), "a"), Ev(1L, 2L, ts(2000), "z"))
      awaitRows(1) // "a > z" proves the batch landed
      Thread.sleep(1500) // > TTL: expiry fires in no-data batches
      // returner: tail forgotten — "z > b" must NOT appear; the fresh
      // window starts at b
      input.addData(Ev(1L, 3L, ts(9000), "b"), Ev(1L, 4L, ts(9500), "c"))
      awaitRows(2)
      Thread.sleep(300)
      val u1 = spark.table("ps_ttl").as[PathHit].collect()
        .filter(_.user_id == 1L).sortBy(_.start_ts.getTime)
      u1.map(_.path).toSeq shouldBe Seq("a > z", "b > c")
    } finally query.stop()
  }
}
