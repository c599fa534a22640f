package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.TransitionStream.{Ev, Transition}

/** [[TransitionTws]] — the transformWithState transition extractor:
  * GroupState parity on single/split batches, redelivery drop, and
  * event-time expiry (fresh chain after the gap).
  */
class TransitionTwsSpec extends SparkSpec {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  // day-anchored (the FunnelTwsSpec note: epoch-anchored rows die at the
  // initial watermark in TimeMode.EventTime)
  private def tsOfMin(m: Long) = new Timestamp(86400000L + m * 60L * 1000L)

  private def run(batches: Seq[Seq[Ev]], name: String, tws: Boolean,
                  eventTtl: Option[java.time.Duration] = None): Seq[Transition] = {
    def start() = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Ev]
      val src = eventTtl match {
        case Some(_) => input.toDS().withWatermark("ts", "0 seconds")
        case None => input.toDS()
      }
      val ds = (tws, eventTtl) match {
        case (true, Some(t)) => TransitionTws.transitionsEventTtl(src, t)
        case (true, None) => TransitionTws.transitions(src, None)
        case (false, Some(t)) => TransitionStream.transitionsEventTtl(src, t)
        case (false, None) => TransitionStream.transitions(src, None)
      }
      (input, ds.writeStream.format("memory").queryName(name)
        .outputMode("append").start())
    }
    val (input, query) = if (tws) withRocksDb(start()) else start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(name).as[Transition].collect().toSeq
    } finally query.stop()
  }

  private val evs = Seq(
    Ev(1L, 1L, tsOfMin(0), "view"), Ev(1L, 2L, tsOfMin(2), "cart"),
    Ev(1L, 3L, tsOfMin(5), "buy"),
    Ev(2L, 4L, tsOfMin(1), "view"),
    // redelivery of user 1's held event: must not fabricate a transition
    Ev(1L, 3L, tsOfMin(5), "buy"),
    Ev(2L, 5L, tsOfMin(9), "view"))

  "TransitionTws.transitions" should "match the GroupState form, single and split batches" in {
    Seq(Seq(evs), evs.grouped(2).toSeq).zipWithIndex.foreach { case (batches, i) =>
      val tws = run(batches, s"trtws_$i", tws = true)
      val gs = run(batches, s"trtws_gs_$i", tws = false)
      tws.sortBy(t => (t.user_id, t.to_ts.getTime)) shouldBe
        gs.sortBy(t => (t.user_id, t.to_ts.getTime))
      tws.map(t => (t.user_id, t.from_type, t.to_type)).sorted shouldBe Seq(
        (1L, "cart", "buy"), (1L, "view", "cart"), (2L, "view", "view"))
    }
  }

  "TransitionTws.transitionsEventTtl" should "open a fresh chain after the watermark passes the horizon" in {
    val ttl = java.time.Duration.ofMinutes(10)
    val batches = Seq(
      Seq(Ev(5L, 1L, tsOfMin(0), "view")),
      Seq(Ev(6L, 2L, tsOfMin(60), "view")), // watermark -> min 60, expires 5
      Seq(Ev(5L, 3L, tsOfMin(61), "buy"))) // fresh chain: NO view->buy
    val tws = run(batches, "trtws_ev", tws = true, eventTtl = Some(ttl))
    val gs = run(batches, "trtws_ev_gs", tws = false, eventTtl = Some(ttl))
    tws.filter(_.user_id == 5L) shouldBe empty
    tws.sortBy(t => (t.user_id, t.to_ts.getTime)) shouldBe
      gs.sortBy(t => (t.user_id, t.to_ts.getTime))
  }
}
