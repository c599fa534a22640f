package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.PathStream.{Ev, PathHit}

/** [[PathTws]] — transformWithState k-step path miner: GroupState
  * parity on single/split batches and event-time expiry (no path spans
  * the gap).
  */
class PathTwsSpec extends SparkSpec {
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

  private def tsOfMin(m: Long) = new Timestamp(86400000L + m * 60L * 1000L)

  private def run(batches: Seq[Seq[Ev]], name: String, tws: Boolean,
                  eventTtl: Option[java.time.Duration] = None): Seq[PathHit] = {
    def start() = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Ev]
      val src = eventTtl match {
        case Some(_) => input.toDS().withWatermark("ts", "0 seconds")
        case None => input.toDS()
      }
      val ds = (tws, eventTtl) match {
        case (true, Some(t)) => PathTws.pathsEventTtl(src, 3, t)
        case (true, None) => PathTws.paths(src, 3, None)
        case (false, Some(t)) => PathStream.pathsEventTtl(src, 3, t)
        case (false, None) => PathStream.paths(src, 3, None)
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
      spark.table(name).as[PathHit].collect().toSeq
    } finally query.stop()
  }

  private val evs = Seq(
    Ev(1L, 1L, tsOfMin(0), "view"), Ev(1L, 2L, tsOfMin(2), "cart"),
    Ev(1L, 3L, tsOfMin(5), "buy"), Ev(1L, 4L, tsOfMin(7), "view"),
    Ev(2L, 5L, tsOfMin(1), "view"), Ev(2L, 6L, tsOfMin(3), "buy"))

  "PathTws.paths" should "match the GroupState form, single and split batches" in {
    Seq(Seq(evs), evs.map(Seq(_))).zipWithIndex.foreach { case (batches, i) =>
      val tws = run(batches, s"ptws_$i", tws = true)
      val gs = run(batches, s"ptws_gs_$i", tws = false)
      tws.sortBy(h => (h.user_id, h.end_ts.getTime)) shouldBe
        gs.sortBy(h => (h.user_id, h.end_ts.getTime))
      tws.map(_.path).sorted shouldBe
        Seq("cart > buy > view", "view > cart > buy")
    }
  }

  "PathTws.pathsEventTtl" should "let no path span the expiry gap, matching GroupState" in {
    val ttl = java.time.Duration.ofMinutes(10)
    val batches = Seq(
      Seq(Ev(5L, 1L, tsOfMin(0), "view"), Ev(5L, 2L, tsOfMin(2), "cart")),
      Seq(Ev(6L, 3L, tsOfMin(60), "view")), // watermark expires 5's tail
      Seq(Ev(5L, 4L, tsOfMin(61), "buy"), Ev(5L, 5L, tsOfMin(62), "buy"),
        Ev(5L, 6L, tsOfMin(63), "buy"))) // fresh window: buy>buy>buy only
    val tws = run(batches, "ptws_ev", tws = true, eventTtl = Some(ttl))
    val gs = run(batches, "ptws_ev_gs", tws = false, eventTtl = Some(ttl))
    tws.filter(_.user_id == 5L).map(_.path) shouldBe Seq("buy > buy > buy")
    tws.sortBy(h => (h.user_id, h.end_ts.getTime)) shouldBe
      gs.sortBy(h => (h.user_id, h.end_ts.getTime))
  }
}
