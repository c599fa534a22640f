package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.FunnelStream.{Ev, EvT, FunnelAdvance}

/** [[FunnelTws]] — the `transformWithState` funnel forms. The pinned
  * contract: bit-identical outputs to the GroupState forms of record
  * ([[FunnelStream.timedFunnel]] / timedFunnelEventTtl) on the same
  * batches while no TTL elapses, and the same FORGETTING restart after
  * one does. RocksDB provider is set per-query-start and restored.
  */
class FunnelTwsSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("signup", "click", "purchase")
  private val gapUs = 600L * 1000000L // 10 min
  private def mins(m: Long) = m * 60L * 1000000L

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the RocksDB provider set, restoring the prior value. */
  private def withRocksDb[T](body: => T): T = {
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  private def runTws(batches: Seq[Seq[Ev]], name: String): Seq[FunnelAdvance] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = FunnelTws.timedFunnel(input.toDS(), steps, gapUs, None)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(name).as[FunnelAdvance].collect().toSeq
    } finally query.stop()
  }

  /** TTL'd form: TimeMode.ProcessingTime never quiesces — even
    * Trigger.AvailableNow keeps scheduling batches because
    * `shouldRunAnotherBatch` is always true against an advancing wall
    * clock (measured: 3k+ empty batches). Drive each batch as its own
    * Trigger.Once run over a shared checkpoint (exactly one micro-batch,
    * then a clean stop; expiry is evaluated on read at the next run) and
    * accumulate each run's sink.
    */
  private def runTwsTtl(batches: Seq[Seq[Ev]], name: String,
                        ttl: java.time.Duration,
                        sleepBetweenMs: Long): Seq[FunnelAdvance] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tws_ckpt").toString
    val input = MemoryStream[Ev]
    // memory sink refuses checkpoint recovery; foreachBatch recovers fine
    val out = java.util.Collections.synchronizedList(
      new java.util.ArrayList[FunnelAdvance]())
    batches.foreach { b =>
      if (b.nonEmpty) input.addData(b: _*)
      val q = FunnelTws.timedFunnel(input.toDS(), steps, gapUs, Some(ttl))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[FunnelAdvance], _: Long) =>
          batch.collect().foreach(out.add)
        }
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination()
      if (sleepBetweenMs > 0) Thread.sleep(sleepBetweenMs)
    }
    import scala.jdk.CollectionConverters._
    out.asScala.toSeq
  }

  private def runGroupState(batches: Seq[Seq[Ev]], name: String): Seq[FunnelAdvance] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = FunnelStream.timedFunnel(input.toDS(), steps, gapUs, None)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(name).as[FunnelAdvance].collect().toSeq
    } finally query.stop()
  }

  private val evs = Seq(
    Ev(1L, 1L, mins(0), "signup"), Ev(1L, 2L, mins(5), "click"),
    Ev(1L, 3L, mins(9), "purchase"),
    Ev(2L, 4L, mins(1), "signup"), Ev(2L, 5L, mins(20), "click"),
    Ev(3L, 6L, mins(2), "click"),
    Ev(1L, 7L, mins(30), "signup"))

  "FunnelTws.timedFunnel" should "match the GroupState form exactly, single and split batches" in {
    val splits = Seq(
      Seq(evs),
      evs.grouped(3).toSeq,
      evs.map(Seq(_)))
    splits.zipWithIndex.foreach { case (batches, i) =>
      val tws = runTws(batches, s"tws_par_$i")
      val gs = runGroupState(batches, s"tws_gs_$i")
      tws.sortBy(a => (a.user_id, a.reached)) shouldBe
        gs.sortBy(a => (a.user_id, a.reached))
    }
  }

  it should "forget state after the native store TTL elapses" in {
    val b1 = Seq(Ev(9L, 1L, mins(0), "signup"), Ev(9L, 2L, mins(5), "click"))
    val b2 = Seq(Ev(9L, 3L, mins(9), "purchase")) // would complete if remembered
    val out = runTwsTtl(Seq(b1, b2), "tws_ttl",
      ttl = java.time.Duration.ofMillis(400), sleepBetweenMs = 1200)
    val reached = out.filter(_.user_id == 9L).map(_.reached).sorted
    // batch 1 reaches 2; TTL drops it; purchase alone can't restart -> no 3
    reached shouldBe Seq(2)
  }

  it should "keep state across batches when activity stays inside the TTL" in {
    val b1 = Seq(Ev(7L, 1L, mins(0), "signup"))
    val b2 = Seq(Ev(7L, 2L, mins(5), "click"))
    val b3 = Seq(Ev(7L, 3L, mins(9), "purchase"))
    val out = runTwsTtl(Seq(b1, b2, b3), "tws_alive",
      ttl = java.time.Duration.ofSeconds(30), sleepBetweenMs = 0)
    out.filter(_.user_id == 7L).map(_.reached).sorted shouldBe Seq(1, 2, 3)
  }

  it should "reject a session without the RocksDB provider" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    an[IllegalArgumentException] should be thrownBy
      FunnelTws.timedFunnel(input.toDS(), steps, gapUs, None)
  }

  // ------------------------------------------------ last-touch parity

  private def runTouch(batches: Seq[Seq[Ev]], name: String,
                       tws: Boolean): Seq[FunnelStream.Attribution] = {
    def start() = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Ev]
      val ds =
        if (tws) FunnelTws.lastTouch(input.toDS(), "purchase",
          Seq("ad", "email"), gapUs, None)
        else FunnelStream.lastTouch(input.toDS(), "purchase",
          Seq("ad", "email"), gapUs, None)
      (input, ds.writeStream.format("memory").queryName(name)
        .outputMode("append").start())
    }
    val (input, query) = if (tws) withRocksDb(start()) else start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(name).as[FunnelStream.Attribution].collect().toSeq
    } finally query.stop()
  }

  "FunnelTws.lastTouch" should "match the GroupState form, single and split batches" in {
    val evs = Seq(
      Ev(1L, 1L, mins(0), "ad"), Ev(1L, 2L, mins(3), "email"),
      Ev(1L, 3L, mins(5), "purchase"), // credits the email (latest touch)
      Ev(2L, 4L, mins(1), "purchase"), // organic: no touch held
      Ev(1L, 5L, mins(12), "purchase"), // re-credits the held email (9 min <= 10)
      Ev(3L, 6L, mins(2), "ad"), Ev(3L, 7L, mins(40), "purchase")) // outside window
    Seq(Seq(evs), evs.map(Seq(_))).zipWithIndex.foreach { case (batches, i) =>
      val tws = runTouch(batches, s"twst_par_$i", tws = true)
      val gs = runTouch(batches, s"twst_gs_$i", tws = false)
      tws.sortBy(a => (a.user_id, a.conv_us)) shouldBe
        gs.sortBy(a => (a.user_id, a.conv_us))
      // and the fixture exercises all three outcomes
      tws.count(_.touch_id.isDefined) shouldBe 2
      tws.count(_.touch_id.isEmpty) shouldBe 2
    }
  }

  "FunnelTws.lastTouchEventTtl" should "forget the held touch once the watermark passes the horizon" in {
    implicit val sqlCtx = spark.sqlContext
    val ttl = java.time.Duration.ofMinutes(10)
    def run(tws: Boolean, name: String): Seq[FunnelStream.Attribution] = {
      def start() = {
        val input = MemoryStream[EvT]
        val wm = input.toDS().withWatermark("ts", "0 seconds")
        val ds = if (tws) FunnelTws.lastTouchEventTtl(wm, "purchase",
          Seq("ad"), 120L * 60L * 1000000L, ttl)
        else FunnelStream.lastTouchEventTtl(wm, "purchase",
          Seq("ad"), 120L * 60L * 1000000L, ttl)
        (input, ds.writeStream.format("memory").queryName(name)
          .outputMode("append").start())
      }
      val (input, query) = if (tws) withRocksDb(start()) else start()
      try {
        Seq(
          Seq(EvT(1L, 1L, tsOfMin(0), "ad")),
          Seq(EvT(2L, 2L, tsOfMin(60), "ad")), // advances watermark past 1's horizon
          Seq(EvT(1L, 3L, tsOfMin(61), "purchase")) // held ad expired -> organic
        ).foreach { b =>
          input.addData(b: _*)
          query.processAllAvailable()
        }
        spark.table(name).as[FunnelStream.Attribution].collect().toSeq
      } finally query.stop()
    }
    val tws = run(tws = true, "twst_ev")
    val gs = run(tws = false, "twst_ev_gs")
    tws.map(a => (a.user_id, a.touch_id)) shouldBe Seq((1L, None))
    tws shouldBe gs
  }

  // -------------------------------- multi-touch / time-decay (r17 tier)

  private def runMulti(batches: Seq[Seq[Ev]], name: String,
                       tws: Boolean): Seq[FunnelStream.MultiAttribution] = {
    def start() = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Ev]
      val ds =
        if (tws) FunnelTws.multiTouch(input.toDS(), "purchase",
          Seq("ad", "email"), gapUs, None)
        else FunnelStream.multiTouch(input.toDS(), "purchase",
          Seq("ad", "email"), gapUs, None)
      (input, ds.writeStream.format("memory").queryName(name)
        .outputMode("append").start())
    }
    val (input, query) = if (tws) withRocksDb(start()) else start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(name).as[FunnelStream.MultiAttribution].collect().toSeq
    } finally query.stop()
  }

  private def runDecay(batches: Seq[Seq[Ev]], name: String,
                       tws: Boolean): Seq[FunnelStream.DecayAttribution] = {
    def start() = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Ev]
      val ds =
        if (tws) FunnelTws.timeDecay(input.toDS(), "purchase",
          Seq("ad", "email"), gapUs, mins(3), None)
        else FunnelStream.timeDecay(input.toDS(), "purchase",
          Seq("ad", "email"), gapUs, mins(3), None)
      (input, ds.writeStream.format("memory").queryName(name)
        .outputMode("append").start())
    }
    val (input, query) = if (tws) withRocksDb(start()) else start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(name).as[FunnelStream.DecayAttribution].collect().toSeq
    } finally query.stop()
  }

  // three touches then two conversions (the second re-credits), one
  // organic user, one out-of-window touch — exercises multi-row credit,
  // both credit models' remainder paths, and the window prune
  private val multiEvs = Seq(
    Ev(1L, 1L, mins(0), "ad"), Ev(1L, 2L, mins(2), "email"),
    Ev(1L, 3L, mins(4), "ad"), Ev(1L, 4L, mins(6), "purchase"),
    Ev(1L, 5L, mins(8), "purchase"),
    Ev(2L, 6L, mins(1), "purchase"), // organic
    Ev(3L, 7L, mins(0), "ad"), Ev(3L, 8L, mins(40), "purchase")) // pruned

  "FunnelTws.multiTouch" should "match the GroupState form, single and split batches" in {
    Seq(Seq(multiEvs), multiEvs.grouped(3).toSeq, multiEvs.map(Seq(_)))
      .zipWithIndex.foreach { case (batches, i) =>
        val tws = runMulti(batches, s"twsm_par_$i", tws = true)
        val gs = runMulti(batches, s"twsm_gs_$i", tws = false)
        tws.sortBy(a => (a.user_id, a.conv_us, a.pos)) shouldBe
          gs.sortBy(a => (a.user_id, a.conv_us, a.pos))
        // fixture exercises all the shapes: 3-touch credit, organic, pruned
        tws.filter(a => a.user_id == 1L && a.conv_us == mins(6))
          .map(_.n_touches).distinct shouldBe Seq(3L)
        tws.filter(_.user_id == 2L).map(_.credit_bp_linear) shouldBe Seq(10000L)
        tws.filter(_.user_id == 3L).map(_.touch_id) shouldBe Seq(None)
        // credits sum to exactly 10000 bp per conversion in both models
        tws.groupBy(a => (a.user_id, a.conv_us)).values.foreach { rows =>
          rows.map(_.credit_bp_linear).sum shouldBe 10000L
          rows.map(_.credit_bp_position).sum shouldBe 10000L
        }
      }
  }

  "FunnelTws.timeDecay" should "match the GroupState form, single and split batches" in {
    Seq(Seq(multiEvs), multiEvs.map(Seq(_))).zipWithIndex.foreach {
      case (batches, i) =>
        val tws = runDecay(batches, s"twsd_par_$i", tws = true)
        val gs = runDecay(batches, s"twsd_gs_$i", tws = false)
        tws.sortBy(a => (a.user_id, a.conv_us, a.pos)) shouldBe
          gs.sortBy(a => (a.user_id, a.conv_us, a.pos))
        // touch ages differ within a conversion -> different halvings
        // (conv at min 6: touches aged 6/4/2 min at half-life 3 -> h 2/1/0)
        tws.filter(a => a.user_id == 1L && a.conv_us == mins(6))
          .map(_.halvings).sorted shouldBe Seq(0L, 1L, 2L)
        tws.groupBy(a => (a.user_id, a.conv_us)).values.foreach { rows =>
          rows.map(_.credit_bp_decay).sum shouldBe 10000L
        }
    }
  }

  "FunnelTws.multiTouch with native TTL" should "forget touch history after idle expiry" in withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_twsm_ckpt").toString
    val input = MemoryStream[Ev]
    val out = java.util.Collections.synchronizedList(
      new java.util.ArrayList[FunnelStream.MultiAttribution]())
    val batches = Seq(
      Seq(Ev(9L, 1L, mins(0), "ad"), Ev(9L, 2L, mins(1), "email")),
      Seq(Ev(9L, 3L, mins(2), "purchase"))) // after expiry -> organic
    batches.foreach { b =>
      input.addData(b: _*)
      val q = FunnelTws.multiTouch(input.toDS(), "purchase",
        Seq("ad", "email"), gapUs, Some(java.time.Duration.ofMillis(400)))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[FunnelStream.MultiAttribution], _: Long) =>
          batch.collect().foreach(out.add)
        }
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination()
      Thread.sleep(1200)
    }
    import scala.jdk.CollectionConverters._
    // the two touches expired before the conversion arrived -> organic
    out.asScala.toSeq.map(a => (a.user_id, a.touch_id, a.credit_bp_linear)) shouldBe
      Seq((9L, None, 10000L))
  }

  "FunnelTws.multiTouchEventTtl / timeDecayEventTtl" should "match GroupState and forget past the horizon" in {
    implicit val sqlCtx = spark.sqlContext
    val ttl = java.time.Duration.ofMinutes(10)
    val win = 120L * 60L * 1000000L
    val batches = Seq(
      Seq(EvT(1L, 1L, tsOfMin(0), "ad"), EvT(1L, 2L, tsOfMin(2), "ad")),
      Seq(EvT(1L, 3L, tsOfMin(5), "purchase")), // inside horizon: 2 touches
      Seq(EvT(2L, 4L, tsOfMin(60), "ad")), // watermark passes 1's horizon
      Seq(EvT(1L, 5L, tsOfMin(61), "purchase"))) // history expired -> organic
    def runM(tws: Boolean, name: String): Seq[FunnelStream.MultiAttribution] = {
      def start() = {
        val input = MemoryStream[EvT]
        val wm = input.toDS().withWatermark("ts", "0 seconds")
        val ds = if (tws) FunnelTws.multiTouchEventTtl(wm, "purchase",
          Seq("ad"), win, ttl)
        else FunnelStream.multiTouchEventTtl(wm, "purchase", Seq("ad"), win, ttl)
        (input, ds.writeStream.format("memory").queryName(name)
          .outputMode("append").start())
      }
      val (input, query) = if (tws) withRocksDb(start()) else start()
      try {
        batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
        spark.table(name).as[FunnelStream.MultiAttribution].collect().toSeq
      } finally query.stop()
    }
    def runD(tws: Boolean, name: String): Seq[FunnelStream.DecayAttribution] = {
      def start() = {
        val input = MemoryStream[EvT]
        val wm = input.toDS().withWatermark("ts", "0 seconds")
        val ds = if (tws) FunnelTws.timeDecayEventTtl(wm, "purchase",
          Seq("ad"), win, mins(3), ttl)
        else FunnelStream.timeDecayEventTtl(wm, "purchase", Seq("ad"), win,
          mins(3), ttl)
        (input, ds.writeStream.format("memory").queryName(name)
          .outputMode("append").start())
      }
      val (input, query) = if (tws) withRocksDb(start()) else start()
      try {
        batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
        spark.table(name).as[FunnelStream.DecayAttribution].collect().toSeq
      } finally query.stop()
    }
    val m = runM(tws = true, "twsm_ev")
    m.sortBy(a => (a.conv_us, a.pos)) shouldBe
      runM(tws = false, "twsm_ev_gs").sortBy(a => (a.conv_us, a.pos))
    // first conversion credits both touches; post-expiry one is organic
    m.filter(_.conv_us == FunnelStream.toEv(EvT(1L, 3L, tsOfMin(5), "x")).ts_us)
      .map(_.n_touches).distinct shouldBe Seq(2L)
    m.filter(_.conv_id == 5L).map(_.touch_id) shouldBe Seq(None)
    val d = runD(tws = true, "twsd_ev")
    d.sortBy(a => (a.conv_us, a.pos)) shouldBe
      runD(tws = false, "twsd_ev_gs").sortBy(a => (a.conv_us, a.pos))
    d.filter(_.conv_id == 5L).map(_.touch_id) shouldBe Seq(None)
  }

  // ----------------------------------------------------- event-time TTL

  // day-anchored: TimeMode.EventTime drops rows at-or-behind the previous
  // watermark (numRowsDroppedByWatermark), and the stream-initial watermark
  // is epoch 0 — an epoch-anchored minute-0 fixture row would be eaten at
  // the operator boundary before the processor ever saw it
  private def tsOfMin(m: Long) =
    new Timestamp(86400000L + m * 60L * 1000L)

  private def runEventTtl(batches: Seq[Seq[EvT]], name: String,
                          ttl: java.time.Duration,
                          tws: Boolean): Seq[FunnelAdvance] = {
    def start() = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[EvT]
      val wm = input.toDS().withWatermark("ts", "0 seconds")
      val ds =
        if (tws) FunnelTws.timedFunnelEventTtl(wm, steps, gapUs, ttl)
        else FunnelStream.timedFunnelEventTtl(wm, steps, gapUs, ttl)
      (input, ds.writeStream.format("memory").queryName(name)
        .outputMode("append").start())
    }
    val (input, query) = if (tws) withRocksDb(start()) else start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(name).as[FunnelAdvance].collect().toSeq
    } finally query.stop()
  }

  "FunnelTws.timedFunnelEventTtl" should "match the GroupState event-TTL form inside the horizon" in {
    val batches = Seq(
      Seq(EvT(1L, 1L, tsOfMin(0), "signup"), EvT(2L, 2L, tsOfMin(1), "signup")),
      Seq(EvT(1L, 3L, tsOfMin(5), "click")),
      Seq(EvT(1L, 4L, tsOfMin(9), "purchase"), EvT(2L, 5L, tsOfMin(10), "click")))
    val ttl = java.time.Duration.ofHours(2) // never elapses in-data
    val a = runEventTtl(batches, "tws_ev_a", ttl, tws = true)
    val b = runEventTtl(batches, "tws_ev_b", ttl, tws = false)
    a.sortBy(x => (x.user_id, x.reached)) shouldBe
      b.sortBy(x => (x.user_id, x.reached))
  }

  it should "forget a user once the watermark passes their horizon" in {
    val ttl = java.time.Duration.ofMinutes(10)
    val batches = Seq(
      // user 5 signs up and clicks at minute 0/5
      Seq(EvT(5L, 1L, tsOfMin(0), "signup"), EvT(5L, 2L, tsOfMin(5), "click")),
      // another user's late event drives the watermark far past 5's horizon
      Seq(EvT(6L, 3L, tsOfMin(60), "signup")),
      // 5 returns: purchase would complete the funnel had state survived;
      // after expiry it cannot even restart (not a first step)
      Seq(EvT(5L, 4L, tsOfMin(61), "purchase")))
    val out = runEventTtl(batches, "tws_ev_ttl", ttl, tws = true)
    // both steps arrive in one batch -> one advance at the final level;
    // the point is the purchase after expiry adds NO reached=3 row
    out.filter(_.user_id == 5L).map(_.reached).sorted shouldBe Seq(2)
    // and the GroupState form agrees on the same batches
    val gs = runEventTtl(batches, "tws_ev_ttl_gs", ttl, tws = false)
    out.sortBy(x => (x.user_id, x.reached)) shouldBe
      gs.sortBy(x => (x.user_id, x.reached))
  }
}
