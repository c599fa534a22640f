package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.FunnelStream.{Attribution, Ev, FunnelAdvance}

/** [[FunnelStream]]: cross-batch per-user state, batch-boundary
  * independence, and exact parity with the batch operators of record
  * ([[graft.ops.Funnel.timedFunnel]] / lastTouchAttribution) on the same
  * events — including a randomized in-order fixture.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("signup", "click", "purchase")
  private val gapUs = 600L * 1000000L // 10 min

  private def runFunnel(batches: Seq[Seq[Ev]], name: String,
                        ttl: Option[java.time.Duration] = None,
                        sleepBetweenMs: Long = 0): Seq[FunnelAdvance] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = FunnelStream.timedFunnel(input.toDS(), steps, gapUs, ttl)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
        if (sleepBetweenMs > 0) Thread.sleep(sleepBetweenMs)
      }
      spark.table(name).as[FunnelAdvance].collect().toSeq
    } finally query.stop()
  }

  private def runAttr(batches: Seq[Seq[Ev]], name: String): Seq[Attribution] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = FunnelStream.lastTouch(input.toDS(), "purchase",
        Seq("ad", "email"), gapUs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(name).as[Attribution].collect().toSeq
    } finally query.stop()
  }

  private def mins(m: Long) = m * 60L * 1000000L

  private val evs = Seq(
    // user 1 completes all three steps inside the gap
    Ev(1L, 1L, mins(0), "signup"), Ev(1L, 2L, mins(5), "click"),
    Ev(1L, 3L, mins(9), "purchase"),
    // user 2 stalls: click arrives past the 10-min gap
    Ev(2L, 4L, mins(1), "signup"), Ev(2L, 5L, mins(20), "click"),
    // user 3 never enters (click before any signup)
    Ev(3L, 6L, mins(2), "click"),
    // user 1's later duplicate chain must not re-anchor (greedy commit)
    Ev(1L, 7L, mins(30), "signup"))

  "timedFunnel" should "reproduce the batch funnel row per user" in {
    val out = runFunnel(Seq(evs), "fs_a")
    val last = out.groupBy(_.user_id).map { case (u, rows) =>
      u -> rows.maxBy(_.reached)
    }
    last(1L).reached shouldBe 3
    last(1L).step_us shouldBe Seq(mins(0), mins(5), mins(9))
    last(2L).reached shouldBe 1
    last(2L).step_us shouldBe Seq(mins(1))
    last.contains(3L) shouldBe false
  }

  it should "advance cross-batch state and be batch-boundary independent" in {
    val one = runFunnel(Seq(evs), "fs_b")
    val perEvent = runFunnel(evs.map(Seq(_)), "fs_c")
    def lastByUser(rows: Seq[FunnelAdvance]) =
      rows.groupBy(_.user_id).map { case (u, r) =>
        u -> r.maxBy(_.reached).step_us }
    lastByUser(perEvent) shouldBe lastByUser(one)
    // per-event split emits one advance per actual advance
    perEvent.count(_.user_id == 1L) shouldBe 3
  }

  it should "match ops.Funnel.timedFunnel on a randomized in-order stream" in {
    val rnd = new scala.util.Random(1234)
    val types = Seq("signup", "click", "purchase", "noise")
    val fixture = (1L to 400L).map { id =>
      Ev(rnd.nextInt(25).toLong, id, id * mins(2), types(rnd.nextInt(types.size)))
    }.sortBy(e => (e.ts_us, e.event_id))
    val batches = fixture.grouped(37).map(_.toSeq).toSeq
    val streaming = runFunnel(batches, "fs_rand")
      .groupBy(_.user_id).map { case (u, rows) =>
        u -> rows.maxBy(_.reached).step_us }
    val batch = graft.ops.Funnel.timedFunnel(
        fixture.toDF(), "user_id", "event_type", "ts_us", steps, gapUs)
      .collect().map { r =>
        val times = steps.indices.map(i => Option(r.get(r.fieldIndex(
          s"step${i + 1}_us"))).map(_.asInstanceOf[Long]))
        r.getAs[Long]("user_id") -> times.takeWhile(_.isDefined).flatten.toSeq
      }.toMap
    streaming shouldBe batch
  }

  "lastTouch" should "credit each conversion to the latest in-window touch, cross-batch" in {
    val evs = Seq(
      Ev(1L, 1L, mins(0), "ad"), Ev(1L, 2L, mins(3), "email"),
      Ev(1L, 3L, mins(8), "purchase"), // credit: email @3
      Ev(2L, 4L, mins(0), "ad"),
      Ev(2L, 5L, mins(30), "purchase"), // out of window: organic
      Ev(3L, 6L, mins(1), "purchase")) // no touch at all: organic
    val out = runAttr(Seq(evs.take(2), evs.drop(2)), "at_a")
    val byConv = out.map(a => a.conv_id -> a).toMap
    byConv(3L).touch_type shouldBe Some("email")
    byConv(3L).touch_us shouldBe Some(mins(3))
    byConv(5L).touch_id shouldBe None
    byConv(6L).touch_id shouldBe None
  }

  it should "not credit a same-microsecond touch (strict precedence)" in {
    val evs = Seq(
      Ev(1L, 1L, mins(5), "ad"),
      Ev(1L, 2L, mins(5), "purchase"))
    val out = runAttr(Seq(evs), "at_same")
    out.size shouldBe 1
    out.head.touch_id shouldBe None
  }

  it should "match ops.Funnel.lastTouchAttribution on a randomized in-order stream" in {
    val rnd = new scala.util.Random(77)
    val types = Seq("ad", "email", "purchase", "noise")
    val fixture = (1L to 400L).map { id =>
      Ev(rnd.nextInt(25).toLong, id, id * mins(1), types(rnd.nextInt(types.size)))
    }.sortBy(e => (e.ts_us, e.event_id))
    val batches = fixture.grouped(41).map(_.toSeq).toSeq
    val streaming = runAttr(batches, "at_rand")
      .map(a => (a.user_id, a.conv_us, a.conv_id) ->
        (a.touch_us, a.touch_id, a.touch_type)).toMap
    val batch = graft.ops.Funnel.lastTouchAttribution(
        fixture.toDF(), "user_id", "event_type", "ts_us", "event_id",
        "purchase", Seq("ad", "email"), gapUs)
      .collect().map { r =>
        def opt[T](c: String): Option[T] =
          Option(r.get(r.fieldIndex(c))).map(_.asInstanceOf[T])
        (r.getAs[Long]("user_id"), r.getAs[Long]("conv_us"),
          r.getAs[Long]("conv_id")) ->
          (opt[Long]("touch_us"), opt[Long]("touch_id"),
            opt[String]("touch_type"))
      }.toMap
    streaming shouldBe batch
  }

  private def runMulti(batches: Seq[Seq[Ev]], name: String): Seq[FunnelStream.MultiAttribution] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = FunnelStream.multiTouch(input.toDS(), "purchase",
        Seq("ad", "email"), gapUs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(name).as[FunnelStream.MultiAttribution].collect().toSeq
    } finally query.stop()
  }

  "multiTouch" should "credit every in-window touch with the batch integer models, cross-batch" in {
    val evs = Seq(
      Ev(1L, 1L, mins(0), "ad"), Ev(1L, 2L, mins(2), "email"),
      Ev(1L, 3L, mins(4), "ad"),
      Ev(1L, 4L, mins(8), "purchase"), // 3 touches: 4000/2000/4000 U-shape
      Ev(1L, 5L, mins(9), "purchase"), // same touches re-credit
      Ev(2L, 6L, mins(1), "purchase")) // organic
    val out = runMulti(Seq(evs.take(3), evs.drop(3)), "mt_a")
    val conv4 = out.filter(_.conv_id == 4L).sortBy(_.pos)
    conv4.map(_.touch_id) shouldBe Seq(Some(1L), Some(2L), Some(3L))
    conv4.map(_.credit_bp_position) shouldBe Seq(4000L, 2000L, 4000L)
    conv4.map(_.credit_bp_linear) shouldBe Seq(3333L, 3333L, 3334L)
    conv4.map(_.n_touches).distinct shouldBe Seq(3L)
    out.count(_.conv_id == 5L) shouldBe 3 // touches not consumed
    val organic = out.filter(_.conv_id == 6L)
    organic.map(o => (o.pos, o.n_touches, o.credit_bp_linear,
      o.credit_bp_position)) shouldBe Seq((0L, 0L, 10000L, 10000L))
  }

  it should "match ops.Funnel.multiTouchAttribution on a randomized in-order stream" in {
    val rnd = new scala.util.Random(78)
    val types = Seq("ad", "email", "purchase", "noise")
    val fixture = (1L to 400L).map { id =>
      Ev(rnd.nextInt(25).toLong, id, id * mins(1), types(rnd.nextInt(types.size)))
    }.sortBy(e => (e.ts_us, e.event_id))
    val batches = fixture.grouped(37).map(_.toSeq).toSeq
    def key(u: Long, cus: Long, cid: Long, p: Long) = (u, cus, cid, p)
    val streaming = runMulti(batches, "mt_rand")
      .map(a => key(a.user_id, a.conv_us, a.conv_id, a.pos) ->
        (a.touch_id, a.touch_type, a.n_touches,
          a.credit_bp_linear, a.credit_bp_position)).toMap
    val batch = graft.ops.Funnel.multiTouchAttribution(
        fixture.toDF(), "user_id", "event_type", "ts_us", "event_id",
        "purchase", Seq("ad", "email"), gapUs)
      .collect().map { r =>
        def opt[T](c: String): Option[T] =
          Option(r.get(r.fieldIndex(c))).map(_.asInstanceOf[T])
        key(r.getAs[Long]("user_id"), r.getAs[Long]("conv_us"),
          r.getAs[Long]("conv_id"), r.getAs[Long]("pos")) ->
          (opt[Long]("touch_id"), opt[String]("touch_type"),
            r.getAs[Long]("n_touches"), r.getAs[Long]("credit_bp_linear"),
            r.getAs[Long]("credit_bp_position"))
      }.toMap
    streaming shouldBe batch
  }

  "timeDecay" should "match ops.Funnel.timeDecayAttribution on a randomized in-order stream" in {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(79)
    val types = Seq("ad", "email", "purchase", "noise")
    val fixture = (1L to 400L).map { id =>
      Ev(rnd.nextInt(25).toLong, id, id * mins(1), types(rnd.nextInt(types.size)))
    }.sortBy(e => (e.ts_us, e.event_id))
    val input = MemoryStream[Ev]
    val query = FunnelStream.timeDecay(input.toDS(), "purchase",
        Seq("ad", "email"), windowUs = gapUs, halfLifeUs = mins(90))
      .writeStream.format("memory").queryName("td_rand")
      .outputMode("append").start()
    val streaming = try {
      fixture.grouped(53).foreach { b =>
        input.addData(b.toSeq: _*); query.processAllAvailable()
      }
      spark.table("td_rand").as[FunnelStream.DecayAttribution].collect()
        .map(a => (a.user_id, a.conv_id, a.pos) ->
          (a.touch_id, a.halvings, a.weight, a.credit_bp_decay)).toMap
    } finally query.stop()
    val batch = graft.ops.Funnel.timeDecayAttribution(
        fixture.toDF(), "user_id", "event_type", "ts_us", "event_id",
        "purchase", Seq("ad", "email"), gapUs, mins(90))
      .collect().map { r =>
        def opt[T](c: String): Option[T] =
          Option(r.get(r.fieldIndex(c))).map(_.asInstanceOf[T])
        (r.getAs[Long]("user_id"), r.getAs[Long]("conv_id"),
          r.getAs[Long]("pos")) ->
          (opt[Long]("touch_id"), r.getAs[Long]("halvings"),
            r.getAs[Long]("weight"), r.getAs[Long]("credit_bp_decay"))
      }.toMap
    streaming shouldBe batch
  }

  // ----------------------------------------------------------- idle TTL
  // ProcessingTimeTimeout queries never latch `noNewData` (the engine
  // keeps a timeout deadline pending — the EventStreamSpec finding), so
  // processAllAvailable HANGS against them: these tests poll the memory
  // sink instead, and rely on the engine's own no-data micro-batches to
  // fire the expiry during the idle sleep.
  private def awaitRows(name: String, n: Long, timeoutMs: Long = 60000): Unit = {
    val t0 = System.currentTimeMillis()
    while (spark.table(name).count() < n) {
      if (System.currentTimeMillis() - t0 > timeoutMs)
        fail(s"timed out waiting for $n rows in $name " +
          s"(have ${spark.table(name).count()})")
      Thread.sleep(50)
    }
  }

  "idleTtl" should "expire idle funnel state and restart the returner at step 0" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = FunnelStream.timedFunnel(input.toDS(), steps, gapUs,
        idleTtl = Some(java.time.Duration.ofMillis(200)))
      .writeStream.format("memory").queryName("fs_ttl")
      .outputMode("append").start()
    try {
      // one batch → ONE advance record for user 1 (reached = 2)
      input.addData(Ev(1L, 1L, mins(0), "signup"), Ev(1L, 2L, mins(5), "click"))
      awaitRows("fs_ttl", 1)
      Thread.sleep(1500) // > TTL: the engine's no-data batches fire the expiry
      // user 1 returns with the event that WOULD have completed the funnel
      // (with state expired it cannot advance — purchase is not step 0),
      // then a fresh signup restarts at step 0: the forgotten-user contract
      input.addData(Ev(1L, 3L, mins(9), "purchase"), Ev(1L, 4L, mins(60), "signup"))
      awaitRows("fs_ttl", 2)
      val u1 = spark.table("fs_ttl").as[FunnelAdvance].collect()
        .filter(_.user_id == 1L).sortBy(a => (a.step_us.head, a.reached))
      u1.map(_.reached).toSeq shouldBe Seq(2, 1)
      u1.last.step_us shouldBe Seq(mins(60))
    } finally query.stop()
  }

  it should "leave results identical to the no-TTL form inside the horizon" in {
    // TTL far above any test-run idle gap: every deadline is re-armed
    // before it can fire. Advance-record GRANULARITY is batch-split-
    // dependent by design, so the invariant compared is the one the
    // operator guarantees: the latest (max-reached) row per user.
    val plain = runFunnel(Seq(evs), "fs_h0")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = FunnelStream.timedFunnel(input.toDS(), steps, gapUs,
        idleTtl = Some(java.time.Duration.ofHours(1)))
      .writeStream.format("memory").queryName("fs_h1")
      .outputMode("append").start()
    try {
      evs.foreach { e => input.addData(e); Thread.sleep(20) }
      def lastByUser(rows: Seq[FunnelAdvance]) =
        rows.groupBy(_.user_id).map { case (u, r) =>
          u -> r.maxBy(_.reached).step_us }
      val want = lastByUser(plain)
      val t0 = System.currentTimeMillis()
      var got = Map.empty[Long, Seq[Long]]
      while (got != want && System.currentTimeMillis() - t0 < 60000) {
        Thread.sleep(100)
        got = lastByUser(spark.table("fs_h1").as[FunnelAdvance].collect().toSeq)
      }
      got shouldBe want
    } finally query.stop()
  }

  it should "expire idle attribution state (multiTouch loses pre-gap touches)" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = FunnelStream.multiTouch(input.toDS(), "purchase",
        Seq("ad", "email"), gapUs,
        idleTtl = Some(java.time.Duration.ofMillis(200)))
      .writeStream.format("memory").queryName("mt_ttl")
      .outputMode("append").start()
    try {
      input.addData(Ev(1L, 1L, mins(0), "ad"), Ev(1L, 2L, mins(3), "email"))
      // touches emit nothing: wait for the batch via a sentinel conversion
      // of an unrelated user (1 organic row)
      input.addData(Ev(9L, 50L, mins(0), "purchase"))
      awaitRows("mt_ttl", 1)
      Thread.sleep(1500) // expiry fires in the engine's no-data batches
      // in-window conversion arrives AFTER expiry: organic (touches forgotten)
      input.addData(Ev(1L, 3L, mins(8), "purchase"))
      awaitRows("mt_ttl", 2)
      val u1 = spark.table("mt_ttl").as[FunnelStream.MultiAttribution]
        .collect().filter(_.user_id == 1L)
      u1.length shouldBe 1
      u1.head.n_touches shouldBe 0L
      u1.head.credit_bp_linear shouldBe 10000L
    } finally query.stop()
  }
}
