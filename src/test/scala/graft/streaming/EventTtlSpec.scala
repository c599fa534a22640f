package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The round-15 EVENT-time TTL overloads (`*EventTtl`) across the
  * funnel / attribution / transition / path drivers. Contract under test:
  *
  *   - INSIDE-HORIZON PARITY: while no per-user event-time gap exceeds
  *     the TTL, output is identical to the never-expiring form.
  *   - EXPIRY FORGETS: once the watermark passes `ttl` beyond a user's
  *     latest event, their state drops — a returner restarts (funnel at
  *     step 0, attribution organic, no transition/path spans the gap).
  *   - REPLAY DETERMINISM: expiry is a function of the DATA (event times
  *     + watermark), not the wall clock — the same batches replayed at
  *     any speed (incl. with deliberate delays) produce IDENTICAL
  *     output, which the processing-time idleTtl form cannot offer.
  *
  * Watermark/timeout mechanics pinned here deliberately: a timed-out key
  * is only invoked with hasTimedOut on a batch where it has NO data, so
  * the fixtures advance the watermark with a sentinel user's events and
  * let one sentinel-only batch sweep the expired key before the returner
  * arrives.
  */
class EventTtlSpec extends SparkSpec {
  import spark.implicits._

  // all fixture times sit on a base offset: an event AT the initial
  // watermark (epoch 0) is filtered as late before it reaches the state
  // function (pinned here the hard way)
  private val BaseMin = 10000L
  private def tsOfMin(m: Long): Timestamp = new Timestamp((BaseMin + m) * 60000L)
  private def usOfMin(m: Long): Long = (BaseMin + m) * 60000000L

  private val ttl = java.time.Duration.ofMinutes(30)
  private val gapUs = 600L * 1000000L // funnel step gap: 10 min
  private val steps = Seq("signup", "click", "purchase")

  private def runFunnel(batches: Seq[Seq[FunnelStream.EvT]], name: String,
                        sleepBetweenMs: Long = 0): Seq[FunnelStream.FunnelAdvance] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelStream.EvT]
    val events = input.toDS().withWatermark("ts", "1 minute")
      .as[FunnelStream.EvT]
    val query = FunnelStream.timedFunnelEventTtl(events, steps, gapUs, ttl)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
        if (sleepBetweenMs > 0) Thread.sleep(sleepBetweenMs)
      }
      spark.table(name).as[FunnelStream.FunnelAdvance].collect().toSeq
    } finally query.stop()
  }

  private def evT(u: Long, id: Long, m: Long, t: String) =
    FunnelStream.EvT(u, id, tsOfMin(m), t)
  private def ev(u: Long, id: Long, m: Long, t: String) =
    FunnelStream.Ev(u, id, usOfMin(m), t)

  // user 1 progresses, goes idle past the TTL (watermark walked forward by
  // sentinel user 99), gets swept, then returns
  private val expiryBatches = Seq(
    Seq(evT(1L, 1L, 0, "signup"), evT(1L, 2L, 5, "click"),
      evT(99L, 90L, 6, "other")),
    // advance the watermark far past user 1's horizon (5 + 30 + 1-min delay)
    Seq(evT(99L, 91L, 120, "other")),
    // sentinel-only batch: sweeps user 1's timed-out state
    Seq(evT(99L, 92L, 121, "other")),
    // user 1 returns: purchase alone must NOT advance (state forgotten,
    // back at step 0 — only signup can start a fresh funnel)
    Seq(evT(1L, 3L, 125, "purchase"), evT(1L, 4L, 130, "signup")))

  "timedFunnelEventTtl" should "forget state once the watermark passes the horizon" in {
    val out = runFunnel(expiryBatches, "ettl_funnel_a")
    val u1 = out.filter(_.user_id == 1L)
    // one advance row per batch: reached 2 from the pre-gap batch
    // (signup+click together), then the RESTART at reached 1 anchored on
    // the post-gap signup — never reached 3 (the purchase found no state)
    u1.map(_.reached).sorted shouldBe Seq(1, 2)
    u1.filter(_.reached == 1).map(_.step_us.head) shouldBe Seq(usOfMin(130))
  }

  it should "replay deterministically regardless of processing speed" in {
    val fast = runFunnel(expiryBatches, "ettl_funnel_b")
    val slow = runFunnel(expiryBatches, "ettl_funnel_c", sleepBetweenMs = 400)
    // the processing-time idleTtl form would expire DIFFERENTLY under
    // delay; event-time expiry is a pure function of the data
    fast.sortBy(r => (r.user_id, r.reached)) shouldBe
      slow.sortBy(r => (r.user_id, r.reached))
  }

  it should "match the never-expiring form inside the horizon" in {
    // same shape, but every gap stays under the 30-min TTL and every
    // batch respects the 1-minute watermark lateness (an event behind the
    // watermark is filtered as late BEFORE the state function — fixture
    // events must stay in watermark order across batches)
    val inside = Seq(
      Seq(evT(1L, 1L, 0, "signup"), evT(1L, 2L, 5, "click")),
      Seq(evT(99L, 90L, 10, "other")),
      Seq(evT(1L, 3L, 12, "purchase")), // within funnel gap of click@5
      Seq(evT(1L, 4L, 25, "signup")))
    val withTtl = runFunnel(inside, "ettl_funnel_d")
      .sortBy(r => (r.user_id, r.reached))
    // reference: the idle form with NO ttl over the same events (Ev form)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelStream.Ev]
    val q = FunnelStream.timedFunnel(input.toDS(), steps, gapUs, None)
      .writeStream.format("memory").queryName("ettl_funnel_ref")
      .outputMode("append").start()
    try {
      inside.foreach { b =>
        if (b.nonEmpty)
          input.addData(b.map(e => FunnelStream.Ev(e.user_id, e.event_id,
            FunnelStream.usOf(e.ts), e.event_type)): _*)
        q.processAllAvailable()
      }
      val ref = spark.table("ettl_funnel_ref").as[FunnelStream.FunnelAdvance]
        .collect().toSeq.sortBy(r => (r.user_id, r.reached))
      withTtl shouldBe ref
    } finally q.stop()
  }

  "lastTouchEventTtl" should "turn post-expiry conversions organic" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelStream.EvT]
    val events = input.toDS().withWatermark("ts", "1 minute")
      .as[FunnelStream.EvT]
    val query = FunnelStream.lastTouchEventTtl(events, "purchase",
        Seq("ad"), windowUs = usOfMin(1000), eventTtl = ttl)
      .writeStream.format("memory").queryName("ettl_touch")
      .outputMode("append").start()
    try {
      Seq(
        Seq(evT(1L, 1L, 0, "ad")),
        Seq(evT(99L, 90L, 120, "other")),
        Seq(evT(99L, 91L, 121, "other")), // sweep user 1
        Seq(evT(1L, 2L, 125, "purchase")) // touch forgotten -> organic
      ).foreach { b => input.addData(b: _*); query.processAllAvailable() }
      val out = spark.table("ettl_touch").as[FunnelStream.Attribution]
        .collect().toSeq
      out should have size 1
      out.head.touch_id shouldBe None // organic despite the in-window ad
    } finally query.stop()
  }

  "multiTouchEventTtl and timeDecayEventTtl" should "forget touch history on expiry" in {
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq(evT(1L, 1L, 0, "ad"), evT(1L, 2L, 3, "email")),
      Seq(evT(99L, 90L, 120, "other")),
      Seq(evT(99L, 91L, 121, "other")),
      Seq(evT(1L, 3L, 125, "purchase")))
    val inputM = MemoryStream[FunnelStream.EvT]
    val qm = FunnelStream.multiTouchEventTtl(
        inputM.toDS().withWatermark("ts", "1 minute").as[FunnelStream.EvT],
        "purchase", Seq("ad", "email"), windowUs = usOfMin(1000), eventTtl = ttl)
      .writeStream.format("memory").queryName("ettl_multi")
      .outputMode("append").start()
    val inputD = MemoryStream[FunnelStream.EvT]
    val qd = FunnelStream.timeDecayEventTtl(
        inputD.toDS().withWatermark("ts", "1 minute").as[FunnelStream.EvT],
        "purchase", Seq("ad", "email"), windowUs = usOfMin(1000),
        halfLifeUs = usOfMin(10), eventTtl = ttl)
      .writeStream.format("memory").queryName("ettl_decay")
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        inputM.addData(b: _*); qm.processAllAvailable()
        inputD.addData(b: _*); qd.processAllAvailable()
      }
      val multi = spark.table("ettl_multi").as[FunnelStream.MultiAttribution]
        .collect().toSeq
      multi should have size 1
      (multi.head.n_touches, multi.head.credit_bp_linear) shouldBe ((0L, 10000L))
      val decay = spark.table("ettl_decay").as[FunnelStream.DecayAttribution]
        .collect().toSeq
      decay should have size 1
      (decay.head.n_touches, decay.head.credit_bp_decay) shouldBe ((0L, 10000L))
    } finally { qm.stop(); qd.stop() }
  }

  "transitionsEventTtl" should "not pair across the expiry gap" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TransitionStream.Ev]
    val events = input.toDS().withWatermark("ts", "1 minute")
      .as[TransitionStream.Ev]
    val query = TransitionStream.transitionsEventTtl(events, ttl)
      .writeStream.format("memory").queryName("ettl_trans")
      .outputMode("append").start()
    try {
      Seq(
        Seq(TransitionStream.Ev(1L, 1L, tsOfMin(0), "a"),
          TransitionStream.Ev(1L, 2L, tsOfMin(5), "b")),
        Seq(TransitionStream.Ev(99L, 90L, tsOfMin(120), "x")),
        Seq(TransitionStream.Ev(99L, 91L, tsOfMin(121), "x")), // sweep
        Seq(TransitionStream.Ev(1L, 3L, tsOfMin(125), "c"),
          TransitionStream.Ev(1L, 4L, tsOfMin(126), "d"))
      ).foreach { b => input.addData(b: _*); query.processAllAvailable() }
      val out = spark.table("ettl_trans").as[TransitionStream.Transition]
        .collect().toSeq.filter(_.user_id == 1L)
        .map(t => (t.from_type, t.to_type)).sorted
      // a->b before the gap, c->d after; NO b->c across the expiry
      out shouldBe Seq(("a", "b"), ("c", "d"))
    } finally query.stop()
  }

  "pathsEventTtl" should "restart the window after expiry" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PathStream.Ev]
    val events = input.toDS().withWatermark("ts", "1 minute")
      .as[PathStream.Ev]
    val query = PathStream.pathsEventTtl(events, k = 2, eventTtl = ttl)
      .writeStream.format("memory").queryName("ettl_paths")
      .outputMode("append").start()
    try {
      Seq(
        Seq(PathStream.Ev(1L, 1L, tsOfMin(0), "a"),
          PathStream.Ev(1L, 2L, tsOfMin(5), "b")),
        Seq(PathStream.Ev(99L, 90L, tsOfMin(120), "x"),
          PathStream.Ev(99L, 91L, tsOfMin(122), "y")),
        Seq(PathStream.Ev(99L, 92L, tsOfMin(123), "x")), // sweep user 1
        Seq(PathStream.Ev(1L, 3L, tsOfMin(125), "c"),
          PathStream.Ev(1L, 4L, tsOfMin(126), "d"))
      ).foreach { b => input.addData(b: _*); query.processAllAvailable() }
      val out = spark.table("ettl_paths").as[PathStream.PathHit]
        .collect().toSeq.filter(_.user_id == 1L).map(_.path).sorted
      // "a > b" before, "c > d" after; NO "b > c" spanning the gap
      out shouldBe Seq("a > b", "c > d")
    } finally query.stop()
  }
}
