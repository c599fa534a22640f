package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def batchEvents = Seq(
    EventStream.Event(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
    EventStream.Event(2, ts("2024-01-01 00:10:00"), 1, "error", 2.0),
    EventStream.Event(3, ts("2024-01-01 01:05:00"), 1, "click", 3.0),
    EventStream.Event(4, ts("2024-01-01 00:30:00"), 2, "click", 4.0)).toDS()

  "classifySessions" should "label bounce / abandoned / converted with conversion precedence" in {
    val evs = Seq(
      // user 1, session 0: click then purchase within the gap → converted
      EventStream.Event(1, ts("2024-01-01 00:00:00"), 1, "click", 0),
      EventStream.Event(2, ts("2024-01-01 00:10:00"), 1, "purchase", 0),
      // user 1, session 1 (after >30 min gap): single click → bounce
      EventStream.Event(3, ts("2024-01-01 02:00:00"), 1, "click", 0),
      // user 2, one session, clicks but never purchases → abandoned
      EventStream.Event(4, ts("2024-01-01 00:00:00"), 2, "click", 0),
      EventStream.Event(5, ts("2024-01-01 00:05:00"), 2, "view", 0),
      // user 3: a SINGLE-event purchase session — conversion beats bounce
      EventStream.Event(6, ts("2024-01-01 00:00:00"), 3, "purchase", 0)).toDS()
    val out = EventStream.classifySessions(evs.toDF(),
        tsMicros = expr("unix_micros(ts)"),
        tieBreak = col("event_id"),
        gapMicros = 30L * 60 * 1000000, convertType = "purchase")
      .orderBy("user_id", "session_idx").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx"),
        r.getAs[Long]("n_events"), r.getAs[Long]("duration_us"),
        r.getAs[String]("outcome")))
    out shouldBe Array(
      (1L, 0L, 2L, 600000000L, "converted"),
      (1L, 1L, 1L, 0L, "bounce"),
      (2L, 0L, 2L, 300000000L, "abandoned"),
      (3L, 0L, 1L, 0L, "converted"))
  }

  "classifySessions" should "equal a driver-side reference on randomized event sets" in {
    val rnd = new scala.util.Random(31)
    val types = Seq("click", "view", "purchase")
    val events = (1 to 400).map { id =>
      EventStream.Event(id.toLong,
        new java.sql.Timestamp(1704067200000L + rnd.nextInt(500000) * 1000L),
        rnd.nextInt(12).toLong, types(rnd.nextInt(types.size)), 0)
    }
    val gapUs = 60000000L // 60 s
    val expected = events.groupBy(_.user_id).flatMap { case (u, mine) =>
      val sorted = mine.sortBy(e => (e.ts.getTime, e.event_id))
        .map(e => (e.ts.getTime * 1000L, e.event_type))
      // split where the gap exceeds gapUs
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
        case (acc @ (cur :: rest), e) =>
          if (e._1 - cur.head._1 > gapUs) List(e) :: acc
          else (e :: cur) :: rest
        case (Nil, e) => List(List(e))
      }.map(_.reverse).reverse
      sessions.zipWithIndex.map { case (s, i) =>
        val convs = s.count(_._2 == "purchase").toLong
        val outcome =
          if (convs > 0) "converted"
          else if (s.size == 1) "bounce" else "abandoned"
        (u, i.toLong, s.size.toLong, s.last._1 - s.head._1, outcome)
      }
    }.toSet
    val got = EventStream.classifySessions(events.toDF(),
        tsMicros = expr("unix_micros(ts)"), tieBreak = col("event_id"),
        gapMicros = gapUs, convertType = "purchase")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx"),
        r.getAs[Long]("n_events"), r.getAs[Long]("duration_us"),
        r.getAs[String]("outcome"))).toSet
    got shouldBe expected
  }

  "windowedCounts" should "aggregate per event-time window and user (batch parity)" in {
    val out = EventStream.windowedCounts(batchEvents.toDF())
      .orderBy("user_id", "window_start").collect()
    out.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
      r.getAs[Long]("n_errors"))) shouldBe
      Array((1L, 2L, 1L), (1L, 1L, 0L), (2L, 1L, 0L))
  }

  it should "run as a streaming query over MemoryStream" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val query = EventStream.windowedCounts(input.toDF(), watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      input.addData(
        EventStream.Event(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
        EventStream.Event(2, ts("2024-01-01 00:20:00"), 1, "error", 2.0))
      query.processAllAvailable()
      // advance watermark far enough to close the first hour's window
      input.addData(EventStream.Event(9, ts("2024-01-01 02:30:00"), 9, "click", 0.0))
      query.processAllAvailable()
      val rows = spark.table("win_counts")
        .filter(col("user_id") === 1).collect()
      rows.length shouldBe 1
      rows.head.getAs[Long]("n_events") shouldBe 2
      rows.head.getAs[Long]("n_errors") shouldBe 1
    } finally query.stop()
  }

  "dedupWithinWatermark" should "drop duplicate keys inside the watermark horizon" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val query = EventStream.dedupWithinWatermark(input.toDF(), Seq("event_id"),
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(
        EventStream.Event(1, ts("2024-01-01 00:00:00"), 1, "a", 0),
        EventStream.Event(1, ts("2024-01-01 00:01:00"), 1, "a-dup", 0),
        EventStream.Event(2, ts("2024-01-01 00:02:00"), 1, "b", 0))
      query.processAllAvailable()
      input.addData(
        EventStream.Event(1, ts("2024-01-01 00:03:00"), 1, "a-dup2", 0))
      query.processAllAvailable()
      val types = spark.table("dedup_stream")
        .select("event_type").as[String].collect().sorted
      types shouldBe Array("a", "b") // both duplicates of id 1 dropped
    } finally query.stop()
  }

  it should "fall back to plain dropDuplicates on batch frames" in {
    val out = EventStream.dedupWithinWatermark(
      Seq(EventStream.Event(1, ts("2024-01-01 00:00:00"), 1, "a", 0),
        EventStream.Event(1, ts("2024-01-01 00:05:00"), 1, "b", 0)).toDS().toDF(),
      Seq("event_id"))
    out.count() shouldBe 1
  }

  "enrich" should "broadcast-join a static dim into a stream per micro-batch" in {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[EventStream.Event]
    val query = EventStream.enrich(input.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData(
        EventStream.Event(1, ts("2024-01-01 00:00:00"), 1, "a", 0),
        EventStream.Event(2, ts("2024-01-01 00:01:00"), 3, "b", 0))
      query.processAllAvailable()
      val rows = spark.table("enriched")
        .select("user_id", "tier").as[(Long, Option[String])].collect().toMap
      rows(1L) shouldBe Some("gold")
      rows(3L) shouldBe None // unmatched key stays (left join), no fan-out
      spark.table("enriched").count() shouldBe 2
    } finally query.stop()
  }

  "sessionize" should "split on the event-time gap in batch mode" in {
    val events = Seq(
      EventStream.Event(1, ts("2024-01-01 00:00:00"), 1, "a", 0),
      EventStream.Event(2, ts("2024-01-01 00:10:00"), 1, "b", 0),
      EventStream.Event(3, ts("2024-01-01 03:00:00"), 1, "c", 0), // > 1h gap → new session
      EventStream.Event(4, ts("2024-01-01 00:00:00"), 2, "d", 0)).toDS()
    // batch flatMapGroupsWithState: timeouts never fire; only CLOSED sessions
    // are emitted, so the trailing open session per user stays in state.
    val sessions = EventStream.sessionize(events, gapMs = 3600 * 1000L).collect()
    sessions.length shouldBe 1
    val s = sessions.head
    (s.user_id, s.n_events) shouldBe ((1L, 2L))
    s.session_start shouldBe ts("2024-01-01 00:00:00")
    s.session_end shouldBe ts("2024-01-01 00:10:00")
  }

  "sessionizeClassified" should "emit closed sessions with their outcome" in {
    // user 1: session (click, purchase) closes when the >gap event
    // arrives → converted; the trailing single-click session stays open
    // (batch mode: timeouts never fire); user 2's two-click session
    // stays open too
    val events = Seq(
      EventStream.Event(1, ts("2024-01-01 00:00:00"), 1, "click", 0),
      EventStream.Event(2, ts("2024-01-01 00:10:00"), 1, "purchase", 0),
      EventStream.Event(3, ts("2024-01-01 03:00:00"), 1, "click", 0),
      EventStream.Event(4, ts("2024-01-01 00:00:00"), 2, "click", 0),
      EventStream.Event(5, ts("2024-01-01 00:05:00"), 2, "click", 0)).toDS()
    val out = EventStream.sessionizeClassified(events, gapMs = 3600 * 1000L,
      convertType = "purchase").collect()
    out.length shouldBe 1
    val s = out.head
    (s.user_id, s.n_events, s.n_conversions, s.outcome) shouldBe
      ((1L, 2L, 1L, "converted"))
  }

  it should "classify bounce and abandoned on gap-closed sessions" in {
    // same state machine the streaming batches run; like `sessionize`,
    // ONLY the gap-closure path is driven here — processAllAvailable
    // against a live ProcessingTimeTimeout query hangs (the engine keeps
    // a timeout deadline pending), which is why the sessionize family is
    // spec'd in batch mode
    val events = Seq(
      EventStream.Event(1, ts("2024-01-01 00:00:00"), 1, "click", 0),
      EventStream.Event(2, ts("2024-01-01 00:00:00"), 2, "click", 0),
      EventStream.Event(3, ts("2024-01-01 00:05:00"), 2, "view", 0),
      // far-future events close both earlier sessions via the gap
      EventStream.Event(4, ts("2024-01-01 05:00:00"), 1, "click", 0),
      EventStream.Event(5, ts("2024-01-01 05:00:00"), 2, "click", 0)).toDS()
    val rows = EventStream.sessionizeClassified(events,
        gapMs = 3600 * 1000L, convertType = "purchase")
      .collect().map(s => (s.user_id, s.n_events, s.outcome)).sortBy(_._1)
    rows shouldBe Array((1L, 1L, "bounce"), (2L, 2L, "abandoned"))
  }

  // The text-pipeline classifiers are stateless column expressions, so they
  // must compose onto unbounded streams unchanged — prove it live.
  "qualityFilter and langId" should "run on a streaming frame" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val flagged = graft.ops.TextStats.qualityFilter(docs, "text")
      .withColumn("lang_hint", graft.ops.TextStats.langId(col("text")))
    val query = flagged.writeStream.format("memory").queryName("stream_quality")
      .outputMode("append").start()
    try {
      input.addData(1L -> "the quick brown fox jumps over the lazy dog today",
        2L -> "too short")
      query.processAllAvailable()
      val rows = spark.table("stream_quality")
        .select("doc_id", "keep", "fail_reason", "lang_hint")
        .as[(Long, Boolean, Option[String], String)].collect().sortBy(_._1)
      rows shouldBe Array((1L, true, None, "en"),
        (2L, false, Some("too_few_tokens"), "und"))
    } finally query.stop()
  }
}
