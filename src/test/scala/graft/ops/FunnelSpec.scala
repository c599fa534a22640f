package graft.ops

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** [[Funnel.timedFunnel]]: hand-computed first-touch chains, gap
  * enforcement, strict ordering, and the greedy-anchor definition.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("A", "B", "C")
  private val gap = 100L

  private def run(rows: Seq[(Long, String, Long)]) =
    Funnel.timedFunnel(rows.toDF("u", "t", "ts"), "u", "t", "ts", steps, gap)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getInt(4))))
      .toMap

  "timedFunnel" should "chain first-touch steps within the gap" in {
    val out = run(Seq(
      // user 1: full conversion — B at +50 of A, C at +80 of B
      (1L, "A", 1000L), (1L, "B", 1050L), (1L, "C", 1130L),
      // user 2: B too late (+150 > gap) — stops at step 1
      (2L, "A", 1000L), (2L, "B", 1150L), (2L, "C", 1200L),
      // user 3: reaches B; C within gap of A but NOT of B's +90 → C at
      // +180 of A is within gap of B (90+100=190) — reaches 3
      (3L, "A", 1000L), (3L, "B", 1090L), (3L, "C", 1180L),
      // user 4: no A at all — absent from output
      (4L, "B", 1000L), (4L, "C", 1010L)))
    out(1L) shouldBe ((Some(1000L), Some(1050L), Some(1130L), 3))
    out(2L) shouldBe ((Some(1000L), None, None, 1))
    out(3L) shouldBe ((Some(1000L), Some(1090L), Some(1180L), 3))
    out.contains(4L) shouldBe false
  }

  it should "anchor greedily on the FIRST step-1 event (definition, not optimization)" in {
    // A at 0 and 500; B only at 450: within gap of NEITHER first A
    // (450 > 100) — greedy first-touch does not retry the later A
    val out = run(Seq((7L, "A", 0L), (7L, "A", 500L), (7L, "B", 450L)))
    out(7L) shouldBe ((Some(0L), None, None, 1))
  }

  it should "require strict progression (same-timestamp step does not chain)" in {
    val out = run(Seq((8L, "A", 100L), (8L, "B", 100L), (8L, "C", 150L)))
    out(8L)._2 shouldBe None // B at ts == A's ts is not AFTER it
  }

  it should "pick the earliest in-window event per step" in {
    val out = run(Seq((9L, "A", 0L), (9L, "B", 90L), (9L, "B", 10L),
      (9L, "C", 60L)))
    // B chosen at 10 (earliest in-window), C at 60 within gap of 10
    out(9L) shouldBe ((Some(0L), Some(10L), Some(60L), 3))
  }

  "lastTouchAttribution" should "credit the latest in-window touch with id tie-break" in {
    val rows = Seq(
      // conv at 100: touches at 40 (click) and 90 (view), window 80 →
      // latest is 90
      (1L, "click", 40L, 10L), (1L, "view", 90L, 11L),
      (1L, "purchase", 100L, 12L),
      // conv at 300: nearest touch at 90 is outside the 80-window → organic
      (1L, "purchase", 300L, 13L),
      // user 2: two touches at the SAME ts — larger id wins
      (2L, "click", 50L, 20L), (2L, "view", 50L, 21L),
      (2L, "purchase", 60L, 22L),
      // touch exactly AT the conversion ts is NOT strictly before → organic
      (3L, "click", 70L, 30L), (3L, "purchase", 70L, 31L))
      .toDF("u", "t", "ts", "id")
    val out = Funnel.lastTouchAttribution(rows, "u", "t", "ts", "id",
        "purchase", Seq("click", "view"), windowUs = 80L)
      .collect()
      .map(r => r.getAs[Long]("conv_id") ->
        ((Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))))
      .toMap
    out(12L) shouldBe ((Some(90L), Some(11L), Some("view")))
    out(13L) shouldBe ((None, None, None)) // organic bucket kept
    out(22L) shouldBe ((Some(50L), Some(21L), Some("view"))) // id tie-break
    out(31L) shouldBe ((None, None, None)) // strict inequality
  }

  it should "equal a driver-side reference on randomized event sets" in {
    val rnd = new scala.util.Random(11)
    val types = Seq("click", "view", "purchase", "error")
    val events = (1 to 400).map { id =>
      (rnd.nextInt(12).toLong, types(rnd.nextInt(types.size)),
        rnd.nextInt(1000).toLong, id.toLong)
    }
    val window = 150L
    // reference: per conversion, latest (ts, id) touch strictly before
    // and within the window
    val expected = events.filter(_._2 == "purchase").map { case (u, _, ts, id) =>
      val cands = events.filter { case (u2, t2, ts2, _) =>
        u2 == u && Seq("click", "view").contains(t2) &&
          ts2 < ts && ts2 >= ts - window
      }
      val win = if (cands.isEmpty) None
        else Some(cands.maxBy(c => (c._3, c._4)))
      id -> win.map(c => (c._3, c._4, c._2))
    }.toMap
    val got = Funnel.lastTouchAttribution(
        events.toDF("u", "t", "ts", "id"), "u", "t", "ts", "id",
        "purchase", Seq("click", "view"), window)
      .collect()
      .map(r => r.getAs[Long]("conv_id") ->
        (if (r.isNullAt(3)) None
         else Some((r.getLong(3), r.getLong(4), r.getString(5)))))
      .toMap
    got shouldBe expected
  }

  "firstTouchAttribution" should "credit the earliest in-window touch with smallest-id tie-break" in {
    val rows = Seq(
      (1L, "click", 40L, 10L), (1L, "view", 90L, 11L),
      (1L, "purchase", 100L, 12L),
      (1L, "purchase", 300L, 13L), // organic: 90 outside the 80-window
      (2L, "click", 50L, 20L), (2L, "view", 50L, 21L),
      (2L, "purchase", 60L, 22L), // same-ts tie → SMALLEST id
      (3L, "click", 70L, 30L), (3L, "purchase", 70L, 31L)) // strict before
      .toDF("u", "t", "ts", "id")
    val out = Funnel.firstTouchAttribution(rows, "u", "t", "ts", "id",
        "purchase", Seq("click", "view"), windowUs = 80L)
      .collect()
      .map(r => r.getAs[Long]("conv_id") ->
        ((Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))))
      .toMap
    out(12L) shouldBe ((Some(40L), Some(10L), Some("click"))) // earliest
    out(13L) shouldBe ((None, None, None))
    out(22L) shouldBe ((Some(50L), Some(20L), Some("click"))) // min id
    out(31L) shouldBe ((None, None, None))
  }

  "multiTouchAttribution" should "split integer credit per the linear and position models" in {
    def touches(u: Long, n: Int, base: Long, idBase: Long) =
      (0 until n).map(i => (u, "click", base + i * 10L, idBase + i))
    val rows = (touches(1L, 5, 10L, 100L) :+ (1L, "purchase", 70L, 105L)) ++
      (touches(2L, 3, 10L, 200L) :+ (2L, "purchase", 50L, 203L)) ++
      (touches(3L, 2, 10L, 300L) :+ (3L, "purchase", 30L, 302L)) ++
      (touches(4L, 1, 10L, 400L) :+ (4L, "purchase", 20L, 401L)) ++
      Seq((5L, "purchase", 20L, 500L)) // organic
    val out = Funnel.multiTouchAttribution(rows.toDF("u", "t", "ts", "id"),
        "u", "t", "ts", "id", "purchase", Seq("click", "view"),
        windowUs = 1000L)
      .collect()
      .groupBy(_.getAs[Long]("conv_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("pos"))
        .map(r => (r.getAs[Long]("pos"), r.getAs[Long]("credit_bp_linear"),
          r.getAs[Long]("credit_bp_position")))).toMap
    // n=5: linear 2000 each; position 4000, 666×3, last 4000+remainder 2
    out(105L) shouldBe Seq((1L, 2000L, 4000L), (2L, 2000L, 666L),
      (3L, 2000L, 666L), (4L, 2000L, 666L), (5L, 2000L, 4002L))
    // n=3: linear 3333, 3333, 3334; position 4000, 2000, 4000
    out(203L) shouldBe Seq((1L, 3333L, 4000L), (2L, 3333L, 2000L),
      (3L, 3334L, 4000L))
    out(302L) shouldBe Seq((1L, 5000L, 5000L), (2L, 5000L, 5000L))
    out(401L) shouldBe Seq((1L, 10000L, 10000L))
    out(500L) shouldBe Seq((0L, 10000L, 10000L)) // organic, full credit
  }

  it should "sum to exactly 10000 bp per conversion on randomized events" in {
    val rnd = new scala.util.Random(23)
    val types = Seq("click", "view", "purchase")
    val events = (1 to 500).map { id =>
      (rnd.nextInt(15).toLong, types(rnd.nextInt(types.size)),
        rnd.nextInt(800).toLong, id.toLong)
    }
    val out = Funnel.multiTouchAttribution(
        events.toDF("u", "t", "ts", "id"), "u", "t", "ts", "id",
        "purchase", Seq("click", "view"), windowUs = 200L)
      .collect()
    val perConv = out.groupBy(_.getAs[Long]("conv_id"))
    perConv.size shouldBe events.count(_._2 == "purchase")
    perConv.values.foreach { rows =>
      rows.map(_.getAs[Long]("credit_bp_linear")).sum shouldBe 10000L
      rows.map(_.getAs[Long]("credit_bp_position")).sum shouldBe 10000L
      val n = rows.head.getAs[Long]("n_touches")
      rows.length.toLong shouldBe math.max(n, 1L)
      rows.map(_.getAs[Long]("pos")).sorted shouldBe
        (if (n == 0) Seq(0L) else (1L to n))
    }
  }

  "timeDecayAttribution" should "halve weight per half-life and give the flooring remainder to the last touch" in {
    // half-life 60 µs, window 1000 µs; touches at ages 130, 70, 5 before
    // the conversion at ts 200 → halvings 2, 1, 0 → weights 2500, 5000,
    // 10000 (wsum 17500) → floored credits 1428, 2857, 5714; the last
    // (newest) touch absorbs the remainder: 5715. Sum = 10000 exactly.
    val rows = Seq(
      (1L, "click", 70L, 1L), (1L, "click", 130L, 2L), (1L, "click", 195L, 3L),
      (1L, "purchase", 200L, 9L),
      (2L, "purchase", 100L, 10L)) // organic
      .toDF("u", "t", "ts", "id")
    val out = Funnel.timeDecayAttribution(rows, "u", "t", "ts", "id",
        "purchase", Seq("click", "view"), windowUs = 1000L, halfLifeUs = 60L)
      .collect()
      .groupBy(_.getAs[Long]("conv_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("pos"))
        .map(r => (r.getAs[Long]("halvings"), r.getAs[Long]("weight"),
          r.getAs[Long]("credit_bp_decay")))).toMap
    out(9L) shouldBe Seq((2L, 2500L, 1428L), (1L, 5000L, 2857L),
      (0L, 10000L, 5715L))
    out(10L) shouldBe Seq((0L, 0L, 10000L))
  }

  it should "cap halvings at 13 and still sum to exactly 10000 bp on randomized events" in {
    val rnd = new scala.util.Random(29)
    val types = Seq("click", "view", "purchase")
    val events = (1 to 500).map { id =>
      (rnd.nextInt(15).toLong, types(rnd.nextInt(types.size)),
        rnd.nextInt(800).toLong, id.toLong)
    }
    val out = Funnel.timeDecayAttribution(
        events.toDF("u", "t", "ts", "id"), "u", "t", "ts", "id",
        "purchase", Seq("click", "view"), windowUs = 790L, halfLifeUs = 3L)
      .collect()
    out.groupBy(_.getAs[Long]("conv_id")).values.foreach { rows =>
      rows.map(_.getAs[Long]("credit_bp_decay")).sum shouldBe 10000L
      // 790/3 > 13: the cap must hold and weights stay >= 1
      rows.foreach { r =>
        r.getAs[Long]("halvings") should be <= 13L
        if (r.getAs[Long]("n_touches") > 0) {
          r.getAs[Long]("weight") should be >= 1L
          r.getAs[Long]("credit_bp_decay") should be >= 0L
        }
      }
    }
  }

  "topPaths" should "count consecutive k-windows per user in time order" in {
    val rows = Seq(
      // user 1: A B A B → paths "A B A", "B A B"
      (1L, "A", 10L, 1L), (1L, "B", 20L, 2L), (1L, "A", 30L, 3L),
      (1L, "B", 40L, 4L),
      // user 2: A B A → "A B A" again; windows never span users
      (2L, "A", 10L, 5L), (2L, "B", 20L, 6L), (2L, "A", 30L, 7L))
      .toDF("u", "t", "ts", "id")
    val out = Funnel.topPaths(rows, "u", "t", "ts", col("id"), k = 3,
        topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    out shouldBe Array(("A > B > A", 2L), ("B > A > B", 1L))
  }

  it should "order same-timestamp events by the tie-break" in {
    val rows = Seq(
      (1L, "X", 10L, 2L), (1L, "Y", 10L, 1L), (1L, "Z", 20L, 3L))
      .toDF("u", "t", "ts", "id")
    val out = Funnel.topPaths(rows, "u", "t", "ts", col("id"), k = 3,
        topN = 5)
      .collect().map(_.getString(0))
    out shouldBe Array("Y > X > Z") // id order within the tied ts
  }

  "randomized references" should "confirm timedFunnel equals a driver-side chain walk" in {
    val rnd = new scala.util.Random(23)
    val types = Seq("A", "B", "C", "noise")
    val events = (1 to 500).map { id =>
      (rnd.nextInt(15).toLong, types(rnd.nextInt(types.size)),
        rnd.nextInt(800).toLong)
    }
    val gapR = 120L
    def ref(u: Long): Option[(Long, Option[Long], Option[Long])] = {
      val mine = events.filter(_._1 == u)
      val s1 = mine.filter(_._2 == "A").map(_._3).minOption
      s1.map { a =>
        val s2 = mine.filter(e => e._2 == "B" && e._3 > a && e._3 <= a + gapR)
          .map(_._3).minOption
        val s3 = s2.flatMap(b => mine
          .filter(e => e._2 == "C" && e._3 > b && e._3 <= b + gapR)
          .map(_._3).minOption)
        (a, s2, s3)
      }
    }
    val expected = events.map(_._1).distinct.flatMap(u =>
      ref(u).map(u -> _)).toMap
    val got = Funnel.timedFunnel(events.toDF("u", "t", "ts"),
        "u", "t", "ts", Seq("A", "B", "C"), gapR)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap
    got shouldBe expected
  }

  it should "confirm topPaths equals a driver-side sliding-window count" in {
    val rnd = new scala.util.Random(29)
    val types = Seq("A", "B", "C")
    val events = (1 to 300).map { id =>
      (rnd.nextInt(10).toLong, types(rnd.nextInt(types.size)),
        rnd.nextInt(500).toLong, id.toLong)
    }
    val expected = events.groupBy(_._1).values.flatMap { mine =>
      mine.sortBy(e => (e._3, e._4)).map(_._2).sliding(3)
        .filter(_.size == 3).map(_.mkString(" > "))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val topExpected = expected.toSeq
      .sortBy { case (p, n) => (-n, p) }.take(10)
    val got = Funnel.topPaths(events.toDF("u", "t", "ts", "id"),
        "u", "t", "ts", col("id"), k = 3, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    got shouldBe topExpected
  }

  it should "reject bad arguments" in {
    an[IllegalArgumentException] should be thrownBy
      Funnel.timedFunnel(Seq((1L, "A", 1L)).toDF("u", "t", "ts"),
        "u", "t", "ts", Seq("A"), 10L)
    an[IllegalArgumentException] should be thrownBy
      Funnel.timedFunnel(Seq((1L, "A", 1L)).toDF("u", "t", "ts"),
        "u", "t", "ts", Seq("A", "B"), 0L)
  }
}
