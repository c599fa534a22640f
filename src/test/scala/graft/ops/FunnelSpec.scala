package graft.ops

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

  it should "reject bad arguments" in {
    an[IllegalArgumentException] should be thrownBy
      Funnel.timedFunnel(Seq((1L, "A", 1L)).toDF("u", "t", "ts"),
        "u", "t", "ts", Seq("A"), 10L)
    an[IllegalArgumentException] should be thrownBy
      Funnel.timedFunnel(Seq((1L, "A", 1L)).toDF("u", "t", "ts"),
        "u", "t", "ts", Seq("A", "B"), 0L)
  }
}
