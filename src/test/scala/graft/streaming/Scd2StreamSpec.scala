package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.streaming.Scd2Stream.{Observation, Transition}

/** [[Scd2Stream]]: version-transition semantics, unchanged-record
  * suppression, stale-replay tolerance, and batch-boundary independence.
  */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[Observation]]): Seq[Transition] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Observation]
    val name = s"scd2_${batches.hashCode.abs}_${System.identityHashCode(batches)}"
    val query = Scd2Stream.transitions(input.toDS())
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

  private val o1 = Observation(1L, "h1", "alpha", "2026-01-01")
  private val o1same = Observation(1L, "h1", "alpha", "2026-01-15")
  private val o1v2 = Observation(1L, "h2", "alpha v2", "2026-02-01")
  private val o2 = Observation(2L, "h9", "beta", "2026-01-05")

  "transitions" should "open, suppress unchanged, and close+reopen on change" in {
    val out = run(Seq(Seq(o1, o2), Seq(o1same), Seq(o1v2)))
    out.toSet shouldBe Set(
      Transition(1L, "alpha", "h1", "2026-01-01", None, true),
      Transition(2L, "beta", "h9", "2026-01-05", None, true),
      Transition(1L, "alpha", "h1", "2026-01-01", Some("2026-02-01"), false),
      Transition(1L, "alpha v2", "h2", "2026-02-01", None, true))
  }

  it should "be batch-boundary independent" in {
    val all = Seq(o1, o1same, o1v2)
    run(Seq(all)).toSet shouldBe run(all.map(Seq(_))).toSet
  }

  it should "ignore stale replays" in {
    val late = Observation(1L, "h0", "ancient", "2025-06-01")
    val out = run(Seq(Seq(o1), Seq(late)))
    out.toSet shouldBe Set(
      Transition(1L, "alpha", "h1", "2026-01-01", None, true))
  }
}
