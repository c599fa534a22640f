package graft.tools

import graft.ops.Sampling

/** Measure the driver-side offset build of
  * [[graft.ops.Sampling.systematicWeightedPerGroup]] at the verdict's
  * synthetic 10⁴-partition × 10³-group shape (10⁷ collected entries) —
  * the round-15 `weak` finding. The pre-fix quadratic form is timed at a
  * small shape and extrapolated (it cannot be run at 10⁷: ~10¹⁴
  * comparisons); the fixed sort-scan form is timed for real at the full
  * shape. No SparkSession needed — this is pure driver work by design.
  *
  * Usage: `sbt "runMain graft.tools.OffsetsProbe"`.
  */
object OffsetsProbe {

  /** The pre-round-16 quadratic form, kept verbatim for the A/B. */
  private def quadratic(
      partTotals: Array[(Int, String, Long)]): Map[(Int, String), Long] =
    partTotals.map { case (pid, g, _) =>
      (pid, g) -> partTotals
        .filter(x => x._2 == g && x._1 < pid).map(_._3).sum
    }.toMap

  private def shape(parts: Int, groups: Int): Array[(Int, String, Long)] =
    Array.tabulate(parts * groups) { i =>
      (i % parts, s"g${i / parts}", (i % 97).toLong)
    }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    // bit-identity at a shape both forms can run
    val small = shape(200, 50) // E = 10^4
    val (qOut, qSec) = time(quadratic(small))
    val (sOut, _) = time(Sampling.exclusiveOffsets(small))
    require(sOut == qOut, "sort-scan offsets diverge from quadratic reference")
    println(f"E=10^4 (200p x 50g): quadratic=${qSec}%.3fs, bit-identical ok")

    // quadratic at E=10^5 to anchor the extrapolation
    val mid = shape(1000, 100)
    val (_, qMidSec) = time(quadratic(mid))
    println(f"E=10^5 (1000p x 100g): quadratic=${qMidSec}%.2fs " +
      f"(=> ~${qMidSec * 1e4}%.0fs extrapolated at E=10^7)")

    // fixed form at the full verdict shape, twice (JIT warm)
    val full = shape(10000, 1000) // E = 10^7
    val (_, w) = time(Sampling.exclusiveOffsets(full))
    val (out, sec) = time(Sampling.exclusiveOffsets(full))
    require(out.size == full.length)
    println(f"E=10^7 (10^4p x 10^3g): sort-scan cold=${w}%.2fs warm=${sec}%.2fs")
    println(s"""{"metric":"offsets_e7_sec","value":$sec,"unit":"sec","quadratic_e5_sec":$qMidSec}""")
  }
}
