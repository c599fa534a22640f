package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[QuantileSketchExpression.MrlQuantiles]]: exact regime == true
  * nearest-rank quantiles regardless of partitioning; compacting regime
  * stays inside the deterministic-compactor rank-error envelope.
  */
class QuantileSketchSpec extends SparkSpec {

  import spark.implicits._

  private val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  private def sketchQuantiles(data: Seq[Double], capacity: Int,
                              partitions: Int): Seq[Double] =
    data.toDF("v").repartition(partitions)
      .agg(QuantileSketchExpression.mrl_quantiles(col("v"), capacity, probs).as("q"))
      .head().getSeq[Double](0)

  private def exactQuantiles(data: Seq[Double]): Seq[Double] = {
    val sorted = data.sorted
    probs.map { p =>
      val target = math.max(1L, math.ceil(p * sorted.length).toLong)
      sorted((target - 1).toInt)
    }
  }

  "mrl_quantiles" should "be exact when capacity >= n, for any partitioning" in {
    val rng = new scala.util.Random(3)
    val data = Seq.fill(700)(rng.nextInt(1000).toDouble)
    val expected = exactQuantiles(data)
    sketchQuantiles(data, capacity = 1024, partitions = 1) shouldBe expected
    sketchQuantiles(data, capacity = 1024, partitions = 8) shouldBe expected
  }

  it should "stay within the compactor rank-error envelope when lossy" in {
    val rng = new scala.util.Random(11)
    val n = 20000
    val data = Seq.fill(n)(rng.nextDouble() * 1e6)
    val sorted = data.sorted
    val got = sketchQuantiles(data, capacity = 256, partitions = 8)
    // measured rank of each answer vs requested rank, as a fraction of n.
    // Deterministic MRL compaction with capacity 256 over 20k items keeps
    // relative rank error well under 5% (theory: O(log^2(n/k)/k)).
    probs.zip(got).foreach { case (p, ans) =>
      val rank = sorted.count(_ <= ans)
      val err = math.abs(rank - p * n) / n
      withClue(s"p=$p ans=$ans rank=$rank: ") { err should be < 0.05 }
    }
  }

  it should "conserve weight through compaction (answers are real inputs)" in {
    val rng = new scala.util.Random(5)
    val data = Seq.fill(5000)(rng.nextInt(100).toDouble)
    val inputs = data.toSet
    val got = sketchQuantiles(data, capacity = 64, partitions = 4)
    got.foreach(v => inputs should contain(v))
    got shouldBe got.sorted // monotone in p
  }

  it should "ignore nulls and answer NaN on empty input" in {
    val df = Seq[java.lang.Double](1.0, null, 3.0).toDF("v")
    df.agg(QuantileSketchExpression.mrl_quantiles(col("v"), 64, Seq(0.5)))
      .head().getSeq[Double](0) shouldBe Seq(1.0)
    val empty = spark.emptyDataFrame.select(lit(1.0).as("v")).filter(lit(false))
    empty.agg(QuantileSketchExpression.mrl_quantiles(col("v"), 64, Seq(0.5)))
      .head().getSeq[Double](0).head.isNaN shouldBe true
  }
}
