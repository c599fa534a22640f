package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Curation]] — per-group caps (value + the WindowGroupLimit plan shape
  * that makes them scale), fixed-schema pivot counts, per-group ntile
  * tiers.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a", 100L), (2L, "a", 90L), (3L, "a", 90L), (4L, "a", 80L),
    (5L, "b", 50L), (6L, "b", 60L),
    (7L, "c", 10L))
    .toDF("doc_id", "source", "n_chars")

  "capPerGroup" should "keep the top n per group under the explicit order" in {
    val out = Curation.capPerGroup(docs, "source",
        Seq(col("n_chars").desc, col("doc_id").asc), n = 2)
      .orderBy("source", "rk")
      .as[(Long, String, Long, Int)].collect()
    out shouldBe Array(
      (1L, "a", 100L, 1), (2L, "a", 90L, 2), // doc 3 ties on 90, loses on id
      (6L, "b", 60L, 1), (5L, "b", 50L, 2),
      (7L, "c", 10L, 1))
  }

  it should "plan as WindowGroupLimit (pre-shuffle group pruning)" in {
    val plan = Curation.capPerGroup(docs, "source",
        Seq(col("n_chars").desc, col("doc_id").asc), n = 2)
      .queryExecution.executedPlan.toString
    withClue(plan) { plan should include("WindowGroupLimit") }
  }

  "pivotCounts" should "emit the fixed schema with zero-filled absences" in {
    val out = Curation.pivotCounts(docs, "source", "n_chars",
        values = Seq("90", "50", "999"))
      .orderBy("source")
    out.columns.toSeq shouldBe Seq("source", "90", "50", "999")
    out.as[(String, Long, Long, Long)].collect() shouldBe Array(
      ("a", 2L, 0L, 0L), ("b", 0L, 1L, 0L), ("c", 0L, 0L, 0L))
  }

  "ntileTiers" should "bucket per group with larger buckets first" in {
    val out = Curation.ntileTiers(docs, "source",
        Seq(col("n_chars").desc, col("doc_id").asc), tiles = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long, Int)].collect()
    // source a: 4 rows -> tiers (1,1,2,2) in order 100,90(id2),90(id3),80
    out.filter(_._2 == "a").map(_._4).toSeq shouldBe Seq(1, 1, 2, 2)
    // source b: 2 rows -> 60 tier 1, 50 tier 2
    out.filter(_._2 == "b").sortBy(-_._3).map(_._4).toSeq shouldBe Seq(1, 2)
    // source c: 1 row -> tier 1
    out.filter(_._2 == "c").map(_._4).toSeq shouldBe Seq(1)
  }

  "tokenBudgetPerGroup" should "fill each group to its budget, boundary doc included" in {
    val out = Curation.tokenBudgetPerGroup(docs, "source", "n_chars",
        Seq(col("n_chars").desc, col("doc_id").asc),
        budgetByGroup = Map("b" -> 55L), defaultBudget = 195L)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    // a (budget 195, order 100,90(2),90(3),80): cum 100,190,280 — doc 3
    //   starts at 190 < 195 so it's the included boundary doc; doc 4 not
    // b (budget 55, order 60,50): doc 6 kept (0 < 55), doc 5 starts at 60
    // c (budget 195): 10 kept
    out.map(r => (r._1, r._4)) shouldBe
      Array((1L, 100L), (2L, 190L), (3L, 280L), (6L, 60L), (7L, 10L))
  }

  it should "enforce strict-under semantics when inclusive = false" in {
    val out = Curation.tokenBudgetPerGroup(docs, "source", "n_chars",
        Seq(col("n_chars").desc, col("doc_id").asc),
        budgetByGroup = Map.empty, defaultBudget = 195L, inclusive = false)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    // a: cum 100,190,280 -> docs 1,2 only (280 > 195)
    out.filter(_._2 == "a").map(_._1).toSeq shouldBe Seq(1L, 2L)
  }

  it should "reject invalid arguments" in {
    an[IllegalArgumentException] should be thrownBy
      Curation.capPerGroup(docs, "source", Seq(col("doc_id")), 0)
    an[IllegalArgumentException] should be thrownBy
      Curation.pivotCounts(docs, "source", "n_chars", Nil)
    an[IllegalArgumentException] should be thrownBy
      Curation.ntileTiers(docs, "source", Seq(col("doc_id")), 0)
    an[IllegalArgumentException] should be thrownBy
      Curation.tokenBudgetPerGroup(docs, "source", "n_chars",
        Seq(col("doc_id")), Map("a" -> -1L), 10L)
  }

  "sqrtTemperatureWeights" should "boost small groups and damp large ones" in {
    // 100 'big' rows vs 4 'small': proportional shares 0.9615/0.0385,
    // sqrt-temperature shares 10/12 and 2/12.
    val df = (Seq.fill(100)("big") ++ Seq.fill(4)("small")).toDF("g")
    val out = Curation.sqrtTemperatureWeights(df, "g")
      .orderBy("g").collect()
    val big = out(0); val small = out(1)
    big.getAs[Long]("n") shouldBe 100L
    big.getAs[Double]("w") shouldBe 10.0
    small.getAs[Double]("w") shouldBe 2.0
    big.getAs[Double]("rate") shouldBe (10.0 / 12) +- 1e-6
    small.getAs[Double]("rate") shouldBe (2.0 / 12) +- 1e-6
    big.getAs[Double]("boost") should be < 1.0   // downsample the giant
    small.getAs[Double]("boost") should be > 1.0 // upsample the minority
    // rates form a distribution
    out.map(_.getAs[Double]("rate")).sum shouldBe 1.0 +- 1e-5
  }

  "winsorize" should "clip per group to the quantile interval and leave interior values" in {
    // group a: 1..10 (p10=1.9, p90=9.1); group b: constant 5s + one outlier
    val rows = (1 to 10).map(v => ("a", v)) ++ Seq(("b", 5), ("b", 5), ("b", 500))
    val out = Curation.winsorize(rows.toDF("g", "v"), "g", "v", 0.10, 0.90)
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getAs[Double]("v_clipped")))
    val a = out.filter(_._1 == "a").sortBy(_._2)
    a.head._3 shouldBe 1.9 +- 1e-12  // 1 clipped UP to p10
    a.last._3 shouldBe 9.1 +- 1e-12  // 10 clipped DOWN to p90
    a.map(_._3).filter(c => c > 2 && c < 9) shouldBe
      a.map(_._2.toDouble).filter(v => v > 2 && v < 9) // interior untouched
    val b = out.filter(_._1 == "b").map(_._3).sorted
    b.head shouldBe 5.0 // constants stay
    b.last should be < 500.0 // the outlier is tamed
    an[IllegalArgumentException] should be thrownBy
      Curation.winsorize(rows.toDF("g", "v"), "g", "v", 0.9, 0.1)
  }

  it should "keep and clip rows whose group key is null" in {
    // Null forms its own group (null-safe join key): rows must survive
    // and clip within the null group, not vanish via an inner equi-join.
    val rows = Seq((Option("a"), 1), (Option("a"), 2), (Option("a"), 3),
      (Option.empty[String], 5), (Option.empty[String], 5),
      (Option.empty[String], 500))
    val out = Curation.winsorize(rows.toDF("g", "v"), "g", "v", 0.10, 0.90)
      .collect().map(r => (Option(r.getString(0)), r.getInt(1),
        r.getAs[Double]("v_clipped")))
    out.length shouldBe 6 // nothing dropped
    val nulls = out.filter(_._1.isEmpty).map(_._3).sorted
    nulls.head shouldBe 5.0
    nulls.last should be < 500.0 // null-group outlier tamed too
  }
}
