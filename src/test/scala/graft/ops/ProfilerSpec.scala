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

  it should "stay one aggregation regardless of column count" in {
    // the profile of a 3-column frame runs 1 job over the data: assert by
    // checking the collect is a single-row aggregate (shape contract),
    // approx mode included
    Profiler.profile(df).count() shouldBe 3L
  }
}
