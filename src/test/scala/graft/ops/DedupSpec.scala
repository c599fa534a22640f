package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  "keepFirst" should "keep exactly the first row per key under the explicit order" in {
    val df = Seq((1, 2, "second"), (1, 1, "first"), (2, 5, "only")).toDF("k", "ord", "v")
    val out = Dedup.keepFirst(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").select("v").as[String].collect()
    out shouldBe Array("first", "only")
  }

  it should "be stable under input permutation given a total order column" in {
    val rows = Seq((1, 3, "c"), (1, 1, "a"), (1, 2, "b"), (2, 1, "x"))
    val a = Dedup.keepFirst(rows.toDF("k", "ord", "v"), Seq("k"), Seq(col("ord")))
    val b = Dedup.keepFirst(rows.reverse.toDF("k", "ord", "v"), Seq("k"), Seq(col("ord")))
    a.orderBy("k").collect() shouldBe b.orderBy("k").collect()
  }

  it should "emit unique keys that are a subset of the input" in {
    val df = Seq((1, 1), (1, 2), (3, 1)).toDF("k", "ord")
    val out = Dedup.keepFirst(df, Seq("k"), Seq(col("ord")))
    out.select("k").distinct().count() shouldBe out.count()
    out.join(df, Seq("k", "ord"), "left_anti").count() shouldBe 0
  }

  "keepFirstAsc" should "equal the window form under a total ascending order" in {
    val rows = Seq((1, 2, "b", 10), (1, 1, "a", 20), (2, 5, "x", 30),
      (2, 4, "w", 40), (3, 9, "z", 50))
    val df = rows.toDF("k", "ord", "v", "extra")
    val window = Dedup.keepFirst(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").collect()
    val agg = Dedup.keepFirstAsc(df, Seq("k"), Seq("ord"))
      .orderBy("k").collect()
    agg shouldBe window
    agg.map(_.schema.fieldNames.toSeq).head shouldBe Seq("k", "ord", "v", "extra")
  }

  it should "sort null order values first, like the window's default asc" in {
    val df = Seq((1, Some(2), "late"), (1, None, "null-first"), (2, Some(1), "x"))
      .toDF("k", "ord", "v")
    val window = Dedup.keepFirst(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").select("v").as[String].collect()
    val agg = Dedup.keepFirstAsc(df, Seq("k"), Seq("ord"))
      .orderBy("k").select("v").as[String].collect()
    agg shouldBe window
    agg.head shouldBe "null-first"
  }

  it should "plan as a partial-aggregate pair, not a sort-window" in {
    // min(struct) has a struct buffer -> SortAggregate (not hash-able),
    // but the load-bearing property holds: a partial_min runs BEFORE the
    // exchange (shuffle carries one candidate per key per partition) and
    // no Window/rank appears
    val df = Seq((1, 1, "a")).toDF("k", "ord", "v")
    val plan = Dedup.keepFirstAsc(df, Seq("k"), Seq("ord"))
      .queryExecution.executedPlan.toString
    withClue(plan) {
      plan should include("partial_min")
      (plan should not).include("Window")
    }
  }

  "fullRow" should "behave as exact distinct" in {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "v")
    Dedup.fullRow(df).count() shouldBe 2
  }
}
