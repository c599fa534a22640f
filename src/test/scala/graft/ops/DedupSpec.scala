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

  "fullRow" should "behave as exact distinct" in {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "v")
    Dedup.fullRow(df).count() shouldBe 2
  }
}
