package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 10L, "a"),   // after right@8  -> 100
    (1L, 25L, "b"),   // after right@20 -> 200
    (1L, 20L, "tie"), // equal ts matches (<= semantics) -> 200
    (1L, 5L, "early"),// before any right -> null
    (2L, 7L, "c"))    // user 2 has no right rows at all -> null
    .toDF("user_id", "ts", "tag")

  private val right = Seq(
    (1L, 8L, 100L),
    (1L, 20L, 200L))
    .toDF("user_id", "rts", "price")

  "asofJoin" should "pick the greatest right time at or before each left row" in {
    val out = AsofJoin.asofJoin(left, right, keys = Seq("user_id"),
        leftTime = "ts", rightTime = "rts", payload = Seq("price"))
      .orderBy("user_id", "ts")
      .select("user_id", "ts", "tag", "price")
      .as[(Long, Long, String, Option[Long])].collect()
    out shouldBe Array(
      (1L, 5L, "early", None),
      (1L, 10L, "a", Some(100L)),
      (1L, 20L, "tie", Some(200L)),
      (1L, 25L, "b", Some(200L)),
      (2L, 7L, "c", None))
  }

  it should "preserve left row count and reject payload collisions" in {
    AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "rts",
      Seq("price")).count() shouldBe left.count()
    an[IllegalArgumentException] should be thrownBy
      AsofJoin.asofJoin(left, right.withColumnRenamed("price", "tag"),
        Seq("user_id"), "ts", "rts", Seq("tag"))
  }

  it should "take the matched right row atomically when payload fields are null" in {
    // right@20 has price=null, region non-null. A per-column ignoreNulls carry
    // would (a) surface the stale price=100 from right@8 for left@25 and
    // (b) mix price from right@8 with region from right@20 — both wrong.
    val r = Seq(
      (1L, 8L, Some(100L), Some("east")),
      (1L, 20L, None: Option[Long], Some("west")))
      .toDF("user_id", "rts", "price", "region")
    val out = AsofJoin.asofJoin(left, r, Seq("user_id"), "ts", "rts",
        Seq("price", "region"))
      .orderBy("user_id", "ts")
      .select("user_id", "ts", "price", "region")
      .as[(Long, Long, Option[Long], Option[String])].collect()
    out shouldBe Array(
      (1L, 5L, None, None),                  // before any right
      (1L, 10L, Some(100L), Some("east")),   // right@8, whole row
      (1L, 20L, None, Some("west")),         // right@20: null price STAYS null
      (1L, 25L, None, Some("west")),         // not the stale 100 from right@8
      (2L, 7L, None, None))
  }

  it should "drop null-time rights and null-match null-time lefts" in {
    val l = Seq((1L, Some(10L)), (1L, None)).toDF("user_id", "ts")
    val r = Seq((1L, Some(4L), 7L), (1L, None, 9L)).toDF("user_id", "rts", "v")
    val out = AsofJoin.asofJoin(l, r, Seq("user_id"), "ts", "rts", Seq("v"))
      .orderBy(asc_nulls_first("ts"))
      .select("ts", "v").as[(Option[Long], Option[Long])].collect()
    out shouldBe Array((None, None), (Some(10L), Some(7L)))
  }
}
