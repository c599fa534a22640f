package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.AsofJoin

class AsofStreamSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 10L, "a"), (1L, 25L, "b"), (1L, 20L, "tie"), (1L, 5L, "early"),
    (2L, 7L, "c"))
    .toDF("user_id", "ts", "tag")

  private val dim = Seq(
    (1L, 8L, Some(100L), Some("east")),
    (1L, 20L, None: Option[Long], Some("west")))
    .toDF("user_id", "rts", "price", "region")

  "asofEnrich" should "match the batch as-of join exactly (incl. null payload fields)" in {
    val batch = AsofJoin.asofJoin(left, dim, Seq("user_id"), "ts", "rts",
        Seq("price", "region"))
      .orderBy("user_id", "ts").select("user_id", "ts", "tag", "price", "region")
    val enriched = AsofStream.asofEnrich(left, dim, Seq("user_id"), "ts", "rts",
        Seq("price", "region"))
      .orderBy("user_id", "ts").select("user_id", "ts", "tag", "price", "region")
    enriched.collect() shouldBe batch.collect()
  }

  it should "enrich a live stream against the static versioned dim" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val query = AsofStream.asofEnrich(
        input.toDF().toDF("user_id", "ts", "tag"),
        dim, Seq("user_id"), "ts", "rts", Seq("price", "region"))
      .writeStream.format("memory").queryName("asof_enrich")
      .outputMode("append").start()
    try {
      input.addData((1L, 10L, "a"), (1L, 5L, "early"))
      query.processAllAvailable()
      input.addData((1L, 25L, "b"), (2L, 7L, "c"))
      query.processAllAvailable()
      val out = spark.table("asof_enrich")
        .orderBy("user_id", "ts")
        .select("user_id", "ts", "price", "region")
        .as[(Long, Long, Option[Long], Option[String])].collect()
      out shouldBe Array(
        (1L, 5L, None, None),
        (1L, 10L, Some(100L), Some("east")),
        (1L, 25L, None, Some("west")), // right@20: null price stays null
        (2L, 7L, None, None))
    } finally query.stop()
  }

  "asofStream" should "track the latest right per key across micro-batches" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AsofStream.Tick]
    val query = AsofStream.asofStream(input.toDS())
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      // batch 1: right@8 (payload 100), lefts at 5 and 10, equal-ts pair at 20
      input.addData(
        AsofStream.Tick(1L, 8L, 1L, is_right = true, 100L),
        AsofStream.Tick(1L, 5L, 2L, is_right = false, 0L),
        AsofStream.Tick(1L, 10L, 3L, is_right = false, 0L),
        AsofStream.Tick(1L, 20L, 4L, is_right = true, 200L),
        AsofStream.Tick(1L, 20L, 5L, is_right = false, 0L))
      query.processAllAvailable()
      // batch 2: state (right@20) persists; a later left uses it
      input.addData(
        AsofStream.Tick(1L, 25L, 6L, is_right = false, 0L),
        AsofStream.Tick(2L, 7L, 7L, is_right = false, 0L)) // no rights for key 2
      query.processAllAvailable()
      val out = spark.table("asof_stream")
        .orderBy("key", "ts")
        .as[AsofStream.Enriched].collect()
      out shouldBe Array(
        AsofStream.Enriched(1L, 5L, 2L, None, None),
        AsofStream.Enriched(1L, 10L, 3L, Some(100L), Some(8L)),
        AsofStream.Enriched(1L, 20L, 5L, Some(200L), Some(20L)), // <= tie
        AsofStream.Enriched(1L, 25L, 6L, Some(200L), Some(20L)),
        AsofStream.Enriched(2L, 7L, 7L, None, None))
    } finally query.stop()
  }

  it should "agree with the batch as-of join when fed in event-time order" in {
    val rights = Seq((1L, 8L, 100L), (1L, 20L, 200L))
    val lefts = Seq((1L, 5L), (1L, 10L), (1L, 20L), (1L, 25L), (2L, 7L))
    val ticks = (rights.map { case (k, t, p) =>
        AsofStream.Tick(k, t, t * 10, is_right = true, p) } ++
      lefts.zipWithIndex.map { case ((k, t), i) =>
        AsofStream.Tick(k, t, 1000L + i, is_right = false, 0L) }).toDS()
    val streamed = AsofStream.asofStream(ticks)
      .orderBy("key", "ts")
      .select("key", "ts", "payload").as[(Long, Long, Option[Long])].collect()
    val batch = AsofJoin.asofJoin(
        lefts.toDF("key", "ts"),
        rights.toDF("key", "rts", "payload"),
        Seq("key"), "ts", "rts", Seq("payload"))
      .orderBy("key", "ts")
      .select("key", "ts", "payload").as[(Long, Long, Option[Long])].collect()
    streamed shouldBe batch
  }
}
