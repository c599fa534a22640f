package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** [[SketchStream.runningTokenHeavyHitters]] — the streaming-state form of
  * the Misra-Gries summary: cross-batch merge through the state store
  * equals the batch aggregate over the union of all batches (exact
  * regime), and state stays bounded by capacity.
  */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private def summary(rows: Array[Row]): Seq[(String, Long)] = {
    rows.length shouldBe 1
    rows.head.getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
  }

  "runningTokenHeavyHitters" should "merge across micro-batches to the batch answer" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val query = SketchStream.runningTokenHeavyHitters(
        input.toDS().toDF("doc_id", "text"), "text", capacity = 32)
      .writeStream.format("memory").queryName("sketch_stream")
      .outputMode("complete").start()
    try {
      input.addData((1L, "alpha beta alpha"), (2L, "beta gamma"))
      query.processAllAvailable()
      summary(spark.table("sketch_stream").collect()) shouldBe
        Seq("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L)

      input.addData((3L, "gamma gamma delta"), (4L, "alpha"))
      query.processAllAvailable()
      // running summary == batch aggregate over all four docs
      summary(spark.table("sketch_stream").collect()) shouldBe
        Seq("alpha" -> 3L, "gamma" -> 3L, "beta" -> 2L, "delta" -> 1L)
    } finally query.stop()
  }

  it should "keep state bounded by capacity under pressure" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val query = SketchStream.runningTokenHeavyHitters(
        input.toDS().toDF("doc_id", "text"), "text", capacity = 2)
      .writeStream.format("memory").queryName("sketch_stream_cap")
      .outputMode("complete").start()
    try {
      input.addData((1L, Seq.fill(50)("hot").mkString(" ")))
      query.processAllAvailable()
      input.addData((2L, (1 to 30).map(i => s"rare$i").mkString(" ")))
      query.processAllAvailable()
      val s = summary(spark.table("sketch_stream_cap").collect())
      s.length should be <= 2 // summary never exceeds capacity
      // 80 tokens total, capacity 2 → anything over 80/3 = 26.7 survives
      s.map(_._1) should contain("hot")
      val hot = s.toMap.apply("hot")
      hot should be <= 50L
      hot should be >= (50L - 80L / 3)
    } finally query.stop()
  }

  "runningQuantiles" should "merge across micro-batches to the exact batch answer" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val query = SketchStream.runningQuantiles(
        input.toDS().toDF("src", "v"), "src", "v",
        capacity = 64, probs = Seq(0.5, 0.9))
      .writeStream.format("memory").queryName("quantile_stream")
      .outputMode("complete").start()
    try {
      input.addData(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0))
      query.processAllAvailable()
      val r1 = spark.table("quantile_stream").collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      r1("a") shouldBe Seq(2.0, 3.0) // ceil(.5*3)=2nd, ceil(.9*3)=3rd
      r1("b") shouldBe Seq(10.0, 10.0)

      input.addData(("a", 4.0), ("a", 5.0), ("b", 20.0))
      query.processAllAvailable()
      // exact regime: state-store merge == batch aggregate over all rows
      val r2 = spark.table("quantile_stream").collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      r2("a") shouldBe Seq(3.0, 5.0) // n=5: ceil(.5*5)=3rd, ceil(.9*5)=5th
      r2("b") shouldBe Seq(10.0, 20.0)
    } finally query.stop()
  }

  "runningTopK" should "keep the k best per group across batches" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val query = SketchStream.runningTopK(
        input.toDS().toDF("g", "v", "id"), "g", "v", "id", k = 2)
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("complete").start()
    try {
      input.addData(("a", 5L, 1L), ("a", 3L, 2L), ("a", 9L, 3L))
      query.processAllAvailable()
      def tops(): Map[String, Seq[(Long, Long)]] =
        spark.table("topk_stream").collect().map(r =>
          r.getString(0) -> r.getSeq[Row](1)
            .map(e => (e.getLong(0), e.getLong(1))).toSeq).toMap
      tops()("a") shouldBe Seq((9L, 3L), (5L, 1L))

      input.addData(("a", 7L, 4L), ("a", 2L, 5L)) // 7 displaces 5
      query.processAllAvailable()
      tops()("a") shouldBe Seq((9L, 3L), (7L, 4L))
    } finally query.stop()
  }
}
