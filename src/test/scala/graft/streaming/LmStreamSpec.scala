package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.NgramLm

/** [[LmStream]]: streaming score == batch score on the same model, and
  * the OOV floor for unseen bigrams.
  */
class LmStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // training corpus: "a b a b" + "a c" (the NgramLmSpec fixture)
  private val model = NgramLm.train(
    Seq("a b a b", "a c").toDF("text"), "text")

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  "scoreStream" should "reproduce the batch score once the window closes" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val query = LmStream.scoreStream(input.toDF(), "doc_id", "ts", "text",
        model)
      .writeStream.format("memory").queryName("lm_scores")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(1L, ts("2024-01-01 00:05:00"), "a b a b"),
        Doc(2L, ts("2024-01-01 00:10:00"), "a c"),
        Doc(3L, ts("2024-01-01 00:15:00"), "solo")) // <2 tokens: dropped
      query.processAllAvailable()
      input.addData(Doc(9L, ts("2024-01-01 03:00:00"), "a b"))
      query.processAllAvailable()
      val rows = spark.table("lm_scores")
        .select("doc_id", "n_bigrams", "ll_scaled", "avg_ll")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      // training docs rescore to their batch values (NgramLmSpec numbers)
      def t(x: Double): Long = math.floor(1e9 * x + 0.5).toLong
      rows(1L) shouldBe ((3L, 3 * t(math.log(1.0 / 2)), -0.693147))
      rows(2L) shouldBe ((1L, t(math.log(1.0 / 3)), -1.098612))
      rows.contains(3L) shouldBe false
    } finally query.stop()
  }

  it should "score fully unseen bigrams at the add-one floor ln(1/V)" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val query = LmStream.scoreStream(input.toDF(), "doc_id", "ts", "text",
        model)
      .writeStream.format("memory").queryName("lm_oov")
      .outputMode("append").start()
    try {
      input.addData(Doc(7L, ts("2024-01-01 00:05:00"), "x y"))
      query.processAllAvailable()
      input.addData(Doc(9L, ts("2024-01-01 03:00:00"), "a b"))
      query.processAllAvailable()
      val r = spark.table("lm_oov").filter(col("doc_id") === 7).collect()
      r.length shouldBe 1
      // V = 3 -> ln(1/3), the same value an unseen CONTEXT floor gives
      r.head.getAs[Double]("avg_ll") shouldBe -1.098612
    } finally query.stop()
  }

  "withTermScaled" should "match avgLogProb when self-trained (batch parity)" in {
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("id", "text")
    val viaModel = NgramLm.withTermScaled(
        NgramLm.docBigrams(docs, "id", "text"), NgramLm.train(docs, "text"))
      .groupBy("id").agg(sum("t").as("ll"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = NgramLm.avgLogProb(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    viaModel shouldBe direct
  }
}
