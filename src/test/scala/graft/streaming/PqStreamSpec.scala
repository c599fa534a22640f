package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Pq

/** PQ under Structured Streaming (the MediaStreamSpec "same operator body"
  * posture): encode and LUT are stateless whole-stage-codegen projections,
  * so an arriving vector stream compresses to codes — and scores against a
  * STATIC served code table by ADC — with no state store and no changes to
  * the operator. Locks streaming/batch value equality row for row.
  */
class PqStreamSpec extends SparkSpec {
  import spark.implicits._

  private val cb = Pq.Codebook(8, IndexedSeq(
    IndexedSeq(Array(0.0, 0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0, 1.0)),
    IndexedSeq(Array(0.0, 0.0, 0.0, 0.0), Array(2.0, 2.0, 2.0, 2.0))))

  "encodeExpr" should "compress a live vector stream identically to batch" in {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val rows = (0L until 50L).map(i => i -> Seq.fill(8)(rnd.nextDouble() * 3))
    val input = MemoryStream[(Long, Seq[Double])]
    val query = input.toDF().toDF("id", "vec")
      .select(col("id"), Pq.encodeExpr(col("vec"), cb).as("codes"))
      .writeStream.format("memory").queryName("pq_stream")
      .outputMode("append").start()
    val streaming = try {
      rows.grouped(17).foreach { b =>
        input.addData(b.toSeq: _*); query.processAllAvailable()
      }
      spark.table("pq_stream").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    } finally query.stop()
    val batch = Pq.encode(rows.toDF("id", "vec"), "id", "vec", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    streaming shouldBe batch
  }

  "adcScoreExpr" should "score arriving queries against a static served code table" in {
    implicit val sqlCtx = spark.sqlContext
    // the served index: a STATIC (cand_id, codes) table, broadcast into
    // the stream — the scan-compressed-codes-per-query serving shape
    val served = Pq.encode(
      Seq(10L -> Seq(1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0),
          20L -> Seq(0.0, 0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 2.0))
        .toDF("id", "vec"), "id", "vec", cb)
      .withColumnRenamed("id", "cand_id")
    val input = MemoryStream[(Long, Seq[Double])]
    val query = input.toDF().toDF("qid", "vec")
      .select(col("qid"), Pq.lutExpr(col("vec"), cb).as("lut"))
      .join(broadcast(served))
      .select(col("qid"), col("cand_id"),
        Pq.adcScoreExpr(col("lut"), col("codes"), cb).as("score"))
      .writeStream.format("memory").queryName("pq_serve")
      .outputMode("append").start()
    val out = try {
      input.addData(5L -> Seq(1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0))
      query.processAllAvailable()
      spark.table("pq_serve").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    } finally query.stop()
    // cand 10 codes (1,0): q·(1,1,1,1) + q·0 = 4; cand 20 codes (0,1):
    // q·0 + q·(2,2,2,2) = 16
    out((5L, 10L)) shouldBe 4.0
    out((5L, 20L)) shouldBe 16.0
  }
}
