package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ops.Multimodal
import graft.ops.Multimodal.{DecodedMedia, MediaRow}

/** The multimodal decode tier on a live stream: [[Multimodal.decodeMeta]]
  * is a stateless partition-wise map, so the SAME operator body runs
  * unchanged under Structured Streaming — media blobs arriving on a stream
  * decode at per-batch latency with no state store at all. Locks the
  * contract that the batch and streaming paths share one decode
  * implementation (plan shape, not a parallel code path).
  */
class MediaStreamSpec extends SparkSpec {
  import spark.implicits._

  "decodeMeta" should "decode containers arriving on a stream, batch by batch" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MediaRow]
    val query = Multimodal.decodeMeta(input.toDS())
      .writeStream.format("memory").queryName("media_stream")
      .outputMode("append").start()
    try {
      input.addData(
        MediaRow(1L, null, Multimodal.encodePng(12, 7, gray = true, seed = 1)),
        MediaRow(2L, null, Multimodal.encodeWav(16000, 2, 50, seed = 2)))
      query.processAllAvailable()
      input.addData(
        MediaRow(3L, null, Multimodal.encodeJpeg(20, 10, gray = false, seed = 3)),
        MediaRow(4L, null, Array[Byte](1, 2, 3))) // garbage blob
      query.processAllAvailable()
      val out = spark.table("media_stream").as[DecodedMedia]
        .collect().map(d => d.media_id -> d).toMap
      out(1L).kind shouldBe "image/png"
      out(1L).width shouldBe Some(12L)
      out(1L).channels shouldBe Some(1L)
      out(2L).kind shouldBe "audio/wav"
      out(2L).sample_rate_hz shouldBe Some(16000L)
      out(2L).duration_micros shouldBe Some(50L * 1000000L / 16000L)
      out(3L).kind shouldBe "image/jpeg"
      out(3L).height shouldBe Some(10L)
      out(3L).channels shouldBe Some(3L)
      out(4L).kind shouldBe "unknown"
      out(4L).width shouldBe None
    } finally query.stop()
  }
}
