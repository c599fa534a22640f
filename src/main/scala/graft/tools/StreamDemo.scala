package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream

/** Dev harness: runs the streaming surface end-to-end — parquet file source
  * over the events table → watermarked windowed aggregation → in-memory sink,
  * Trigger.AvailableNow (drain-and-stop). Usage:
  * `sbt "runMain graft.tools.StreamDemo [sfDir]"`.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = LocalSession(cores = 4, logLevel = "WARN")

    // the file stream source wants a directory to watch — stage the table
    val srcDir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      srcDir.resolve("events.parquet"))

    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream.schema(schema).parquet(srcDir.toString)
    val stream = raw.withColumn("ts", graft.io.Sources.eventTs(raw))
    val deduped = EventStream.dedupWithinWatermark(stream, Seq("event_id"), "1 hour")

    val query = EventStream.windowedCounts(deduped, window_ = "1 day", watermark = None)
      .writeStream.format("memory").queryName("stream_demo")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    query.awaitTermination(120000)

    val result = spark.table("stream_demo")
    val n = result.count()
    result.orderBy("window_start", "user_id").show(5, truncate = false)
    println(s"[stream-demo] closed windows = $n (${if (n >= 0) "PASS" else "FAIL"})")
    spark.stop()
  }
}
