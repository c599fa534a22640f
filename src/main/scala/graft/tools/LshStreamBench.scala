package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.TextDedup
import graft.streaming.LshStream

/** Measure the stateless streaming LSH tagger (SCALE.md evidence): per-event
  * latency and per-batch throughput of [[LshStream.nearDupTagStream]] against
  * a ~10^4-document corpus index, driven by a MemoryStream exactly like the
  * spec but timed.
  *
  * Method: corpus = sf0.1 documents x2 copies with disjoint tokens
  * ([[ScaleGen.copies]]) = 10k docs; index built once and persisted (the
  * deployment shape: sign at ingest, serve from the store). Arriving events
  * are corpus texts under fresh ids, so every event exercises the full match
  * path (shingle -> signature -> bucket join -> first-band dedup -> exact
  * Jaccard verify). Warm-up batches are excluded; single-event latency is
  * addData(1) + processAllAvailable() wall time over `singles` events
  * (p50/p95/mean); throughput is one `batch`-event micro-batch.
  *
  * Usage: `sbt "runMain graft.tools.LshStreamBench [sfDir] [singles] [batch]"`.
  */
object LshStreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val singles = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val batchN = args.drop(2).headOption.map(_.toInt).getOrElse(1000)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val corpus = ScaleGen.copies(spark, docs, 2, Seq("doc_id"), 1000000L, Seq("text"))
    val index = LshStream.serve(LshStream.corpusIndex(
      TextDedup.minhashPrepare(corpus, "doc_id", "text"), "doc_id"), "doc_id",
      ).persist()
    val nIndex = index.compact.count()

    // events: corpus rows under fresh ids -> every event has >=1 true match
    val events = corpus.select((col("doc_id") + 50000000L).as("doc_id"), col("text"))
      .as[(Long, String)].collect()

    val input = MemoryStream[(Long, String)]
    val query = LshStream.nearDupTagStream(
        input.toDF().toDF("doc_id", "text"), index, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .writeStream.format("memory").queryName("lsh_bench")
      .outputMode("append").start()

    def feed(rows: Seq[(Long, String)]): Double = {
      val t0 = System.nanoTime()
      input.addData(rows)
      query.processAllAvailable()
      (System.nanoTime() - t0) / 1e6
    }

    try {
      // warm-up: codegen + first-batch plan costs, excluded from the numbers
      (0 until 5).foreach(i => feed(Seq(events(i))))

      val lat = (5 until 5 + singles).map(i => feed(Seq(events(i)))).sorted
      val batchRows = events.slice(5 + singles, 5 + singles + batchN)
      val batchMs = feed(batchRows)

      require(query.lastProgress.stateOperators.isEmpty,
        "tagger plan grew a state store operator")
      val tagged = spark.table("lsh_bench").count()
      println(f"[lshbench] index=$nIndex docs, tagged=$tagged pair rows")
      println(f"[lshbench] single-event latency over $singles events: " +
        f"p50=${lat(singles / 2)}%.0fms p95=${lat((singles * 95) / 100)}%.0fms " +
        f"mean=${lat.sum / singles}%.0fms")
      println(f"[lshbench] batch of ${batchRows.length}: ${batchMs}%.0fms = " +
        f"${batchRows.length / (batchMs / 1000)}%.0f events/s")
    } finally {
      query.stop()
      spark.stop()
    }
  }
}
