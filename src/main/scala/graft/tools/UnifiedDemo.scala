package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pipelines.{CorpusPipeline, CorpusStore}
import graft.streaming.LshStream

/** Dev harness for the unified two-tier deployment story (round-8 verdict
  * item 3): ONE parquet corpus store between
  *
  *   tier 1 — `CorpusPipeline.streamIngest`: micro-batch ingest of the real
  *   documents table (decontaminate → incremental minhash → label fold),
  *   persisting the state via [[CorpusStore]] after every batch;
  *
  *   tier 2 — `LshStream.nearDupTagStream` as a LIVE streaming query whose
  *   serving index is built from that store, tagging arriving docs against
  *   everything tier 1 has ingested.
  *
  * Usage: `sbt "runMain graft.tools.UnifiedDemo [sfDir] [storeDir]"`.
  */
object UnifiedDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val storeDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_unified_store").toString)
    val spark = LocalSession(cores = 4, logLevel = "WARN")
    import spark.implicits._

    val docs = graft.io.Sources.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val bench = Seq("benchmark eval sentence never in the corpus").toDF("text")

    // ---- tier 1: streaming ingest, two micro-batches, store per batch ----
    val input = MemoryStream[(Long, String)](spark)
    val h = CorpusPipeline.streamIngest(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", bench, "text",
      onResult = (batchId, r) => {
        // deployment write path: O(batch) append commit, not a corpus rewrite
        CorpusStore.appendBatch(r, storeDir)
        println(s"[unified] tier1 batch $batchId appended " +
          s"${r.report.count()} docs -> $storeDir")
      })
    val (b1, b2) = docs.splitAt(docs.length / 2)
    input.addData(b1.toSeq); h.query.processAllAvailable()

    // ---- tier 2: tagger index built from the store after batch 1, then
    // REFRESHED to the next store generation after batch 2 — the
    // steady-state swap API (release-then-rebuild, see
    // [[CorpusStore.refreshServedIndex]]) ----
    val index1 = CorpusStore.refreshServedIndex(spark, storeDir, "doc_id", None)

    input.addData(b2.toSeq); h.query.processAllAvailable()
    h.query.stop()
    val index = CorpusStore.refreshServedIndex(
      spark, storeDir, "doc_id", Some(index1))

    val probes = MemoryStream[(Long, String)](spark)
    val tagged = LshStream.nearDupTagStream(
      probes.toDF().toDF("doc_id", "text"), index, "doc_id", "text",
      shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
    val q = tagged.writeStream.format("memory").queryName("unified_tagged")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // probe with exact copies of two ingested docs (one per tier-1 batch;
    // the batch-2 copy is only taggable because the index was refreshed)
    probes.addData(Seq((900001L, b1.head._2), (900002L, b2.head._2)))
    q.processAllAvailable(); q.stop()

    val out = spark.table("unified_tagged")
    out.orderBy("stream_id").show(10, truncate = false)
    val hits = out.select("stream_id").distinct().count()
    println(s"[unified] tier2 tagged $hits/2 probes against the store " +
      s"(${if (hits == 2) "PASS" else "FAIL"})")
    index.unpersist()
    spark.stop()
  }
}
