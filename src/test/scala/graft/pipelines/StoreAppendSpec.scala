package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.DedupGroups

/** The durable store's append-only write path and compaction
  * ([[CorpusStore.appendBatch]]/[[CorpusStore.compact]]): per-batch commits
  * are O(batch) write volume, the read-back state equals the in-memory
  * fold, compaction GCs the pair history to the labeling's spanning star
  * forest without changing any rebuild, and ingest continues correctly on
  * top of a compacted store.
  */
class StoreAppendSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq("benchmark sentence matching nothing at all").toDF("text")

  private val batch1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "  THE   quick brown fox jumps over the lazy dog "),
    (3L, "completely different content about spark engines")).toDF("doc_id", "text")
  private val batch2 = Seq(
    (4L, "the quick brown fox jumps over the lazy cat"),
    (5L, "a fresh unrelated document about query planning")).toDF("doc_id", "text")
  private val batch3 = Seq(
    (6L, "completely different content about spark engines")).toDF("doc_id", "text")

  "appendBatch" should "commit per-batch deltas that read back as the full state" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-append-").toString
    val s0 = CorpusPipeline.emptyState(spark, "doc_id")
    val r1 = CorpusPipeline.ingest(s0, batch1, "doc_id", "text", bench, "text")
    CorpusStore.appendBatch(r1, dir)
    val r2 = CorpusPipeline.ingest(r1.state, batch2, "doc_id", "text", bench, "text")
    CorpusStore.appendBatch(r2, dir)

    val stored = CorpusStore.read(spark, dir)
    stored.prepared.select("doc_id").as[Long].collect().sorted shouldBe
      r2.state.prepared.select("doc_id").as[Long].collect().sorted
    stored.pairs.as[(Long, Long)].collect().toSet shouldBe
      r2.state.pairs.as[(Long, Long)].collect().toSet
    stored.labels.as[(Long, Long)].collect().toMap shouldBe
      r2.state.labels.as[(Long, Long)].collect().toMap
    stored.buckets.count() shouldBe r2.state.buckets.count()

    // the latency tier serves straight off the appended store
    val idx = CorpusStore.servedIndex(spark, dir, "doc_id")
    try {
      val tagged = graft.streaming.LshStream.nearDupTagStream(
          Seq((100L, "the quick brown fox jumps over the lazy cat")).toDF("doc_id", "text"),
          idx, "doc_id", "text", shingleN = 3, bands = 16, rowsPerBand = 4,
          threshold = 0.5)
        .select("corpus_id").as[Long].collect().toSet
      tagged should contain (4L) // the batch-2 doc
    } finally idx.unpersist()

    // ---- compaction: GC pairs to the labeling's star forest ----
    // (snapshot the pre-compaction facts first: `stored`'s frames pin the
    // old file listing, which the overwrite invalidates)
    val labelsBefore = stored.labels.as[(Long, Long)].collect().toMap
    val preparedBefore = stored.prepared.count()
    CorpusStore.compact(spark, dir, "doc_id", targetFiles = 1)
    val compacted = CorpusStore.read(spark, dir)
    compacted.prepared.count() shouldBe preparedBefore
    compacted.labels.as[(Long, Long)].collect().toMap shouldBe labelsBefore
    // pairs = one star edge per non-root doc
    val nGroups = labelsBefore.values.toSet.size
    compacted.pairs.count() shouldBe (labelsBefore.size - nGroups).toLong
    // the rebuild any consumer would run is unchanged by the GC
    val allDocs = batch1.unionByName(batch2)
    DedupGroups.resolveFromPairs(allDocs, "doc_id", compacted.pairs)
      .select("doc_id", "group_id").as[(Long, Long)].collect().toMap shouldBe
      labelsBefore

    // ---- ingest continues on top of the compacted store ----
    val r3 = CorpusPipeline.ingest(
      CorpusStore.read(spark, dir), batch3, "doc_id", "text", bench, "text")
    CorpusStore.appendBatch(r3, dir)
    val finalLabels = CorpusStore.read(spark, dir).labels
      .as[(Long, Long)].collect().toMap
    finalLabels(6L) shouldBe 3L // exact dup of doc 3 joins its group
    finalLabels.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L, 6L)
  }
}
