package graft.pipelines

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.{Similarity, TextDedup}
import graft.streaming.{LshStream, VecStream}

/** The deployment story end-to-end: ONE parquet corpus store serving both
  * tiers. Tier 1 ([[CorpusPipeline.streamIngest]]) folds arriving
  * micro-batches into the corpus state and persists it via [[CorpusStore]]
  * after every batch; tier 2 ([[graft.streaming.LshStream.nearDupTagStream]])
  * builds its serving index FROM THAT STORE — so a document ingested by
  * tier 1 is taggable by tier 2 as soon as the index refreshes, with both
  * tiers reading the signatures computed once at ingest.
  */
class UnifiedTiersSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq("benchmark eval sentence never in corpus").toDF("text")

  "one parquet store" should "serve streamIngest (tier 1) and the tagger (tier 2)" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-unified-").toString
    val input = MemoryStream[(Long, String)](spark)

    // tier 1: fold micro-batches, persist the state after each batch
    // (the handle ref is assigned before any batch fires — onBatch only
    // runs inside processAllAvailable below)
    var hRef: CorpusPipeline.StreamingIngest = null
    val h = CorpusPipeline.streamIngest(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      bench, "text",
      onBatch = (_, _) => CorpusStore.write(hRef.state, dir))
    hRef = h

    // batch 1: two unrelated docs enter the corpus
    input.addData((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different content about spark engines"))
    h.query.processAllAvailable()

    // tier 2: index from the STORE (not from tier-1 memory)
    val idx1 = CorpusStore.servedIndex(spark, dir, "doc_id")
    try {
      val tagged1 = LshStream.nearDupTagStream(
          Seq((100L, "the quick brown fox jumps over the lazy cat")).toDF("doc_id", "text"),
          idx1, "doc_id", "text", shingleN = 3, bands = 16, rowsPerBand = 4,
          threshold = 0.5)
        .as[(Long, Long, Double)].collect()
      tagged1.map(t => (t._1, t._2)) shouldBe Array((100L, 1L))
    } finally idx1.unpersist()

    // batch 2: a NEW doc arrives in tier 1...
    input.addData((3L, "a third document about federated query planners"))
    h.query.processAllAvailable()
    h.query.stop()

    // ...and is immediately taggable in tier 2 after an index refresh
    val idx2 = CorpusStore.servedIndex(spark, dir, "doc_id")
    try {
      val tagged2 = LshStream.nearDupTagStream(
          Seq((200L, "a third document about federated query planners")).toDF("doc_id", "text"),
          idx2, "doc_id", "text", shingleN = 3, bands = 16, rowsPerBand = 4,
          threshold = 0.5)
        .as[(Long, Long, Double)].collect()
      tagged2.map(t => (t._1, t._2)) shouldBe Array((200L, 3L))
      tagged2.head._3 shouldBe 1.0 // exact dup: jaccard 1

      // the tagger's verdicts through the store match the batch operator's
      // new-vs-corpus pairs over the SAME stored signatures — one signature
      // family across tiers, no drift
      val stored = CorpusStore.read(spark, dir)
      val probe = Seq(
        (100L, "the quick brown fox jumps over the lazy cat"),
        (200L, "a third document about federated query planners"))
        .toDF("doc_id", "text")
      val inc = TextDedup.minhashIncrement(probe, stored.prepared,
        "doc_id", "text", threshold = 0.5,
        corpusBuckets = Some(stored.buckets), validateBuckets = true)
      val viaBatch = inc.pairs
        .select(greatest(col("id_a"), col("id_b")).as("stream_id"),
          least(col("id_a"), col("id_b")).as("corpus_id"), col("jaccard"))
        .orderBy("stream_id").as[(Long, Long, Double)].collect()
      inc.release()
      val viaTagger = (LshStream.nearDupTagStream(probe, idx2, "doc_id",
          "text", shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
        .orderBy("stream_id").as[(Long, Long, Double)].collect())
      viaTagger shouldBe viaBatch
    } finally idx2.unpersist()

    // the stored labels cover every ingested doc (tier-1 state really is
    // in the store, not just the signatures)
    CorpusStore.read(spark, dir).labels
      .as[(Long, Long)].collect().toMap.keySet shouldBe Set(1L, 2L, 3L)
  }

  "the embedding store" should "serve the VecStream tagger from one signing pass" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-vecstore-").toString
    val planes = Similarity.hyperplanes(4, 4)
    val corpus = Seq(
      (1L, Seq(1.0f, 0.1f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.2f, 0.0f))).toDF("vec_id", "embedding")
    CorpusStore.writeVecIndex(corpus, "vec_id", "embedding", planes, dir)

    val idx = CorpusStore.readVecIndex(spark, dir)
    val tagged = VecStream.nearDupTagStream(
        Seq((100L, Seq(0.99f, 0.12f, 0.01f, 0.0f))).toDF("vec_id", "embedding"),
        idx, "vec_id", "embedding", planes, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    tagged.map(t => (t._1, t._2)) shouldBe Array((100L, 1L))
  }
}
