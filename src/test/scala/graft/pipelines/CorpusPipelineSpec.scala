package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.{DedupGroups, TextDedup}

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val allDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "  THE   quick brown fox jumps over the lazy dog "),
    (3L, "the quick brown fox jumps over the lazy cat"),
    (4L, "completely different content about spark engines"),
    (5L, "completely different content about spark engines"))
    .toDF("doc_id", "text")

  // overlaps docs 4/5 only — they must never enter the corpus
  private val bench = Seq("completely different content about spark engines")
    .toDF("text")

  "ingest" should "decontaminate, dedup incrementally, and regroup per batch" in {
    val s0 = CorpusPipeline.emptyState(spark, "doc_id")

    val b1 = CorpusPipeline.ingest(s0,
      allDocs.filter(col("doc_id").isin(1L, 4L)), "doc_id", "text",
      bench, "text")
    val r1 = b1.report.orderBy("doc_id")
      .select("doc_id", "contaminated", "group_id", "keep")
      .as[(Long, Boolean, Option[Long], Option[Boolean])].collect()
    r1 shouldBe Array(
      (1L, false, Some(1L), Some(true)),
      (4L, true, None, None)) // contaminated: no group, not in corpus
    b1.state.prepared.count() shouldBe 1L

    val b2 = CorpusPipeline.ingest(b1.state,
      allDocs.filter(col("doc_id").isin(2L, 3L, 5L)), "doc_id", "text",
      bench, "text")
    val r2 = b2.report.orderBy("doc_id")
      .select("doc_id", "contaminated", "group_id", "keep")
      .as[(Long, Boolean, Option[Long], Option[Boolean])].collect()
    r2 shouldBe Array(
      (2L, false, Some(1L), Some(false)), // near-dup of corpus doc 1
      (3L, false, Some(1L), Some(false)),
      (5L, true, None, None))
    b2.state.prepared.count() shouldBe 3L
    b2.state.pairs.count() shouldBe 3L // (1,2) (1,3) (2,3)
  }

  it should "yield exactly the groups a full recompute produces" in {
    val s0 = CorpusPipeline.emptyState(spark, "doc_id")
    val b1 = CorpusPipeline.ingest(s0,
      allDocs.filter(col("doc_id").isin(1L, 4L)), "doc_id", "text", bench, "text")
    val b2 = CorpusPipeline.ingest(b1.state,
      allDocs.filter(col("doc_id").isin(2L, 3L, 5L)), "doc_id", "text", bench, "text")

    val incremental = DedupGroups.resolveFromPairs(
        b2.state.prepared.select("doc_id"), "doc_id", b2.state.pairs)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect()
    val cleanDocs = allDocs.filter(col("doc_id").isin(1L, 2L, 3L))
    val full = DedupGroups.resolve(cleanDocs, "doc_id",
        d => TextDedup.minhashNearDups(d, "doc_id", "text", threshold = 0.5))
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect()
    incremental shouldBe full
    // the incrementally-maintained labeling equals both
    b2.state.labels.orderBy("doc_id").as[(Long, Long)].collect() shouldBe
      full.map { case (id, g, _) => (id, g) }
  }

  it should "not leak cached frames across ingest calls" in {
    // minhashIncrement persists its delta (registered in the cache manager);
    // ingest must release it or every batch — every micro-batch in
    // streamIngest — leaks one cached DataFrame
    spark.catalog.clearCache()
    val s0 = CorpusPipeline.emptyState(spark, "doc_id")
    val b1 = CorpusPipeline.ingest(s0,
      allDocs.filter(col("doc_id").isin(1L, 4L)), "doc_id", "text", bench, "text")
    b1.report.count()
    val b2 = CorpusPipeline.ingest(b1.state,
      allDocs.filter(col("doc_id").isin(2L, 3L, 5L)), "doc_id", "text", bench, "text")
    b2.report.count()
    b2.state.prepared.count()
    spark.sharedState.cacheManager.isEmpty shouldBe true
  }

  "streamIngest" should "hold live checkpoint blocks bounded across micro-batches" in {
    // round-11 lifecycle: superseded state generations and per-batch
    // frames (report, deltas, pairs, internals) release after the hooks
    // return; after the stream stops only the FINAL state's blocks live
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val h = CorpusPipeline.streamIngest(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", bench, "text")
    try {
      (1 to 4).foreach { k =>
        input.addData((k.toLong,
          s"bounded blocks probe content number $k with words"))
        h.query.processAllAvailable()
      }
    } finally h.query.stop()
    val s = h.state
    val finalIds = Seq(s.prepared, s.pairs, s.labels, s.buckets)
      .flatMap(graft.ops.Managed.checkpointRdds).map(_.id).toSet
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet
      .diff(before).diff(finalIds)
    val detail = spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => leaked(id) }
      .map { case (id, r) => s"$id=${r.toString}" }
    withClue(s"leaked persistent RDDs $detail: ") { leaked shouldBe empty }
  }

  "streamIngest" should "fold micro-batches into the same state as batch ingest" in {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val reports = scala.collection.mutable.Map.empty[Long, Array[(Long, Boolean)]]
    val h = CorpusPipeline.streamIngest(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      bench, "text",
      onBatch = (id, rep) => reports.synchronized {
        reports(id) = rep.select("doc_id", "contaminated")
          .as[(Long, Boolean)].collect()
      })
    try {
      input.addData((1L, "the quick brown fox jumps over the lazy dog"),
        (4L, "completely different content about spark engines"))
      h.query.processAllAvailable()
      input.addData((2L, "  THE   quick brown fox jumps over the lazy dog "),
        (3L, "the quick brown fox jumps over the lazy cat"),
        (5L, "completely different content about spark engines"))
      h.query.processAllAvailable()
    } finally h.query.stop()

    reports(0L).toMap shouldBe Map(1L -> false, 4L -> true)
    reports(1L).toMap shouldBe Map(2L -> false, 3L -> false, 5L -> true)
    // state parity with the two-call batch ingest
    h.state.prepared.count() shouldBe 3L
    h.state.pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet shouldBe
      Set((1L, 2L), (1L, 3L), (2L, 3L))
    val groups = DedupGroups.resolveFromPairs(
        h.state.prepared.select("doc_id"), "doc_id", h.state.pairs)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect()
    groups shouldBe Array((1L, 1L, true), (2L, 1L, false), (3L, 1L, false))
  }

  "streamIngest" should "converge labels incrementally across 3 micro-batches" in {
    // arrival order 3, 2, 1: doc 3 starts its own group; doc 2 merges with
    // it (group min drops to 2); doc 1 merges again (min drops to 1). The
    // maintained labeling must re-point doc 3 across batches it does not
    // appear in — the incremental-merge behavior a per-batch recompute
    // would get for free and mergeLabels must reproduce.
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val noBench = Seq.empty[String].toDF("text")
    val h = CorpusPipeline.streamIngest(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", noBench, "text")
    val byDoc = allDocs.as[(Long, String)].collect().toMap
    try {
      input.addData((3L, byDoc(3L)))
      h.query.processAllAvailable()
      input.addData((2L, byDoc(2L)))
      h.query.processAllAvailable()
      input.addData((1L, byDoc(1L)), (4L, byDoc(4L)))
      h.query.processAllAvailable()
    } finally h.query.stop()

    val streamed = h.state.labels.orderBy("doc_id").as[(Long, Long)].collect()
    streamed shouldBe Array((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
    // parity with a batch recompute over the accumulated durable pairs
    val recomputed = DedupGroups.resolveFromPairs(
        h.state.prepared.select("doc_id"), "doc_id", h.state.pairs)
      .orderBy("doc_id").select("doc_id", "group_id")
      .as[(Long, Long)].collect()
    streamed shouldBe recomputed
  }

  it should "merge previously-separate groups when a bridging doc arrives" in {
    // corpus: two unrelated docs; then a batch doc similar to BOTH cannot
    // exist textually here, so bridge via two near-dups in one batch
    // joining separate corpus singletons into their groups
    val s0 = CorpusPipeline.emptyState(spark, "doc_id")
    val b1 = CorpusPipeline.ingest(s0,
      allDocs.filter(col("doc_id").isin(1L, 4L)), "doc_id", "text",
      benchmark = Seq.empty[String].toDF("text"), benchTextCol = "text")
    // batch brings 2 (dup of 1) and 5 (dup of 4): both corpus singletons
    // become 2-doc groups
    val b2 = CorpusPipeline.ingest(b1.state,
      allDocs.filter(col("doc_id").isin(2L, 5L)), "doc_id", "text",
      benchmark = Seq.empty[String].toDF("text"), benchTextCol = "text")
    val groups = DedupGroups.resolveFromPairs(
        b2.state.prepared.select("doc_id"), "doc_id", b2.state.pairs)
      .as[(Long, Long, Boolean)].collect().toSet
    groups shouldBe Set((1L, 1L, true), (2L, 1L, false),
      (4L, 4L, true), (5L, 4L, false))
  }
}
