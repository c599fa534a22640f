package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipelines.CorpusPipeline

/** The hot-bucket guard on the INCREMENTAL path ([[TextDedup.minhashIncrement]],
  * round 8): an arriving doc meeting a stored boilerplate pile must produce
  * O(distinct signatures) pairs, not O(pile); a pile arriving AS a batch must
  * cap its within-batch self-join; and the resolved GROUPS through the
  * corpus pipeline must equal the uncapped computation's.
  */
class IncrementGuardSpec extends SparkSpec {
  import spark.implicits._

  private val boiler =
    "terms of service apply to all users of this web site without exception"

  "minhashIncrement" should "meet a stored pile as reps, not members" in {
    val n = 1000
    val corpusDocs = ((0 until n).map(i => (i.toLong, boiler)) :+
      (50000L, "an ordinary document about distributed joins")).toDF("doc_id", "text")
    val corpus = TextDedup.minhashPrepare(corpusDocs, "doc_id", "text").persist()
    try {
      val batch = Seq(
        (90001L, boiler),                                  // joins the pile
        (90002L, "novel content with no stored relatives")).toDF("doc_id", "text")
      val inc = TextDedup.minhashIncrement(batch, corpus, "doc_id", "text",
        threshold = 0.5)
      val pairs = inc.pairs.as[(Long, Long, Double)].collect()
      inc.release()
      // uncapped would report 1000 pile pairs for 90001; the guard reports
      // the pile's one distinct-signature representative
      pairs.length should be < 20
      // ...but connectivity to the pile is preserved
      pairs.exists(p => p._2 == 90001L && p._1 < n) shouldBe true
      pairs.exists(p => p._1 == 90002L || p._2 == 90002L) shouldBe false
    } finally corpus.unpersist()
  }

  it should "cap a pile arriving AS the batch (new-new leg)" in {
    val n = 800
    val corpusDocs = Seq((50000L, "an ordinary document about distributed joins"))
      .toDF("doc_id", "text")
    val corpus = TextDedup.minhashPrepare(corpusDocs, "doc_id", "text").persist()
    try {
      val pileBatch = (0 until n).map(i => (i.toLong, boiler)).toDF("doc_id", "text")
      val inc = TextDedup.minhashIncrement(pileBatch, corpus, "doc_id", "text",
        threshold = 0.5)
      val count = inc.pairs.count()
      inc.release()
      // stars + reps, not n(n-1)/2 = 319,600
      count should be < (n + 50).toLong
      count should be >= (n - 1).toLong
    } finally corpus.unpersist()
  }

  it should "preserve resolved groups through the corpus pipeline vs uncapped" in {
    val n = 300
    val pile = (0 until n).map(i => (i.toLong, boiler))
    val rest = Seq(
      (70000L, "the quick brown fox jumps over the lazy dog"),
      (70001L, "the quick brown fox jumps over the lazy cat"))
    val batch1 = pile.toDF("doc_id", "text")
    val batch2 = (rest :+ (90001L, boiler)).toDF("doc_id", "text")
    val bench = Seq("benchmark sentence matching nothing here").toDF("text")

    // capped (default) incremental ingest, two batches
    val s0 = CorpusPipeline.emptyState(spark, "doc_id")
    val r1 = CorpusPipeline.ingest(s0, batch1, "doc_id", "text", bench, "text")
    val r2 = CorpusPipeline.ingest(r1.state, batch2, "doc_id", "text", bench, "text")
    val capped = r2.state.labels.as[(Long, Long)].collect().toMap

    // uncapped full recompute over the union
    val all = batch1.unionByName(batch2)
    val uncapped = DedupGroups.resolveFromPairs(all, "doc_id",
        TextDedup.minhashNearDups(all, "doc_id", "text", threshold = 0.5,
          maxBucket = 0))
      .select("doc_id", "group_id").as[(Long, Long)].collect().toMap

    capped shouldBe uncapped
    capped(90001L) shouldBe 0L // the late arrival joined the pile's group
    capped(70001L) shouldBe capped(70000L)
  }
}
