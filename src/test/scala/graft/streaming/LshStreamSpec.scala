package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TextDedup

class LshStreamSpec extends SparkSpec {
  import spark.implicits._

  private val corpusDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely different content about spark engines"),
    (3L, "a third unrelated document on query optimizers"))
    .toDF("doc_id", "text")

  private val arriving = Seq(
    (10L, "  THE   quick brown fox jumps over the lazy dog "), // dup of 1
    (11L, "the quick brown fox jumps over the lazy cat"),      // near-dup of 1
    (12L, "entirely novel text with no corpus relatives"))
    .toDF("doc_id", "text")

  private def index = LshStream.corpusIndex(
    TextDedup.minhashPrepare(corpusDocs, "doc_id", "text"), "doc_id")

  "nearDupTagStream" should "match minhashIncrement's new-vs-corpus pairs on a batch frame" in {
    val tagged = LshStream.nearDupTagStream(arriving, index, "doc_id", "text",
        threshold = 0.5)
      .orderBy("stream_id", "corpus_id")
      .as[(Long, Long, Double)].collect()

    val inc = TextDedup.minhashIncrement(arriving,
      TextDedup.minhashPrepare(corpusDocs, "doc_id", "text"),
      "doc_id", "text", threshold = 0.5)
    // minhashIncrement reports new-new pairs too; the tagger's contract is
    // stream-vs-corpus only — compare against that subset (orientation
    // differs: increment sorts ids, the tagger keeps stream first)
    val corpusIds = Set(1L, 2L, 3L)
    val expected = inc.pairs.as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => corpusIds.contains(a) ^ corpusIds.contains(b) }
      .map { case (a, b, j) =>
        if (corpusIds.contains(a)) (b, a, j) else (a, b, j) }
      .sorted
    inc.release()

    tagged shouldBe expected
    tagged.map(_._1).toSet shouldBe Set(10L, 11L) // 12 has no relatives
  }

  it should "emit exactly one row per pair (first-colliding-band dedup)" in {
    // doc 10 is a whitespace/case variant of corpus doc 1: identical
    // shingle set, identical signature, so ALL 16 bands collide — the
    // stateless dedup must still emit the pair once
    val out = LshStream.nearDupTagStream(arriving, index, "doc_id", "text",
        threshold = 0.5)
      .groupBy("stream_id", "corpus_id").count()
      .filter(col("count") > 1)
    out.count() shouldBe 0L
  }

  it should "not report a re-tagged document as its own duplicate" in {
    val again = corpusDocs.filter(col("doc_id") === 1L)
    val out = LshStream.nearDupTagStream(again, index, "doc_id", "text",
        threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    out.exists(r => r._1 == r._2) shouldBe false
  }

  it should "produce identical pairs through a persisted ServedIndex" in {
    val served = LshStream.serve(index, "doc_id").persist()
    try {
      val viaServed = LshStream.nearDupTagStream(arriving, served, "doc_id",
          "text", shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
        .orderBy("stream_id", "corpus_id").as[(Long, Long, Double)].collect()
      val viaFrame = LshStream.nearDupTagStream(arriving, index, "doc_id",
          "text", threshold = 0.5)
        .orderBy("stream_id", "corpus_id").as[(Long, Long, Double)].collect()
      viaServed shouldBe viaFrame
      viaServed.nonEmpty shouldBe true
    } finally served.unpersist()
  }

  "nearDupTagStreamMultiProbe" should "emit a verified superset of the plain tagger, one row per pair" in {
    val served = LshStream.serve(index, "doc_id").persist()
    try {
      val mp = LshStream.nearDupTagStreamMultiProbe(arriving, served,
          "doc_id", "text", shingleN = 3, bands = 16, rowsPerBand = 4,
          threshold = 0.5)
        .as[(Long, Long, Double)].collect()
      val plain = LshStream.nearDupTagStream(arriving, served, "doc_id",
          "text", shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
        .as[(Long, Long, Double)].collect()
      // superset, with identical verified scores on the shared pairs
      mp.toSet should contain allElementsOf plain.toSet
      // exactly one row per pair even when every band AND probe collides
      // (doc 10 is a normalization variant of corpus doc 1)
      mp.groupBy(t => (t._1, t._2)).values.foreach(_.length shouldBe 1)
      // every emitted pair is exact-verified: recompute Jaccard
      val texts = (corpusDocs.as[(Long, String)].collect()
        ++ arriving.as[(Long, String)].collect()).toMap
      mp.foreach { case (s, c, j) =>
        val jj = Seq((texts(s), texts(c))).toDF("a", "b")
          .select(TextDedup.jaccard(TextDedup.shingles(col("a"), 3),
            TextDedup.shingles(col("b"), 3)))
          .as[Double].head()
        j shouldBe jj
        j should be >= 0.5
      }
    } finally served.unpersist()
  }

  it should "recover banding misses the plain tagger drops (planted low-J pairs)" in {
    // the RecallReport fixture's k18 band: J ~ 0.49, where plain 16x4
    // banding misses ~39% of true pairs — deterministic LCG corpus, so
    // the specific misses are fixed and multi-probe must strictly win
    var lcg = 0x9E3779B97F4A7C15L
    def lnxt(): Long = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      lcg >>> 11
    }
    val corpusRows = (0 until 128).map { i =>
      (i.toLong, Array.fill(60)("w" + (lnxt() % 10000)).mkString(" "))
    }
    val streamRows = corpusRows.map { case (id, text) =>
      val toks = text.split(" ")
      (id + 10000L,
        (toks.dropRight(18) ++ Array.fill(18)("x" + (lnxt() % 10000)))
          .mkString(" "))
    }
    val served = LshStream.serve(LshStream.corpusIndex(
      TextDedup.minhashPrepare(corpusRows.toDF("doc_id", "text"),
        "doc_id", "text"), "doc_id"), "doc_id").persist()
    try {
      def truePairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.as[(Long, Long, Double)].collect()
          .map(t => (t._1, t._2)).filter { case (s, c) => s - 10000L == c }
          .toSet
      val plain = truePairs(LshStream.nearDupTagStream(
        streamRows.toDF("doc_id", "text"), served, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.45))
      val mp = truePairs(LshStream.nearDupTagStreamMultiProbe(
        streamRows.toDF("doc_id", "text"), served, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.45))
      mp should contain allElementsOf plain
      // strict domination: the probes recover pairs plain banding missed
      (mp -- plain) should not be empty
    } finally served.unpersist()
  }

  it should "tag a live stream statelessly (append mode, no state store)" in {
    implicit val sqlCtx = spark.sqlContext
    val served = LshStream.serve(index, "doc_id").persist()
    val input = MemoryStream[(Long, String)]
    val query = LshStream.nearDupTagStreamMultiProbe(
        input.toDF().toDF("doc_id", "text"), served, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .writeStream.format("memory").queryName("lsh_tags_mp")
      .outputMode("append").start()
    try {
      input.addData((10L, "  THE   quick brown fox jumps over the lazy dog "),
        (11L, "the quick brown fox jumps over the lazy cat"))
      query.processAllAvailable()
      query.lastProgress.stateOperators.length shouldBe 0
      val out = spark.table("lsh_tags_mp").orderBy("stream_id", "corpus_id")
        .as[(Long, Long, Double)].collect()
      val batch = LshStream.nearDupTagStreamMultiProbe(
          arriving.filter(col("doc_id") < 12), served, "doc_id", "text",
          shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
        .orderBy("stream_id", "corpus_id").as[(Long, Long, Double)].collect()
      out shouldBe batch
    } finally { query.stop(); served.unpersist() }
  }

  "serveCollapsed" should "tag a pile as one rep row with multiplicity" in {
    val n = 400
    val pile = (0 until n).map(i =>
      (1000L + i, "shared boilerplate terms of service text for every user"))
    val pileIndex = LshStream.corpusIndex(
      TextDedup.minhashPrepare(
        (corpusDocs.as[(Long, String)].collect().toSeq ++ pile).toDF("doc_id", "text"),
        "doc_id", "text"), "doc_id")

    val collapsed = LshStream.serveCollapsed(pileIndex, "doc_id").persist()
    try {
      val probe = Seq((90000L, "  SHARED boilerplate terms of service text for every user "))
        .toDF("doc_id", "text") // normalization variant of the pile text: J = 1
      val viaCollapsed = LshStream.nearDupTagStream(probe, collapsed, "doc_id",
          "text", shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
        .as[(Long, Long, Double)].collect()
      // ONE row: the pile's min-id representative — not 400 rows
      viaCollapsed.map(t => (t._1, t._2)) shouldBe Array((90000L, 1000L))
      // the plain index reports every member, at the same score
      val viaPlain = LshStream.nearDupTagStream(probe,
          LshStream.serve(pileIndex, "doc_id"), "doc_id", "text",
          shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
        .as[(Long, Long, Double)].collect()
      viaPlain.length shouldBe n
      viaPlain.map(_._3).toSet shouldBe Set(viaCollapsed.head._3)
      // multiplicity rides the compact table
      collapsed.compact.filter(col("doc_id") === 1000L)
        .select("__members").as[Long].head() shouldBe n.toLong
      // non-pile corpus docs are served unchanged (singleton groups)
      collapsed.compact.count() shouldBe (corpusDocs.count() + 1)
    } finally collapsed.unpersist()
  }

  it should "tag a live stream statelessly at append mode without watermark" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val query = LshStream.nearDupTagStream(
        input.toDF().toDF("doc_id", "text"), index, "doc_id", "text",
        threshold = 0.5)
      .writeStream.format("memory").queryName("lsh_tags")
      .outputMode("append").start()
    try {
      input.addData((10L, "  THE   quick brown fox jumps over the lazy dog "))
      query.processAllAvailable()
      input.addData((11L, "the quick brown fox jumps over the lazy cat"),
        (12L, "entirely novel text with no corpus relatives"))
      query.processAllAvailable()

      // stateless contract: no state store operators in the executed plan
      val progress = query.lastProgress
      progress.stateOperators.length shouldBe 0

      val out = spark.table("lsh_tags").orderBy("stream_id", "corpus_id")
        .as[(Long, Long, Double)].collect()
      val batch = LshStream.nearDupTagStream(arriving, index, "doc_id", "text",
          threshold = 0.5)
        .orderBy("stream_id", "corpus_id").as[(Long, Long, Double)].collect()
      out shouldBe batch
    } finally query.stop()
  }
}
