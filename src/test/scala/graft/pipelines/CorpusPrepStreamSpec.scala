package graft.pipelines

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextDedup
import graft.streaming.{BudgetStream, LshStream}

/** Top-level so MemoryStream's product encoder needs no outer instance. */
case class PrepDoc(doc_id: Long, source: String, text: String)

/** [[CorpusPrepStream]] — cross-batch exact dedup, BudgetStream-parity
  * admission, served-index near-dup drop, and streamed-vs-batch chunk
  * equivalence.
  */
class CorpusPrepStreamSpec extends SparkSpec {
  import spark.implicits._

  // passes every default quality rule (>=5 tokens, stopwords present, low
  // punctuation); vary the tail word for distinct content
  private def goodText(tag: String): String =
    s"the quick brown fox jumps over the lazy dog near the river bank $tag"

  // shares no 3-gram with any goodText
  private lazy val bench = Seq((1L, "zz yy xx ww vv uu tt ss rr qq"))
    .toDF("bench_id", "text")

  /** One batch's result, MATERIALIZED inside the onBatch hook: since
    * round 11 streamPrepare releases the batch's checkpoint blocks after
    * the hook returns (unbounded streams otherwise accumulate one block
    * set per micro-batch), so the frames must be read in-hook — the same
    * contract a production sink follows.
    */
  private case class Mat(admitted: Seq[Long],
                         audit: Map[String, Long],
                         chunks: Seq[org.apache.spark.sql.Row],
                         seenCount: Long,
                         consumed: Map[String, Long])

  private def runBatches(batches: Seq[Seq[PrepDoc]],
                         cfg: CorpusPrepStream.Config,
                         index: Option[LshStream.ServedIndex] = None)
      : Seq[Mat] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PrepDoc]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Mat)]
    val handle = CorpusPrepStream.streamPrepare(
      input.toDF(), "doc_id", "text", "source", bench, "text", index, cfg,
      onBatch = (id, r) => results.synchronized {
        results += ((id, Mat(
          r.admitted.select("doc_id").as[Long].collect().toSeq,
          r.audit.as[(String, Long)].collect().toMap,
          r.chunks.orderBy("doc_id", "chunk_idx").collect().toSeq,
          r.state.seenHashes.count(),
          r.state.consumed)))
      })
    try {
      batches.foreach { b =>
        input.addData(b: _*)
        handle.query.processAllAvailable()
      }
    } finally handle.close()
    results.sortBy(_._1).map(_._2).toSeq
  }

  "streamPrepare" should "drop exact duplicates across micro-batches" in {
    val cfg = CorpusPrepStream.Config()
    val out = runBatches(Seq(
      Seq(PrepDoc(1, "a", goodText("alpha")), PrepDoc(2, "a", goodText("beta"))),
      // 3 duplicates batch-1's doc 1; 4 is novel
      Seq(PrepDoc(3, "a", goodText("alpha")), PrepDoc(4, "a", goodText("gamma"))),
      // 5 duplicates doc 4 (previous batch), 6 duplicates doc 2 (two back)
      Seq(PrepDoc(5, "a", goodText("gamma")), PrepDoc(6, "a", goodText("beta")))),
      cfg)
    out.map(_.admitted.toSet) shouldBe
      Seq(Set(1L, 2L), Set(4L), Set.empty[Long])
    // audit: batch-3 had input 2, novel 0
    val audit3 = out(2).audit
    audit3("input") shouldBe 2L
    audit3("novel") shouldBe 0L
    // state carries every seen hash with its claiming doc
    out(2).seenCount shouldBe 3L
  }

  it should "admit per-source budgets identically to BudgetStream over the same batches" in {
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq(PrepDoc(1, "a", goodText("one")), PrepDoc(2, "big", goodText("two two two"))),
      Seq(PrepDoc(3, "a", goodText("three")), PrepDoc(4, "a", goodText("four")),
        PrepDoc(5, "big", goodText("five"))),
      Seq(PrepDoc(6, "a", goodText("six")), PrepDoc(7, "fresh", goodText("seven"))))
    val nTok = (t: String) => t.trim.split("\\s+").length.toLong
    val budgets = Map("big" -> 60L)
    val default = 30L

    val out = runBatches(batches,
      CorpusPrepStream.Config(budgetByGroup = budgets, defaultBudget = default))
    val prepAdmitted = out.flatMap(_.admitted).sorted

    val input = MemoryStream[BudgetStream.Doc]
    val query = BudgetStream.admitWithinBudget(input.toDS(), budgets, default)
      .writeStream.format("memory").queryName("prep_budget_parity")
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        input.addData(b.map(d => BudgetStream.Doc(d.doc_id, d.source, nTok(d.text))): _*)
        query.processAllAvailable()
      }
      val streamAdmitted = spark.table("prep_budget_parity")
        .as[BudgetStream.Doc].collect().map(_.doc_id).sorted.toSeq
      prepAdmitted shouldBe streamAdmitted
    } finally query.stop()
    // the driver fold tracked exactly what was admitted
    val spentBySource = batches.flatten
      .filter(d => prepAdmitted.contains(d.doc_id))
      .groupBy(_.source).view.mapValues(_.map(d => nTok(d.text)).sum).toMap
    out.last.consumed shouldBe spentBySource
  }

  it should "drop near-duplicates of the served corpus index" in {
    val corpus = Seq(
      (100L, goodText("stored alpha")),
      (101L, goodText("stored beta"))).toDF("doc_id", "text")
    val prepared = TextDedup.minhashPrepare(corpus, "doc_id", "text",
      shingleN = 3, numHashes = 64)
    val index = LshStream.serve(
      LshStream.corpusIndex(prepared, "doc_id", bands = 16, rowsPerBand = 4),
      "doc_id").persist()
    try {
      val out = runBatches(Seq(Seq(
        // verbatim near-dup of corpus doc 100 with one changed word
        PrepDoc(1, "a", goodText("stored alpha") + " extra"),
        PrepDoc(2, "a", "completely different words entirely here but the and of is not misc"))),
        CorpusPrepStream.Config(), Some(index))
      val audit = out.head.audit
      audit("decontaminated") shouldBe 2L
      audit("near_dup_free") shouldBe 1L
      out.head.admitted shouldBe Seq(2L)
    } finally index.unpersist()
  }

  it should "drop the plain tagger's banding misses when lshMultiProbe is on (r19)" in {
    // deterministic LCG corpus whose arriving variants sit at low enough
    // Jaccard that plain 16x4 banding misses some true near-dups; the
    // multi-probe config must drop exactly what ITS tagger catches — a
    // strict superset of the plain drop set on this fixture
    var lcg = 0x9E3779B97F4A7C15L
    def lnxt(): Long = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      lcg >>> 11
    }
    // quality-passing: stopword-rich fixed prefix + 47 unique content words
    val prefix = "the quick brown fox jumps over the lazy dog near the river bank"
    val corpusRows = (0 until 96).map { i =>
      (i.toLong, prefix + " " +
        Array.fill(47)("w" + (lnxt() % 100000)).mkString(" "))
    }
    val arrivals = corpusRows.map { case (id, text) =>
      val toks = text.split(" ")
      PrepDoc(id + 10000L, "a",
        (toks.dropRight(18) ++ Array.fill(18)("x" + (lnxt() % 100000)))
          .mkString(" "))
    }
    val index = LshStream.serve(LshStream.corpusIndex(
      TextDedup.minhashPrepare(corpusRows.toDF("doc_id", "text"),
        "doc_id", "text"), "doc_id"), "doc_id").persist()
    try {
      val arrivalsDf = arrivals.toDF()
      def taggedIds(mp: Boolean): Set[Long] = {
        val f =
          if (mp) LshStream.nearDupTagStreamMultiProbe _
          else (s: org.apache.spark.sql.DataFrame, ix: LshStream.ServedIndex,
                id: String, t: String, n: Int, b: Int, r: Int, th: Double) =>
            LshStream.nearDupTagStream(s, ix, id, t, n, b, r, th)
        f(arrivalsDf.select("doc_id", "text"), index, "doc_id", "text",
          3, 16, 4, 0.45)
          .select("stream_id").as[Long].collect().toSet
      }
      val plainTagged = taggedIds(mp = false)
      val mpTagged = taggedIds(mp = true)
      // fixture sanity: multi-probe recovers real banding misses here
      mpTagged should contain allElementsOf plainTagged
      (mpTagged -- plainTagged) should not be empty
      def admitted(mp: Boolean): Set[Long] = CorpusPrepStream.prepareBatch(
          CorpusPrepStream.emptyState(spark, "doc_id"), arrivalsDf,
          "doc_id", "text", "source", bench, "text", Some(index),
          CorpusPrepStream.Config(nearDupThreshold = 0.45,
            lshMultiProbe = mp))
        .admitted.select("doc_id").as[Long].collect().toSet
      val all = arrivals.map(_.doc_id).toSet
      admitted(mp = false) shouldBe (all -- plainTagged)
      admitted(mp = true) shouldBe (all -- mpTagged)
    } finally index.unpersist()
  }

  it should "feed admitted docs into the corpus ingest tier" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PrepDoc]
    var ingestState = CorpusPipeline.emptyState(spark, "doc_id")
    val handle = CorpusPrepStream.streamPrepare(
      input.toDF(), "doc_id", "text", "source", bench, "text", None,
      CorpusPrepStream.Config(),
      onBatch = (_, r) => {
        // selection tier output -> bookkeeping tier input (foreachBatch is
        // serial, so the single-writer fold holds across both tiers)
        val res = CorpusPipeline.ingest(ingestState,
          r.admitted.select("doc_id", "text"), "doc_id", "text",
          bench, "text", checkpointState = true)
        ingestState = res.state
      })
    try {
      input.addData(
        PrepDoc(1, "a", goodText("ingest alpha")),
        // contaminated: contains a benchmark 3-gram -> must never reach ingest
        PrepDoc(2, "a", goodText("zz yy xx poisoned")))
      handle.query.processAllAvailable()
      // near-dup (not exact-dup) of doc 1 -> survives prep, groups with 1
      input.addData(PrepDoc(10, "a", goodText("ingest alpha") + " tail"))
      handle.query.processAllAvailable()
    } finally handle.close()
    val labels = ingestState.labels
      .as[(Long, Long)].collect().toMap
    labels.keySet shouldBe Set(1L, 10L) // doc 2 never entered the corpus
    labels(1L) shouldBe 1L
    labels(10L) shouldBe 1L // grouped with its stored near-duplicate
  }

  it should "hold live checkpoint blocks bounded across micro-batches" in {
    // round-11 lifecycle: after the stream stops, the only surviving
    // checkpoint blocks from the whole run are the FINAL state
    // generation's — superseded generations and per-batch frames released
    // batch-by-batch (previously: one block set leaked per micro-batch)
    implicit val sqlCtx = spark.sqlContext
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val input = MemoryStream[PrepDoc]
    val handle = CorpusPrepStream.streamPrepare(
      input.toDF(), "doc_id", "text", "source", bench, "text", None,
      CorpusPrepStream.Config())
    try {
      (1 to 4).foreach { k =>
        input.addData(PrepDoc(k.toLong, "a", goodText(s"bounded $k")))
        handle.query.processAllAvailable()
      }
    } finally handle.close()
    val finalIds = graft.ops.Managed
      .checkpointRdds(handle.state.seenHashes).map(_.id).toSet
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet
      .diff(before).diff(finalIds)
    withClue(s"leaked persistent RDDs $leaked: ") { leaked shouldBe empty }
  }

  it should "match batch CorpusPrep chunk-for-chunk when budgets are unbounded" in {
    val docs = (1L to 12L).map(i => PrepDoc(i, if (i % 2 == 0) "even" else "odd",
      goodText(s"doc $i word" * (i % 3 + 1).toInt)))
    val batches = docs.grouped(5).toSeq
    val cfg = CorpusPrepStream.Config(chunkWidth = 8, chunkStride = 6)
    val streamed = runBatches(batches, cfg).flatMap(_.chunks)

    val batch = CorpusPrep.prepare(
      docs.toDF().select(col("doc_id"), col("source"), col("text")), bench,
      CorpusPrep.Config(chunkWidth = 8, chunkStride = 6))
    val batchChunks = batch.chunks.orderBy("doc_id", "chunk_idx").collect()
    streamed.sortBy(r => (r.getLong(0), r.getInt(1))) shouldBe
      batchChunks.toSeq.sortBy(r => (r.getLong(0), r.getInt(1)))
  }

  it should "quarantine a drift-flagged window and admit healthy windows unchanged (r17)" in {
    // the drift→quarantine loop (round-16 verdict item 8): a poisoned
    // micro-batch — here a null source, the classic upstream-schema
    // breakage — is diverted WHOLE to the quarantine store and leaves
    // pipeline state untouched; healthy windows before and after flow
    // through exactly as without the gate.
    implicit val sqlCtx = spark.sqlContext
    // blessed snapshot: sources a/b, no nulls
    val blessed = graft.ops.Profiler.profile(Seq(
      PrepDoc(100, "a", goodText("ref one")),
      PrepDoc(101, "b", goodText("ref two"))).toDF().select("source"))
    val qDir = java.nio.file.Files
      .createTempDirectory("graft_prep_quarantine").toString
    val cfg = CorpusPrepStream.Config(
      driftReference = Some(blessed), driftCols = Seq("source"),
      quarantineDir = Some(qDir))
    val input = MemoryStream[PrepDoc]
    val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val quarantined = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
    val handle = CorpusPrepStream.streamPrepare(
      input.toDF(), "doc_id", "text", "source", bench, "text", None, cfg,
      onBatch = (id, r) => admitted.synchronized {
        admitted += ((id, r.admitted.select("doc_id").as[Long].collect().toSeq))
      },
      onQuarantine = (id, report) => quarantined.synchronized {
        quarantined += ((id, report.filter(col("drift"))
          .select("column").as[String].collect().toSeq))
      })
    try {
      Seq(
        Seq(PrepDoc(1, "a", goodText("alpha")), PrepDoc(2, "b", goodText("beta"))),
        // poisoned: doc 3's source is null -> null_frac 0.5 escapes the band
        Seq(PrepDoc(3, null, goodText("gamma")), PrepDoc(4, "a", goodText("delta"))),
        // healthy again; doc 5 re-delivers the poisoned window's doc-4 text:
        // state was untouched, so it is NOVEL, not a cross-batch duplicate
        Seq(PrepDoc(5, "a", goodText("delta")), PrepDoc(6, "b", goodText("epsilon")))
      ).foreach { b =>
        input.addData(b: _*)
        handle.query.processAllAvailable()
      }
    } finally handle.close()
    // healthy windows admitted unchanged; the poisoned one produced NO batch
    admitted.map(_._2.toSet).toSeq shouldBe Seq(Set(1L, 2L), Set(5L, 6L))
    quarantined.toSeq shouldBe Seq((1L, Seq("source")))
    // the quarantine store holds the poisoned window's rows + flagged report
    val rows = spark.read.parquet(s"$qDir/rows")
    rows.select("doc_id").as[Long].collect().toSet shouldBe Set(3L, 4L)
    rows.select("batch_id").distinct().as[Long].collect().toSeq shouldBe Seq(1L)
    val report = spark.read.parquet(s"$qDir/report_profile").filter(col("drift"))
    report.select("column").as[String].collect().toSeq shouldBe Seq("source")
  }

  it should "quarantine a window whose DISTRIBUTION shifted inside fixed bounds (quantile rule, r17)" in {
    // the profile rules can't see this poisoning: doc lengths stay inside
    // the blessed [min, max] and carry no nulls, but the median collapses
    implicit val sqlCtx = spark.sqlContext
    def doc(id: Long, words: Int) =
      PrepDoc(id, "a", ("the quick brown fox jumps over " * 40)
        .split(" ").take(words).mkString(" "))
    // blessed snapshot: lengths around 180-240 chars
    val blessedDocs = (100L to 130L).map(i => doc(i, 30 + (i % 12).toInt)).toDF()
      .withColumn("len", org.apache.spark.sql.functions.length(col("text")))
    val qRef = graft.ops.Profiler.quantiles(blessedDocs, Seq("len"))
    val cfg = CorpusPrepStream.Config(
      driftQuantileReference = Some(qRef), driftQuantileCols = Seq("len"))
    val input = MemoryStream[PrepDoc]
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val quarantined = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[(String, String)])]
    val handle = CorpusPrepStream.streamPrepare(
      input.toDF().withColumn("len", org.apache.spark.sql.functions.length(col("text"))),
      "doc_id", "text", "source", bench, "text", None, cfg,
      onBatch = (_, r) => admitted.synchronized {
        admitted += r.admitted.select("doc_id").as[Long].collect().toSeq
      },
      onQuarantine = (id, report) => quarantined.synchronized {
        quarantined += ((id, report.select("column", "rule")
          .as[(String, String)].collect().toSeq))
      })
    try {
      Seq(
        (1L to 2L).map(i => doc(i, 31 + i.toInt)), // healthy: in-band medians
        (3L to 4L).map(i => doc(i, 8)), // poisoned: median collapses, still > min? (8 words ~ 40 chars)
        (5L to 6L).map(i => doc(i, 33 + i.toInt)) // healthy again
      ).foreach { b =>
        input.addData(b: _*)
        handle.query.processAllAvailable()
      }
    } finally handle.close()
    admitted.map(_.toSet).toSeq shouldBe Seq(Set(1L, 2L), Set(5L, 6L))
    quarantined.map(_._1).toSeq shouldBe Seq(1L)
    quarantined.head._2 shouldBe Seq(("len", "quantile"))
  }

  it should "quarantine a window whose VALUE MIX flipped inside fixed bounds (category rule, r18)" in {
    // neither the profile rules nor the quantile band can see this
    // poisoning: sources stay inside the blessed {a, b}, no nulls, same
    // cardinality — only the per-value frequency mix moves
    implicit val sqlCtx = spark.sqlContext
    // blessed mix: a 2/3, b 1/3
    val catRef = graft.ops.Profiler.categories(
      Seq(PrepDoc(100, "a", goodText("r one")),
        PrepDoc(101, "a", goodText("r two")),
        PrepDoc(102, "b", goodText("r three"))).toDF(), Seq("source"))
    val cfg = CorpusPrepStream.Config(
      driftCategoryReference = Some(catRef), driftTvTol = 0.2)
    val input = MemoryStream[PrepDoc]
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val quarantined = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[(String, String)])]
    val handle = CorpusPrepStream.streamPrepare(
      input.toDF(), "doc_id", "text", "source", bench, "text", None, cfg,
      onBatch = (_, r) => admitted.synchronized {
        admitted += r.admitted.select("doc_id").as[Long].collect().toSeq
      },
      onQuarantine = (id, report) => quarantined.synchronized {
        quarantined += ((id, report.select("column", "rule")
          .as[(String, String)].collect().toSeq))
      })
    try {
      Seq(
        // healthy: the blessed mix exactly (TV 0)
        Seq(PrepDoc(1, "a", goodText("alpha")),
          PrepDoc(2, "a", goodText("beta")),
          PrepDoc(3, "b", goodText("gamma"))),
        // poisoned: flipped to a 1/3, b 2/3 — TV = 1/3 > 0.2
        Seq(PrepDoc(4, "a", goodText("delta")),
          PrepDoc(5, "b", goodText("epsilon")),
          PrepDoc(6, "b", goodText("zeta"))),
        // healthy again
        Seq(PrepDoc(7, "a", goodText("eta")),
          PrepDoc(8, "a", goodText("theta")),
          PrepDoc(9, "b", goodText("iota")))
      ).foreach { b =>
        input.addData(b: _*)
        handle.query.processAllAvailable()
      }
    } finally handle.close()
    admitted.map(_.toSet).toSeq shouldBe Seq(Set(1L, 2L, 3L), Set(7L, 8L, 9L))
    quarantined.map(_._1).toSeq shouldBe Seq(1L)
    quarantined.head._2 shouldBe Seq(("source", "category"))
  }

  it should "flag category columns the batch lacks or carries all-null (r18)" in {
    val catRef = graft.ops.Profiler.categories(
      Seq(PrepDoc(100, "a", goodText("ref"))).toDF(), Seq("source"))
    // column absent from the batch entirely
    val missing = Seq((1L, goodText("x"))).toDF("doc_id", "text")
    CorpusPrepStream.batchCategoryDrift(missing, catRef)
      .filter(col("drift")).select("column")
      .as[String].collect().toSeq shouldBe Seq("source")
    // column present but ALL null: zero category rows must still flag
    val allNull = Seq(PrepDoc(1, null, goodText("x"))).toDF()
    CorpusPrepStream.batchCategoryDrift(allNull, catRef)
      .filter(col("drift")).select("column")
      .as[String].collect().toSeq shouldBe Seq("source")
  }

  it should "flag a monitored column missing from the batch entirely (r17)" in {
    val blessed = graft.ops.Profiler.profile(
      Seq(PrepDoc(100, "a", goodText("ref"))).toDF().select("source"))
    val batchMissing = Seq((1L, goodText("x"))).toDF("doc_id", "text")
    val report = CorpusPrepStream.batchDrift(batchMissing, blessed)
    report.filter(col("drift")).select("column")
      .as[String].collect().toSeq shouldBe Seq("source")
  }
}
