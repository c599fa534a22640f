package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.TextDedup
import graft.pipelines.CorpusPrepStream
import graft.streaming.LshStream

/** Measure the streaming corpus-prep tier (SCALE.md evidence): per-batch
  * wall time of [[CorpusPrepStream.streamPrepare]] — the full dedup →
  * quality → decontaminate → LSH-tag → budget → chunk recipe — as the
  * seen-hash state grows batch over batch.
  *
  * Method: documents from the SF dir arrive in `nBatches` micro-batches of
  * `batchN` docs (fresh ids, all distinct), against a persisted served
  * index of `2 × sf` disjoint-token docs and the q_ext_decontaminate-style
  * benchmark slice. The interesting curve is per-batch time vs batch
  * index: the only state that grows is the seen-hash table (batchN rows
  * per batch), and its probe is batch-side-broadcast, so the per-batch
  * cost should stay flat in the corpus scan + index probe and NOT grow
  * with the number of ingested batches beyond the linear hash-table scan.
  *
  * Mode `drift` (4th arg) enables the full three-rule drift gate
  * (profile + quantile + category) against blessed snapshots of the
  * arrival slice itself, with tolerances loose enough that every batch
  * passes — so the plain-vs-drift delta IS the gate's per-batch cost.
  * History: un-fused (three report subtrees + union + count) the gate
  * cost 2.75 s/batch; the r18 healthy-path fuse took it to 2.34 s; the
  * r19 single-pass gate ([[graft.streaming.DriftGate]] — ONE aggregation
  * job, driver-side verdicts) takes it inside measurement noise
  * (~0.1-0.35 s across alternating pairs, SCALE.md r19).
  *
  * Mode `mp` (r19): the plain pipeline with `lshMultiProbe = true` — the
  * plain-vs-mp delta is the multi-probe tag's share of whole-pipeline
  * cost (the tag is one of six stages, so the 1.53× single-event factor
  * measured in PileTagBench dilutes here).
  *
  * Usage: `sbt "runMain graft.tools.PrepStreamBench [sfDir] [batchN] [nBatches] [plain|drift|mp]"`.
  */
object PrepStreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchN = args.drop(1).headOption.map(_.toInt).getOrElse(500)
    val nBatches = args.drop(2).headOption.map(_.toInt).getOrElse(8)
    val modeArg = args.drop(3).headOption.getOrElse("plain")
    val driftMode = modeArg == "drift"
    val mpMode = modeArg == "mp"
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text")
    val corpus = ScaleGen.copies(spark,
      docs.select("doc_id", "text"), 2, Seq("doc_id"), 1000000L, Seq("text"))
    val index = LshStream.serve(LshStream.corpusIndex(
      TextDedup.minhashPrepare(corpus, "doc_id", "text"), "doc_id"),
      "doc_id").persist()
    val nIndex = index.compact.count()
    val bench = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id").as("bench_id"), col("text"))

    // arriving docs: the non-bench slice under fresh ids, all texts distinct
    val arrivals = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .select((col("doc_id") + 50000000L).as("doc_id"), col("source"),
        concat(col("text"), lit(" arrival"), col("doc_id").cast("string")).as("text"))
      .as[(Long, String, String)].collect()
    require(arrivals.length >= batchN * nBatches,
      s"need ${batchN * nBatches} docs, sf dir has ${arrivals.length}")

    // drift mode: bless the whole arrival slice so every batch passes —
    // loose tolerances on purpose (the measurement is the gate's COST per
    // healthy batch, not its sensitivity; DriftStreamSpec owns that)
    val driftCfg =
      if (!driftMode) CorpusPrepStream.Config(shingleN = 5,
        lshMultiProbe = mpMode)
      else {
        val blessed = arrivals.toSeq.toDF("doc_id", "source", "text")
          .withColumn("len", length(col("text")))
        CorpusPrepStream.Config(shingleN = 5,
          driftReference =
            Some(graft.ops.Profiler.profile(blessed.select("source"))),
          driftNullFracTol = 0.1, driftDistinctTol = 2.0,
          driftQuantileReference =
            Some(graft.ops.Profiler.quantiles(blessed, Seq("len"))),
          driftQuantileCols = Seq("len"), driftBandTol = 2.0,
          driftCategoryReference =
            Some(graft.ops.Profiler.categories(blessed, Seq("source"))),
          driftTvTol = 0.5)
      }

    val input = MemoryStream[(Long, String, String)]
    var chunksOut = 0L
    var quarantines = 0L
    val streamBase = input.toDF().toDF("doc_id", "source", "text")
    val handle = CorpusPrepStream.streamPrepare(
      // drift mode monitors `len`, so the stream must carry it; plain mode
      // carries it too for an apples-to-apples pipeline cost
      streamBase.withColumn("len", length(col("text"))),
      "doc_id", "text", "source", bench, "text", Some(index),
      // 5-gram decontamination, like q_ext_corpus_prep: at 3-grams the
      // synthetic corpus is ~97% contaminated against its own slice and
      // the tag/budget/chunk stages would measure empty frames
      driftCfg,
      onBatch = (_, r) => chunksOut += r.chunks.count(),
      onQuarantine = (_, _) => quarantines += 1)

    def feed(rows: Seq[(Long, String, String)]): Double = {
      val t0 = System.nanoTime()
      input.addData(rows)
      handle.query.processAllAvailable()
      (System.nanoTime() - t0) / 1e6
    }

    try {
      // warm-up batch (codegen + first-plan costs), excluded
      feed(arrivals.take(batchN))
      val times = (1 until nBatches).map { i =>
        val ms = feed(arrivals.slice(i * batchN, (i + 1) * batchN))
        println(f"[prepbench] batch $i (seen=${i * batchN}): $ms%.0fms")
        ms
      }
      val seen = handle.state.seenHashes.count()
      val mode = modeArg
      require(quarantines == 0,
        s"drift gate quarantined $quarantines healthy batches — the cost " +
          "comparison is invalid; loosen the blessed tolerances")
      println(f"[prepbench] mode=$mode index=$nIndex seen_hashes=$seen chunks=$chunksOut")
      println(f"[prepbench] mode=$mode per-batch ($batchN docs): first=${times.head}%.0fms " +
        f"last=${times.last}%.0fms mean=${times.sum / times.size}%.0fms = " +
        f"${batchN / (times.sum / times.size / 1000)}%.0f docs/s steady-state")
    } finally {
      handle.close()
      index.unpersist()
      spark.stop()
    }
  }
}
