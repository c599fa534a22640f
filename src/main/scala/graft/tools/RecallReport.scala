package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Ivf, Pq, Similarity, TextDedup}
import graft.streaming.LshStream

/** Round-close recall artifact (round-16 verdict item 5): recall@k vs
  * exact float brute force for every shipped ANN tier — LSH buckets, IVF
  * (trained + portable), IVF-PQ (ADC over probed clusters), PQ
  * shortlist+rerank, and int8-quantized brute force — on the REAL
  * embeddings table at fixed parameters. Everything here is
  * deterministic by construction (deterministic hyperplanes, first-k
  * init, integer-quantized training), so round-over-round drift in this
  * file means the OPERATORS changed, not the fixture: a perf "win" that
  * silently trades recall becomes driver-visible.
  *
  * Usage: `runMain graft.tools.RecallReport [sfDir] [outPath]` — writes
  * one JSON object (also printed to stdout, prefixed `[recall]`).
  */
object RecallReport {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = args.drop(1).headOption.getOrElse("RECALL_LOCAL.json")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")

    val k = 5
    val nQueries = 16
    val e = graft.io.Sources.table(spark, sfDir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = e.filter(col("vec_id") < nQueries)

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val truth = pairs(
      Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = k))

    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Int, Int)]
    def record(name: String, got: Set[(Long, Long)]): Unit = {
      results(name) = (got.intersect(truth).size, truth.size)
      println(f"[recall] $name%-14s recall@$k = " +
        f"${got.intersect(truth).size}/${truth.size}")
    }

    // two bucket widths: the recall-vs-work axis. On the near-random
    // synthetic embeddings exact-signature collision is rare (documented
    // SCALE.md regime) — the value of these rows is round-over-round
    // drift detection at FIXED parameters, not absolute recall.
    record("lsh_nbits8", pairs(Similarity.annTopK(q, e, "vec_id", "embedding",
      k = k, nbits = 8)))
    record("lsh_nbits4", pairs(Similarity.annTopK(q, e, "vec_id", "embedding",
      k = k, nbits = 4)))
    // the VLDB'07 recall-vs-work lever at the SAME 8-bit buckets: each
    // query probes its 4 smallest-|margin| single-bit flips too (5/256
    // of the corpus scanned vs 1/256 single-probe)
    record("lsh_multiprobe8", pairs(Similarity.annTopKMultiProbe(q, e,
      "vec_id", "embedding", k = k, nbits = 8, nprobe = 5)))

    val ivfT = Ivf.train(e, "vec_id", "embedding", k = 16, iters = 2)
    record("ivf_trained", pairs(Ivf.annTopK(q, e, "vec_id", "embedding",
      ivfT, k = k, nprobe = 4)))
    val ivfP = Ivf.trainPortable(e, "vec_id", "embedding", k = 16, iters = 2)
    record("ivf_portable", pairs(Ivf.annTopK(q, e, "vec_id", "embedding",
      ivfP, k = k, nprobe = 4)))

    val cb = Pq.trainPortable(e, "vec_id", "embedding", m = 8, k = 16,
      iters = 2)
    record("ivf_pq", pairs(Pq.ivfAdcTopK(q, e, "vec_id", "embedding",
      "vec_id", ivfT, cb, topK = k, nprobe = 4)))
    record("pq_rerank", pairs(Pq.adcRerankTopK(q, e, "vec_id", "embedding",
      "vec_id", cb, topK = k, shortlist = 32)))

    val qe = e.select(col("vec_id"),
      Similarity.quantizeInt8(col("embedding")).as("q8"))
    record("int8_brute", pairs(Similarity.bruteForceTopK(
      qe.filter(col("vec_id") < nQueries), qe, "vec_id", "q8", k = k)))

    // ---- clustered-fixture tiers (round-16 verdict item 2) ----
    // The random sf embeddings gate near-zero LSH numbers (2/80, 6/80) —
    // too close to the floor to detect a regression. The deterministic
    // clustered fixture (tools/PqClusteredRecall, round 14 — the measured
    // WIN regime) puts every tier where recall is meaningful. Each tier
    // is judged in ITS OWN metric (the round-14 lesson: cosine truth caps
    // measurable ADC recall at the dot-vs-cosine ranking agreement):
    // cosine truth for the LSH/IVF/rerank tiers (their scoring metric),
    // exact inner-product truth for the residual-ADC tier (what ADC
    // approximates).
    val ce = PqClusteredRecall.fixture(spark)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ce.count()
    val cq = ce.filter(col("vec_id") < nQueries)
    val cTruth = pairs(
      Similarity.bruteForceTopK(cq, ce, "vec_id", "embedding", k = k))
    def recordVs(truthSet: Set[(Long, Long)])(name: String,
                 got: Set[(Long, Long)]): Unit = {
      results(name) = (got.intersect(truthSet).size, truthSet.size)
      println(f"[recall] $name%-14s recall@$k = " +
        f"${got.intersect(truthSet).size}/${truthSet.size}")
    }
    val recordC = recordVs(cTruth) _
    recordC("c_lsh_nbits8", pairs(Similarity.annTopK(cq, ce, "vec_id",
      "embedding", k = k, nbits = 8)))
    recordC("c_multiprobe8", pairs(Similarity.annTopKMultiProbe(cq, ce,
      "vec_id", "embedding", k = k, nbits = 8, nprobe = 5)))
    val cIvf = Ivf.train(ce, "vec_id", "embedding", k = 16, iters = 2)
    recordC("c_ivf_trained", pairs(Ivf.annTopK(cq, ce, "vec_id", "embedding",
      cIvf, k = k, nprobe = 4)))
    val cCbRaw = Pq.trainPortable(ce, "vec_id", "embedding", m = 8, k = 64,
      iters = 2)
    recordC("c_pq_rerank", pairs(Pq.adcRerankTopK(cq, ce, "vec_id",
      "embedding", "vec_id", cCbRaw, topK = k, shortlist = 64)))
    // OPQ-style rotation A/B (round-19): identical knobs, the pipeline run
    // in vec_rotate'd space, judged against the SAME original-space cosine
    // truth. The fixture concentrates within-cluster variance in 2 of 64
    // dims (one PQ subspace); the rotation spreads it across all 8, so
    // the delta vs c_pq_rerank is the measured value of the rotation
    // lever (predicted 0.6375 → 0.7250 by the engine-faithful numpy A/B,
    // exact-dot shortlist ceiling 0.7875 — SCALE.md r19).
    val ceRot = ce.select(col("vec_id"),
      graft.functions.VectorExpressions.vec_rotate(col("embedding"))
        .as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ceRot.count()
    val cqRot = ceRot.filter(col("vec_id") < nQueries)
    val cCbRot = Pq.trainPortable(ceRot, "vec_id", "embedding", m = 8,
      k = 64, iters = 2)
    recordC("c_pq_rerank_rot", pairs(Pq.adcRerankTopK(cqRot, ceRot,
      "vec_id", "embedding", "vec_id", cCbRot, topK = k, shortlist = 64)))
    ceRot.unpersist()
    // composed production recipe (round-17 verdict item 1): IVF prune →
    // ADC shortlist → exact cosine rerank (`q_ext_pq_ivf_rerank`'s
    // operator), judged in cosine like c_pq_rerank. The headline row is
    // the matched-shortlist point (nprobe=4, shortlist=64 — comparable to
    // c_pq_rerank directly: the delta IS the IVF-pruning cost); the two
    // sensitivity rows put data on each knob (halved probes, halved
    // shortlist) so a tuning decision never starts blind.
    recordC("c_ivf_rerank", pairs(Pq.ivfAdcRerankTopK(cq, ce, "vec_id",
      "embedding", "vec_id", cIvf, cCbRaw, topK = k, nprobe = 4,
      shortlist = 64)))
    recordC("c_ivf_rerank_np2", pairs(Pq.ivfAdcRerankTopK(cq, ce, "vec_id",
      "embedding", "vec_id", cIvf, cCbRaw, topK = k, nprobe = 2,
      shortlist = 64)))
    recordC("c_ivf_rerank_s32", pairs(Pq.ivfAdcRerankTopK(cq, ce, "vec_id",
      "embedding", "vec_id", cIvf, cCbRaw, topK = k, nprobe = 4,
      shortlist = 32)))
    // residual ADC at m=8 k=256 vs inner-product truth — the round-14
    // ladder's strongest rung (31/40 there at 8 queries)
    val cTruthDot = {
      val exact = cq.select(col("vec_id").as("query_id"),
          col("embedding").as("__q"))
        .crossJoin(ce.select(col("vec_id").as("cand_id"),
          col("embedding").as("__c")))
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          graft.functions.VectorExpressions.vec_dot(
            Similarity.toDouble(col("__q")),
            Similarity.toDouble(col("__c"))).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("score").desc, col("cand_id").asc)
      pairs(exact.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= k).select("query_id", "cand_id"))
    }
    val cCb = Pq.trainPortable(
      ce.select(col("vec_id"), Pq.residualExpr(col("embedding"), cIvf).as("r")),
      "vec_id", "r", m = 8, k = 256, iters = 2)
    recordVs(cTruthDot)("c_ivf_pq_resid", pairs(Pq.ivfAdcResidualTopK(cq, ce,
      "vec_id", "embedding", "vec_id", cIvf, cCb, topK = k, nprobe = 4)))

    // ---- text-LSH served-index tag recall (round-18 continuation: the
    // last similarity surface without a recall row). Deterministic LCG
    // corpus of 256 60-token docs; each "arriving" doc is its base doc
    // with the last k tokens replaced by fresh ones, so the exact
    // 3-shingle Jaccard is pinned per band (≈ (58−(k+2))/(58+(k+2)):
    // 0.76 / 0.66 / 0.57 / 0.49 for k = 6/10/14/18) while the 16×4
    // banding miss probability (1 − J⁴)¹⁶ grows — the recall ladder the
    // LSH geometry predicts (~1.0 / .97 / .83 / .61). The tag VERIFIES
    // with exact Jaccard, so false tags are impossible: every miss here
    // is a banding miss, making the rows a pure round-over-round probe
    // of the minhash/bucket pipeline. Threshold 0.45 keeps all four
    // bands in-truth. Everything is deterministic (fixed LCG, xxhash64
    // signatures) — gateable no-drop like the vector tiers.
    val tagThreshold = 0.45
    var lcg = 0x9E3779B97F4A7C15L
    def lnxt(): Long = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      lcg >>> 11
    }
    val corpusRows = (0 until 256).map { i =>
      (i.toLong, Array.fill(60)("w" + (lnxt() % 10000)).mkString(" "))
    }
    val ks = Seq(6, 10, 14, 18)
    val streamRows = corpusRows.map { case (id, text) =>
      val toks = text.split(" ")
      val kk = ks((id % 4).toInt)
      (id + 10000L,
        (toks.dropRight(kk) ++ Array.fill(kk)("x" + (lnxt() % 10000)))
          .mkString(" "), kk)
    }
    import spark.implicits._
    val corpusDf = corpusRows.toDF("doc_id", "text")
    val streamDf = streamRows.toDF("doc_id", "text", "k")
    val served = LshStream.serve(LshStream.corpusIndex(
      TextDedup.minhashPrepare(corpusDf, "doc_id", "text", shingleN = 3,
        numHashes = 64), "doc_id"), "doc_id").persist()
    val tagged = LshStream.nearDupTagStream(
        streamDf.select("doc_id", "text"), served, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4,
        threshold = tagThreshold)
      .select("stream_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // multi-probe tag (r19): same fixture, same index, query-side probe
    // expansion only — per band the exact bucket + 4 single-slot
    // second-minimum substitutions. Must dominate the plain tiers band
    // for band (close_gate checks mp >= plain in addition to no-drop).
    val taggedMp = LshStream.nearDupTagStreamMultiProbe(
        streamDf.select("doc_id", "text"), served, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4,
        threshold = tagThreshold)
      .select("stream_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truthPairs = streamDf
      .select(col("doc_id").as("stream_id"), col("text").as("__ts"),
        col("k"))
      .withColumn("corpus_id", col("stream_id") - 10000L)
      .join(corpusDf.select(col("doc_id").as("corpus_id"),
        col("text").as("__tc")), Seq("corpus_id"))
      .withColumn("j", TextDedup.jaccard(
        TextDedup.shingles(col("__ts"), 3),
        TextDedup.shingles(col("__tc"), 3)))
      .filter(col("j") >= tagThreshold)
      .select("stream_id", "corpus_id", "k").collect()
    served.unpersist()
    ks.foreach { kk =>
      val tr = truthPairs.filter(_.getInt(2) == kk)
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      results(s"t_lsh_tag_k$kk") = (tr.count(tagged.contains), tr.size)
      println(f"[recall] t_lsh_tag_k$kk%-12s recall = " +
        f"${tr.count(tagged.contains)}/${tr.size}")
      results(s"t_lsh_tag_mp_k$kk") = (tr.count(taggedMp.contains), tr.size)
      println(f"[recall] t_lsh_tag_mp_k$kk%-9s recall = " +
        f"${tr.count(taggedMp.contains)}/${tr.size}")
    }

    val fields = results.map { case (n, (hit, of)) =>
      f""""$n":{"hit":$hit,"of":$of,"recall":${hit.toDouble / of}%.4f}"""
    }.mkString(",")
    val json = s"""{"metric":"ann_recall","k":$k,"n_queries":$nQueries,""" +
      s""""sf":"$sfDir",$fields}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[recall] wrote $outPath")
    spark.stop()
  }
}
