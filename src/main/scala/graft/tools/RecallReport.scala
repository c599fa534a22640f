package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Ivf, Pq, Similarity}

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
