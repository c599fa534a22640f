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
