package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Ivf, Pq}

/** Cold-vs-warm A/B for the PQ/IVF tier (round-16 verdict item 4): the
  * registry's three slowest queries pay in-query codebook derivation plus
  * a full corpus encode on EVERY execution (kept that way for oracle
  * portability — the DuckDB SQL must replay the whole pipeline). The
  * deployment claim is that `Pq.saveCodebook`/`Ivf.saveModel` plus an
  * at-rest code table ([[graft.ops.Pq.buildIvfIndex]]/`Pq.encode`
  * persisted once) amortize that; this probe puts a number on it.
  *
  * A = the registry shape verbatim (Qext's fixed-quantizer queries).
  * B = warm: codebook+model loaded from their saved parquet forms, codes
  *     pre-encoded and read from parquet, query served via the `*Indexed`/
  *     `*Encoded` entry points. Both sides timed as min of `passes` after
  *     one warmup.
  *
  * Usage: `runMain graft.tools.PqWarmAB [sfDir] [passes]`.
  */
object PqWarmAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(5)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")

    val e = graft.io.Sources.table(spark, sfDir, "embeddings")
    val ids = (0 until 16).map(_ * 31L)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_warm").toString

    // ---- one-time index build (the amortized part), also timed ----
    val tBuild0 = System.nanoTime()
    val cb = Pq.fixedCodebook(e, "vec_id", "embedding", ids, m = 4)
    val model = Ivf.fixedModel(e, "vec_id", "embedding", ids)
    Pq.saveCodebook(spark, cb, s"$dir/cb")
    Ivf.saveModel(spark, model, s"$dir/ivf")
    Pq.encode(e, "vec_id", "embedding", cb)
      .write.mode("overwrite").parquet(s"$dir/codes")
    Pq.buildIvfIndex(e, "vec_id", "embedding", model, cb)
      .write.mode("overwrite").parquet(s"$dir/ivf_index")
    val buildS = (System.nanoTime() - tBuild0) / 1e9

    // ---- warm-side artifacts: loaded models + at-rest tables ----
    val cbW = Pq.loadCodebook(spark, s"$dir/cb")
    val modelW = Ivf.loadModel(spark, s"$dir/ivf")
    val codesW = spark.read.parquet(s"$dir/codes")
    val indexW = spark.read.parquet(s"$dir/ivf_index")
    val q = e.filter(col("vec_id") < 8)

    def time(fn: () => Long): Double = {
      fn() // warmup (JIT/codegen — both sides get one)
      (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    def row(name: String, cold: Double, warm: Double): Unit =
      println(f"[pq-warm] $name%-12s cold=${cold}%.2fs warm=${warm}%.2fs " +
        f"speedup=${cold / warm}%.1fx")

    // pq_adc: registry shape encodes the corpus per call
    row("pq_adc",
      cold = time(() => graft.queries.Qext.qExtPqAdc(spark, sfDir).count()),
      warm = time(() => Pq.adcTopK(q, codesW, "vec_id", "embedding",
        "vec_id", cbW, topK = 5).orderBy("query_id", "rank").count()))

    // ivf_adc: registry shape assigns + encodes per call
    row("ivf_adc",
      cold = time(() => graft.queries.Qext.qExtPqIvfAdc(spark, sfDir).count()),
      warm = time(() => Pq.ivfAdcTopKIndexed(q, indexW, "vec_id",
        "embedding", modelW, cbW, topK = 5, nprobe = 4)
        .orderBy("query_id", "rank").count()))

    // pq_rerank: registry shape encodes per call; warm shortlists at rest
    row("pq_rerank",
      cold = time(() => graft.queries.Qext.qExtPqRerank(spark, sfDir).count()),
      warm = time(() => Pq.adcRerankTopKEncoded(q, e, codesW, "vec_id",
        "embedding", "vec_id", cbW, topK = 5, shortlist = 50)
        .orderBy("query_id", "rank").count()))

    println(f"[pq-warm] one-time build (train+save cb/model, encode+write " +
      f"codes+index) = $buildS%.2fs, amortized across every query after")
    spark.stop()
  }
}
