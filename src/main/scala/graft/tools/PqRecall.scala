package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Ivf, Pq, Similarity}

/** PQ quality probe on the real embeddings table: recall@5 of (a) brute
  * ADC over codes, (b) IVF-PQ (pruned + ADC), against exact brute-force
  * cosine — for both the fixed and the trained codebook, at m=4 and m=8.
  * ADC approximates the INNER PRODUCT; on this table cosine and IP rank
  * nearly identically (vectors are near-unit), so one baseline serves.
  * Run: runMain graft.tools.PqRecall <sfDir>
  */
object PqRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val e = graft.io.Sources.table(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 8)
    val brute = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ivf.fixedModel(e, "vec_id", "embedding", (0 until 16).map(_ * 31L))
    def recall(name: String, got: org.apache.spark.sql.DataFrame): Unit = {
      val g = got.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[pq] $name%-22s recall@5 = ${g.intersect(brute).size}/${brute.size}")
    }
    for (m <- Seq(4, 8)) {
      val fixed = Pq.fixedCodebook(e, "vec_id", "embedding",
        (0 until 16).map(_ * 31L), m)
      val trained = Pq.trainPortable(e, "vec_id", "embedding", m, k = 16, iters = 2)
      for ((nm, cb) <- Seq("fixed" -> fixed, "trained" -> trained)) {
        recall(s"adc m=$m $nm",
          Pq.adcTopK(q, Pq.encode(e, "vec_id", "embedding", cb),
            "vec_id", "embedding", "vec_id", cb, topK = 5))
        recall(s"ivf-adc m=$m $nm",
          Pq.ivfAdcTopK(q, e, "vec_id", "embedding", "vec_id", ivf, cb,
            topK = 5, nprobe = 4))
        for (sl <- Seq(25, 50, 100))
          recall(s"rerank m=$m $nm sl=$sl",
            Pq.adcRerankTopK(q, e, "vec_id", "embedding", "vec_id", cb,
              topK = 5, shortlist = sl))
      }
      // residual IVFADC: fixed residual codebook + one TRAINED on the
      // residual column (trainPortable over a derived frame — no new API)
      val rFixed = Pq.residualCodebook(e, "vec_id", "embedding",
        (0 until 16).map(_ * 31L + 7L), m, ivf) // NOT the centroid ids
      val rTrained = Pq.trainPortable(
        e.select(col("vec_id"), Pq.residualExpr(col("embedding"), ivf).as("r")),
        "vec_id", "r", m, k = 16, iters = 2)
      for ((nm, rcb) <- Seq("fixed" -> rFixed, "trained" -> rTrained))
        recall(s"resid-ivfadc m=$m $nm",
          Pq.ivfAdcResidualTopK(q, e, "vec_id", "embedding", "vec_id",
            ivf, rcb, topK = 5, nprobe = 4))
    }
    spark.stop()
  }
}
