package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Ivf, Pq, Similarity}

/** Residual-IVFADC recall on a CLUSTERED fixture — the regime the operator
  * was built for (SCALE.md records a measured NEGATIVE result on the
  * synthetic near-random corpus embeddings, where the coarse quantizer
  * explains nothing). Here the corpus is K well-separated Gaussian-ish
  * clusters (center norm >> noise norm), the coarse quantizer is seeded
  * with one member per cluster, and residual coding should reconstruct
  * within-cluster geometry that raw coding spends its 16 codewords
  * re-learning cluster membership on. Deterministic LCG noise — same
  * fixture every run.
  *
  * Output: recall@5 vs exact brute-force for raw IVF-PQ and residual
  * IVF-PQ, fixed and trained codebooks, m=4/8 — the ladder the round-13
  * verdict asked for before adjudicating the operator's registry place.
  */
object PqClusteredRecall {

  val NClusters = 16
  val PerCluster = 125 // 2000 vectors, the sf0.1 corpus size
  val Dim = 64

  /** The deterministic clustered fixture: well-separated LCG centers
    * (norm ~4/element) + ANISOTROPIC noise — the within-cluster spread
    * lives in a low-dimensional slice (first 2 of 64 dims at full scale,
    * rest at 0.02), the realistic embedding regime (intrinsic dimension
    * << ambient). Isotropic noise was probed first and is quantization-
    * noise-floor-bound for BOTH coders (raw 3.787 vs residual 3.751 mean
    * |q·x − ADC| at m=8 k=64) — no coder can compress an isotropic ball.
    * Same bits every run (fixed LCG seed); `vec_id % NClusters` IS the
    * cluster id. `unitNorm = true` L2-normalizes each vector so cosine
    * and inner-product rankings coincide — one brute-force truth then
    * serves every tier (the RecallReport clustered rows).
    */
  private[tools] def fixture(spark: org.apache.spark.sql.SparkSession,
                             unitNorm: Boolean = false): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    var s = 0x2545F4914F6CDD1DL // deterministic LCG in [-1, 1)
    def nxt(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2 - 1
    }
    val centers = Array.fill(NClusters)(Array.fill(Dim)(nxt() * 4.0))
    val noiseScale = (d: Int) => if (d < 2) 1.2 else 0.02
    val rows = (0 until NClusters * PerCluster).map { i =>
      val c = centers(i % NClusters)
      val v = c.zipWithIndex.map { case (x, d) => x + nxt() * noiseScale(d) }
      val out =
        if (unitNorm) {
          val n = math.sqrt(v.map(x => x * x).sum)
          v.map(x => (x / n).toFloat)
        } else v.map(_.toFloat)
      (i.toLong, out.toSeq)
    }
    rows.toDF("vec_id", "embedding").repartition(8)
  }

  def main(args: Array[String]): Unit = {
    val spark = LocalSession(cores = 32, logLevel = "ERROR")

    val perCluster = PerCluster
    val e = fixture(spark)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count()

    val q = e.filter(col("vec_id") < 8)
    // ground truth = exact INNER-PRODUCT top-5 (what ADC approximates;
    // bruteForceTopK's cosine would cap measurable recall at the
    // dot-vs-cosine ranking agreement on this non-unit-norm fixture)
    val exactPairs = q.select(col("vec_id").as("query_id"),
        col("embedding").as("__q"))
      .crossJoin(e.select(col("vec_id").as("cand_id"), col("embedding").as("__c")))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        graft.functions.VectorExpressions.vec_dot(
          Similarity.toDouble(col("__q")),
          Similarity.toDouble(col("__c"))).as("score"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("cand_id").asc)
    val brute = exactPairs
      .withColumn("__r", row_number().over(wTop)).filter(col("__r") <= 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // coarse quantizer seeded one-per-cluster (ids 0..15 ARE one per
    // cluster by construction: i % nClusters)
    val ivf = Ivf.fixedModel(e, "vec_id", "embedding", (0L until 16L))
    def recall(name: String, got: org.apache.spark.sql.DataFrame): Unit = {
      val g = got.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[pq-clustered] $name%-26s recall@5 = ${g.intersect(brute).size}/${brute.size}")
    }
    // The decisive comparison is trained-vs-trained at matched (m, k):
    // within a probed cluster every candidate shares q·c, so ranking
    // quality is entirely the coder's ability to resolve the NOISE — the
    // residual form codes exactly that noise, the raw form spends its
    // codewords re-describing cluster membership. Rungs climb code
    // capacity (m subspaces × k codewords) until one side wins or both
    // saturate.
    // Coding-error ladder (the less-noisy metric): mean |q·x − ADC score|
    // over every (query, same-cluster candidate) pair. The raw coder's
    // error floor is the whole within-cluster spread; the residual coder's
    // is its quantization of the noise alone.
    def codeErr(name: String, scores: org.apache.spark.sql.DataFrame): Unit = {
      // ADC approximates the raw INNER PRODUCT q·x (bruteForceTopK's score
      // is cosine — wrong yardstick here)
      val exact = q.select(col("vec_id").as("query_id"),
          col("embedding").as("__q"))
        .crossJoin(e.select(col("vec_id").as("cand_id"),
          col("embedding").as("__c")))
        .select(col("query_id"), col("cand_id"),
          graft.functions.VectorExpressions.vec_dot(
            Similarity.toDouble(col("__q")),
            Similarity.toDouble(col("__c"))).as("exact"))
      val err = scores.join(exact, Seq("query_id", "cand_id"))
        .agg(avg(abs(col("score") - col("exact")))).head().getDouble(0)
      println(f"[pq-clustered] $name%-26s mean|err| = $err%.4f")
    }
    for (m <- Seq(8); k <- Seq(64)) {
      val trained = Pq.trainPortable(e, "vec_id", "embedding", m, k, iters = 2)
      codeErr(s"raw-adc-err m=$m k=$k",
        Pq.ivfAdcTopK(q, e, "vec_id", "embedding", "vec_id", ivf, trained,
          topK = perCluster, nprobe = 1))
      val rTrained = Pq.trainPortable(
        e.select(col("vec_id"), Pq.residualExpr(col("embedding"), ivf).as("r")),
        "vec_id", "r", m, k, iters = 2)
      codeErr(s"resid-adc-err m=$m k=$k",
        Pq.ivfAdcResidualTopK(q, e, "vec_id", "embedding", "vec_id",
          ivf, rTrained, topK = perCluster, nprobe = 1))
    }
    for (m <- Seq(4, 8, 16); k <- Seq(16, 64, 256)) {
      val trained = Pq.trainPortable(e, "vec_id", "embedding", m, k, iters = 2)
      recall(s"raw-ivfadc m=$m k=$k",
        Pq.ivfAdcTopK(q, e, "vec_id", "embedding", "vec_id", ivf, trained,
          topK = 5, nprobe = 4))
      val rTrained = Pq.trainPortable(
        e.select(col("vec_id"), Pq.residualExpr(col("embedding"), ivf).as("r")),
        "vec_id", "r", m, k, iters = 2)
      recall(s"resid-ivfadc m=$m k=$k",
        Pq.ivfAdcResidualTopK(q, e, "vec_id", "embedding", "vec_id",
          ivf, rTrained, topK = 5, nprobe = 4))
    }
    spark.stop()
  }
}
