package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Pq

/** Ablation timing for the q_ext_pq_adc shape (guide §1: find WHERE the
  * 2.5 s goes before changing anything): encode-only scan, join+score
  * without the rank, full adcTopK, and a kernel-encode variant — each as
  * a noop-style count over the same sf data.
  */
object PqAblateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val e = graft.io.Sources.table(spark, sfDir, "embeddings")
    val cb = Pq.fixedCodebook(e, "vec_id", "embedding",
      (0 until 16).map(_ * 31L), m = 4)

    def rank5(scored: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("score").desc, col("cand_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("query_id", "cand_id", "score", "rank")
    }

    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      try mk.count() catch { case ex: Throwable =>
        println(s"[ablate] $tag ERR ${ex.getMessage.take(160)}"); return }
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"[ablate] $tag%-28s rep=$r ${(System.nanoTime() - t0) / 1e9}%6.3f s rows=$n")
      }
    }

    time("encode-only") { Pq.encode(e, "vec_id", "embedding", cb) }

    time("encode+filter") {
      Pq.encode(e, "vec_id", "embedding", cb)
        .filter(!array_contains(col("codes"), lit(-1)))
    }

    def scored = {
      val q = e.filter(col("vec_id") < 8).filter(col("embedding").isNotNull)
        .select(col("vec_id").cast("long").as("query_id"),
          Pq.lutExpr(col("embedding"), cb).as("__lut"))
      val c = Pq.encode(e, "vec_id", "embedding", cb)
        .filter(!array_contains(col("codes"), lit(-1)))
        .select(col("vec_id").cast("long").as("cand_id"), col("codes").as("__codes"))
      c.join(broadcast(q), col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          round(Pq.adcScoreExpr(col("__lut"), col("__codes"), cb), 6).as("score"))
    }

    time("join+score (no rank)") { scored }

    time("full adcTopK") {
      Pq.adcTopK(e.filter(col("vec_id") < 8),
        Pq.encode(e, "vec_id", "embedding", cb),
        "vec_id", "embedding", "vec_id", cb, topK = 5)
    }

    time("full + rankTopK on scored") { rank5(scored) }

    // kernel-encode variant: PqExpressions.pq_encode instead of the
    // unrolled literal form (value-identical, PqSpec-locked)
    def scoredKernel = {
      val q = e.filter(col("vec_id") < 8).filter(col("embedding").isNotNull)
        .select(col("vec_id").cast("long").as("query_id"),
          graft.functions.PqExpressions.pq_lut(col("embedding"),
            cb.codewords).as("__lut"))
      val c = e.select(col("vec_id").cast("long").as("cand_id"),
          when(col("embedding").isNotNull,
            graft.functions.PqExpressions.pq_encode(col("embedding"), cb.codewords))
            .otherwise(array((0 until cb.m).map(_ => lit(-1)): _*)).as("__codes"))
        .filter(!array_contains(col("__codes"), lit(-1)))
      c.join(broadcast(q), col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          round(Pq.adcScoreExpr(col("__lut"), col("__codes"), cb), 6).as("score"))
    }

    time("kernel join+score (no rank)") { scoredKernel }
    time("kernel full (rank)") { rank5(scoredKernel) }

    spark.stop()
  }
}
