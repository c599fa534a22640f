package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Pq, Similarity}

/** A/B: Pq.adcScoreExpr's UNROLLED element_at chain vs the native
  * [[graft.functions.PqExpressions.pq_adc]] kernel — the round-14
  * verdict's task 6 probe (the residual-PQ precedent cut 5.6 s -> 1.05 s
  * of pure analysis/codegen cost; does the ADC chain pay the same tax?).
  * Measures the full scoring scan (LUT join + score + count) at the
  * bench shape (m=4, k=16) and the production shape (m=16, k=256), warm
  * (3 reps each, read the last).
  */
object PqAdcAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val e = graft.io.Sources.table(spark, sfDir, "embeddings")
      .filter(col("embedding").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRows = e.count()
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    println(s"[adc-ab] rows=$nRows dim=$dim")

    for ((m, k) <- Seq((4, 16), (16, 256))) {
      // synthetic deterministic codebook: timing only needs the SHAPE
      val cb = Pq.Codebook(dim, (0 until m).map(s =>
        (0 until k).map(j =>
          Array.tabulate(dim / m)(d => ((s * 31 + j * 7 + d * 13) % 17 - 8) / 8.0))))
      val codes = Pq.encode(e, "vec_id", "embedding", cb)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      codes.count()
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          Pq.lutExpr(col("embedding"), cb).as("__lut"))
      def scan(native: Boolean): Double = {
        val scored = codes
          .select(col("vec_id").as("cand_id"), col("codes").as("__codes"))
          .join(broadcast(q), col("query_id") =!= col("cand_id"))
          .select(col("query_id"), col("cand_id"),
            round(
              if (native)
                graft.functions.PqExpressions.pq_adc(
                  col("__lut"), col("__codes"), cb.k)
              else Pq.adcScoreExpr(col("__lut"), col("__codes"), cb),
              6).as("score"))
        val t0 = System.nanoTime()
        scored.agg(count(lit(1)), sum("score")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      (1 to 3).foreach { rep =>
        val tu = scan(native = false)
        val tn = scan(native = true)
        println(f"[adc-ab] m=$m k=$k rep=$rep unrolled=$tu%6.2fs native=$tn%6.2fs")
      }
      codes.unpersist(false)
    }
    e.unpersist(false)
    spark.stop()
  }
}
