package graft.tools

import org.apache.spark.sql.functions._

/** Phase timing for q_ext_hits warm: prep (docs.count + edge build) vs the
  * iteration loop at 1/2/3 rounds vs the output join+limit — separates
  * setup cost from per-round cost so the optimization target is measured,
  * not guessed. Run a few reps; read the LAST rep (JIT-warm).
  */
object HitsPhaseProbe {
  def main(args: Array[String]): Unit = {
    // this probe measures the DISTRIBUTED iteration regimes: pin them (the
    // tiny/medium fixtures would otherwise take the round-14 local fast path)
    sys.props("graft.graph.localEdgesMax") = "0"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val docs = graft.io.Sources.table(spark, sfDir, "documents")
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") * 3 + 1) % n,
            (col("doc_id") * 5 + 2) % n,
            (col("doc_id") * 7 + 3) % n)).as("dst"))
        .distinct()
      val t1 = System.nanoTime()
      for (iters <- Seq(1, 2, 3)) {
        val ti = System.nanoTime()
        val r = graft.ops.Hits.hitsManaged(edges, "src", "dst", iters)
        val rows = r.use(_.orderBy(col("auth_scaled").desc, col("node").asc)
          .limit(100).collect().length)
        println(f"[hits-probe] rep=$rep iters=$iters ${(System.nanoTime() - ti) / 1e9}%6.2fs rows=$rows")
      }
      println(f"[hits-probe] rep=$rep prep-lazy ${(t1 - t0) / 1e9}%6.2fs (docs.count only)")
    }
    spark.stop()
  }
}
