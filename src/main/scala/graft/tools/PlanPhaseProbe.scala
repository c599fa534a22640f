package graft.tools

/** Where does a registry query's wall time go — Catalyst (analysis +
  * optimization + physical planning) or execution? Bench times
  * `fn(spark, sfDir).count()` per pass, so every pass pays planning again;
  * for the expression-heavy ANN queries (thousands-of-node literal trees)
  * the driver-side share is invisible in the SQL UI and must be split out
  * before optimizing (guide §1: measure first; §5: the driver should do
  * almost no work).
  *
  * Usage: `sbt "runMain graft.tools.PlanPhaseProbe [sfDir] [query ...]"`
  * (defaults: sf0.1, the slowest-floor queries). Reports per rep:
  * build (DataFrame construction incl. any memoized model lookup),
  * plan (queryExecution.executedPlan forced), exec (count on the SAME
  * QueryExecution).
  */
object PlanPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_ext_pq_adc", "q_ext_pq_ivf_adc", "q_ext_pq_rerank",
        "q_ext_pq_rot_rerank", "q_ext_pq_ivf_rerank", "q_ext_pq_ivf_residual",
        "q_ext_pq_codes", "q_ext_profile_quantiles", "q_ext_lm_score",
        "q_ext_dsir_weights", "q_ext_corpus_prep", "q_ext_hybrid_rrf",
        "q_ext_bm25_topk")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = LocalSession(cores = cores, logLevel = "ERROR")
    val queries = graft.SparkEntry.queries
    names.foreach { n =>
      // warmup: codegen + any one-time model training outside the reps
      try queries(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"[phase] $n WARMUP ERR ${e.getMessage.take(120)}") }
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        val df = queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // forces analysis+opt+physical planning
        val t2 = System.nanoTime()
        val rows = df.count() // its own QueryExecution: re-plans the count subtree
        val t3 = System.nanoTime()
        println(f"[phase] $n%-26s rep=$rep build=${(t1 - t0) / 1e9}%6.3f " +
          f"plan=${(t2 - t1) / 1e9}%6.3f count=${(t3 - t2) / 1e9}%6.3f rows=$rows")
      }
    }
    spark.stop()
  }
}
