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
  * (defaults: sf0.1, the slowest-floor queries; `all` = whole registry).
  * Reports per rep: build (DataFrame construction incl. any memoized model
  * lookup), plan (queryExecution.executedPlan forced), exec (count on the
  * SAME QueryExecution), plus the round-20 job/stage anatomy of the timed
  * count — jobs, stages, task count and summed task time — which separates
  * "the work is serial" from "the time is stage-wave scheduling latency"
  * (guide §2.6/§7: a query whose wall time far exceeds its summed task
  * time at 32 cores is paying job/stage cadence, not compute).
  */
object PlanPhaseProbe {

  private final class Anatomy extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskNanos = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      if (t.taskInfo != null)
        taskNanos.addAndGet(
          (t.taskInfo.finishTime - t.taskInfo.launchTime) * 1000000L)
    }
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1 && args(1) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else if (args.length > 1) args.drop(1).toSeq
      else Seq("q_ext_pq_adc", "q_ext_pq_ivf_adc", "q_ext_pq_rerank",
        "q_ext_pq_rot_rerank", "q_ext_pq_ivf_rerank", "q_ext_pq_ivf_residual",
        "q_ext_pq_codes", "q_ext_profile_quantiles", "q_ext_lm_score",
        "q_ext_dsir_weights", "q_ext_corpus_prep", "q_ext_hybrid_rrf",
        "q_ext_bm25_topk")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = LocalSession(cores = cores, logLevel = "ERROR")
    val anatomy = new Anatomy
    spark.sparkContext.addSparkListener(anatomy)
    val queries = graft.SparkEntry.queries
    names.foreach { n =>
      // warmup: codegen + any one-time model training outside the reps
      try queries(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"[phase] $n WARMUP ERR ${e.getMessage.take(120)}") }
      (1 to reps).foreach { rep =>
        // anatomy window spans the WHOLE rep (build+plan+count): eager
        // queries (bm25 stats head, hybrid's leg collects, graph
        // iteration) run their jobs at build time, not count time.
        // listenerBus is private[spark]; a short sleep drains the async
        // event queue well enough for a probe
        Thread.sleep(100)
        anatomy.reset()
        val t0 = System.nanoTime()
        val df = queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // forces analysis+opt+physical planning
        val t2 = System.nanoTime()
        val rows = df.count() // its own QueryExecution: re-plans the count subtree
        val t3 = System.nanoTime()
        Thread.sleep(100)
        println(f"[phase] $n%-26s rep=$rep build=${(t1 - t0) / 1e9}%6.3f " +
          f"plan=${(t2 - t1) / 1e9}%6.3f count=${(t3 - t2) / 1e9}%6.3f " +
          f"jobs=${anatomy.jobs.get}%2d stages=${anatomy.stages.get}%2d " +
          f"tasks=${anatomy.tasks.get}%4d taskSec=${anatomy.taskNanos.get / 1e9}%7.3f " +
          f"rows=$rows")
      }
    }
    spark.stop()
  }
}
