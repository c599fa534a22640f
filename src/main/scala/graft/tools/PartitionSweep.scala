package graft.tools

/** Shuffle-parallelism sweep: run shuffle-heavy registry queries at
  * `spark.sql.shuffle.partitions` ∈ {32, 128, 512} (a runtime conf — one
  * JVM, so JIT warmth is shared) against a large SF dir. The cluster
  * question the local bench can't answer directly — "does the plan's cost
  * stay flat as parallelism scales toward a 1000-executor layout, or is
  * there a hidden serial section / per-partition overhead cliff?" —
  * answered with numbers: flat-or-gently-rising means the shape
  * parallelizes; a cliff at 512 means per-task fixed costs dominate and
  * the operator needs coarser tasks at scale; a cliff at 32 means a
  * partition no longer fits and the operator needs MORE parallelism.
  * AQE still coalesces tiny shuffles downward, as it would on a cluster.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_100x sbt "runMain
  * graft.tools.PartitionSweep q_ext_dedup_exact ..." (default query set
  * below; 2 reps, min, after a shared warmup at 32).
  */
object PartitionSweep {
  private val DefaultQueries = Seq(
    "q_ext_dedup_exact", "q_ext_session_outcomes", "q_ext_top_paths",
    "q_ext_sample_weighted", "q_ext_bm25_topk", "q_ext_attribution_multi")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_100x")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val names = if (args.nonEmpty) args.toSeq else DefaultQueries
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      fn(spark, sfDir).count() // warmup at the session default
      val row = Seq(32, 128, 512).map { p =>
        spark.conf.set("spark.sql.shuffle.partitions", p.toString)
        val t = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        f"p$p=$t%.2f"
      }.mkString(" ")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      println(s"[psweep] $name $row")
    }
    spark.stop()
  }
}
