package graft.tools

/** Flagship-at-scale measurement (round-8 verdict item 6): q_pipeline_pretam
  * on the 100× derived dataset, WARM (explicit warm-up run first, then
  * min-of-N timed runs — the round-7 100× table's pretam row carried session
  * warm-up in-band), plus the end-to-end partitioned parquet write of the
  * result (the deployment-shaped sink WriteAudit pins the plan for).
  *
  * Usage: `sbt "runMain graft.tools.Pretam100 [sf100Dir] [reps]"`.
  */
object Pretam100 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100x")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val fn = graft.SparkEntry.queries("q_pipeline_pretam")

    val w0 = System.nanoTime()
    val rows = fn(spark, dir).count() // warm-up: session + codegen + caches
    val warmup = (System.nanoTime() - w0) / 1e9

    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }

    // end-to-end partitioned write: the pipeline output lands partitioned
    // by order_status (low-cardinality leading read predicate downstream)
    val out = java.nio.file.Files.createTempDirectory("graft_pretam100_").toString
    val t0 = System.nanoTime()
    fn(spark, dir).write.mode("overwrite").partitionBy("order_status")
      .parquet(out)
    val writeSec = (System.nanoTime() - t0) / 1e9
    val written = spark.read.parquet(out).count()

    println(f"PRETAM100 rows=$rows warmup_run=$warmup%.1f " +
      f"warm_min=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")} " +
      f"partitioned_write=$writeSec%.2f written=$written")
    spark.stop()
  }
}
