package graft.tools

/** A/B of `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` on
  * the typed-aggregate queries (SCALE.md round-10 note): Spark's default
  * flips ObjectHashAggregate to SORT-based aggregation after 128 distinct
  * keys per task — tuned for unbounded collect_list-style buffers, exactly
  * wrong for the engine's bounded-buffer aggregates (top_k_by,
  * mrl_quantiles, misra_gries), whose per-group state is O(k) by
  * construction. Measured on q_ext_topk_per_group at 100x (500k docs,
  * 1000 groups): 5.4s default vs 0.5-0.7s with the raised threshold —
  * the engine sessions set 131072 (LocalSession/Bench/Verify/SparkSpec).
  *
  * Usage: `sbt "runMain graft.tools.FallbackProbe [sfDir]"`.
  */
object FallbackProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_100x")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    def time(label: String): Unit = {
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries("q_ext_topk_per_group")(spark, sfDir).count()
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$c")
    }
    // LocalSession already sets the raised threshold; measure it first
    // (warm both), then force the Spark default for the contrast.
    time("thresh=131072 warmup")
    time("thresh=131072       ")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    time("thresh=128 (default)")
    time("thresh=128 (rep 2)  ")
    spark.stop()
  }
}
