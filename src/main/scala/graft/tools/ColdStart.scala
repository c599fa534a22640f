package graft.tools

/** Cold-start budget (round-8 verdict item 5): time the named queries in a
  * FRESH JVM/session — first execution (session + codegen + broadcast-build
  * warm-up) vs two warm repeats — so the per-executor warm-up a cluster
  * pays on first query is a measured number, not folklore. Run each query
  * in its own invocation for a true cold number (the first query in a JVM
  * absorbs session init for everyone after it).
  *
  * Usage: `sbt "runMain graft.tools.ColdStart q_pipeline_pretam [sfDir]"`.
  */
object ColdStart {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_pipeline_pretam")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val t00 = System.nanoTime()
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val sessionSec = (System.nanoTime() - t00) / 1e9
    val fn = graft.SparkEntry.queries(name)
    def timed(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = timed()
    val warm1 = timed()
    val warm2 = timed()
    println(f"COLDSTART $name session=$sessionSec%.2f cold=$cold%.2f " +
      f"warm=${math.min(warm1, warm2)}%.2f warmup_overhead=${cold - math.min(warm1, warm2)}%.2f")
    spark.stop()
  }
}
