package graft.tools

/** Dump `.explain("formatted")` for registry queries to files — the
  * committed before/after plan evidence for optimization rounds.
  *
  * Usage: `sbt "runMain graft.tools.PlanDump <outDir> <suffix> [sfDir] [query ...]"`
  * writes `<outDir>/<query>_<suffix>.txt` for each query (default: all).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [sfDir] [query ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    java.nio.file.Files.createDirectories(outDir)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val queries = graft.SparkEntry.queries
    val names = if (args.length > 3) args.drop(3).toSeq else queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        val df = queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] wrote ${n}_$suffix.txt (${plan.length} chars)")
      } catch {
        case e: Throwable => println(s"[plandump] $n ERR ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
