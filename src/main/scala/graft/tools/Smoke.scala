package graft.tools


/** Dev smoke harness mirroring the driver's t1 check: SparkEntry.entry must
  * return rows > 0 on sf0.001. Usage: `sbt "runMain graft.tools.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession(cores = 4, logLevel = "WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows = $n (${if (n > 0) "PASS" else "FAIL"})")
    spark.stop()
  }
}
