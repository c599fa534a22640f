package graft.tools

/** How much driver time does ONE `spark.read.parquet` relation
  * construction cost, warm? (round-20: Bench's timed region includes
  * frame construction, and the 142-query registry re-reads each table's
  * footer on every query build of every pass — if this is milliseconds,
  * a session-scoped catalog memo is worth it; if microseconds, it is not.)
  * Usage: `sbt "runMain graft.tools.ReadCostProbe [sfDir]"`.
  */
object ReadCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val tables = Seq("lineitem", "orders", "customer", "part", "documents",
      "events", "embeddings")
    // cold pass then 3 warm passes
    (0 until 4).foreach { rep =>
      val t0 = System.nanoTime()
      tables.foreach(n => spark.read.parquet(s"$sfDir/$n.parquet"))
      val dt = (System.nanoTime() - t0) / 1e6
      println(f"[readcost] rep=$rep tables=${tables.size} total=${dt}%.1f ms avg=${dt / tables.size}%.2f ms")
    }
    // and the schema-only accessor cost on a built frame (analysis trigger)
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val t1 = System.nanoTime()
    (0 until 100).foreach(_ => spark.read.parquet(s"$sfDir/documents.parquet").schema)
    println(f"[readcost] 100 warm read+schema: ${(System.nanoTime() - t1) / 1e6}%.1f ms")
    spark.stop()
  }
}
