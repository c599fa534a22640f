package graft.tools
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = try graft.SparkEntry.queries(n)(spark, sfDir).count() catch { case e: Throwable => -1L }
      println(f"[time] $n%-28s ${(System.nanoTime()-t0)/1e9}%8.2fs rows=$c")
    }
    spark.stop()
  }
}
