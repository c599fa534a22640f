package graft.tools
import org.apache.spark.sql.functions._
object QuantAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession(cores = 32)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val reps = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[quantAB] $tag min=${reps.min}%.3f p50=${reps.sorted.apply(2)}%.3f")
    }
    time("exact") {
      graft.ops.Profiler.quantiles(li, cols, Seq(0.25, 0.5, 0.75), exact = true).collect()
    }
    time("approx") {
      graft.ops.Profiler.quantiles(li, cols, Seq(0.25, 0.5, 0.75), exact = false).collect()
    }
    spark.stop()
  }
}
