package graft.tools

import org.apache.spark.sql.functions._

/** A/B probe: window keepFirst vs algebraic keepFirstAsc on the bench
  * dedup query's exact shape (lineitem, key l_orderkey, order
  * (l_linenumber, l_partkey)). Usage: `runMain graft.tools.DedupAB [sfDir]`.
  */
object DedupAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession(cores = 32)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey")
    def time(tag: String)(f: => Long): Unit = {
      val warm = f
      val reps = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[dedupAB] $tag min=${reps.min}%.3f p50=${reps.sorted.apply(2)}%.3f rows=$warm")
    }
    time("window") {
      graft.ops.Dedup.keepFirst(li, Seq("l_orderkey"),
        Seq(col("l_linenumber"), col("l_partkey"))).count()
    }
    time("aggMin") {
      graft.ops.Dedup.keepFirstAsc(li, Seq("l_orderkey"),
        Seq("l_linenumber", "l_partkey")).count()
    }
    spark.stop()
  }
}
