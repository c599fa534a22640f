package graft.tools

import org.apache.spark.sql.functions._

/** Cost of the [[graft.ops.PageRank.LocalEdgesMax]] regime probe on a graph
  * that DOESN'T take the local path: `limit(max+1).count()` vs the full
  * count on a 64M-edge frame. Spark executes limit incrementally (one
  * partition, then 4×, …), so the probe should cost a small constant
  * number of partitions however large the graph — this measures it rather
  * than asserts it.
  */
object LocalGateProbe {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val edges = spark.range(0L, 64L * 1000 * 1000).select(
      (col("id") * 2654435761L % 1000000L).as("src"),
      (col("id") * 40503L % 1000000L).as("dst"))
    val max = graft.ops.PageRank.LocalEdgesMax
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      val probe = edges.limit(max.toInt + 1).count()
      val t1 = System.nanoTime()
      val full = edges.count()
      val t2 = System.nanoTime()
      println(f"[gate-probe] rep=$rep probe(${max + 1})=${(t1 - t0) / 1e9}%6.2fs " +
        f"(saw $probe) fullCount=${(t2 - t1) / 1e9}%6.2fs ($full rows)")
    }
    spark.stop()
  }
}
