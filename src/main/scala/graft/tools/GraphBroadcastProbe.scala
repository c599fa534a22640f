package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.PageRank

/** Measure the two [[PageRank]] iteration regimes on the SAME graph in one
  * JVM: the measured-|V| broadcast siding vs the shuffled-hash path (forced
  * via `graft.graph.broadcastNodesMax=0`). Reps interleave so ambient load
  * cancels. Args: [nodes] [iterations] [reps] — defaults 500000 5 3.
  * Evidence for SCALE.md: the threshold should be a win everywhere it
  * engages, and the shuffled path must stay healthy for the graphs above it.
  */
object GraphBroadcastProbe {
  def main(args: Array[String]): Unit = {
    // this probe measures the DISTRIBUTED iteration regimes: pin them (the
    // tiny/medium fixtures would otherwise take the round-14 local fast path)
    sys.props("graft.graph.localEdgesMax") = "0"
    val n = if (args.length > 0) args(0).toLong else 500000L
    val iters = if (args.length > 1) args(1).toInt else 5
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    import spark.implicits._
    // deterministic 3-regular graph, the registry fixture shape at any n
    val edges = spark.range(n).select(col("id").as("src"),
        explode(array((col("id") * 3 + 1) % n, (col("id") * 5 + 2) % n,
          (col("id") * 7 + 3) % n)).as("dst"))
      .distinct()

    def run(): Long =
      PageRank.pageRankManaged(edges, "src", "dst", iters).use { r =>
        r.orderBy(col("rank_scaled").desc, col("node").asc).limit(100).count()
      }
    def timed(): Double = {
      val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
    }

    run() // warm
    val (bs, ss) = (1 to reps).map { _ =>
      System.clearProperty("graft.graph.broadcastNodesMax")
      val b = timed()
      System.setProperty("graft.graph.broadcastNodesMax", "0")
      val s = timed()
      (b, s)
    }.unzip
    System.clearProperty("graft.graph.broadcastNodesMax")
    println(f"[graphProbe] n=$n iters=$iters broadcast min=${bs.min}%.3f " +
      f"all=${bs.map(t => f"$t%.3f").mkString(",")}")
    println(f"[graphProbe] n=$n iters=$iters shuffled  min=${ss.min}%.3f " +
      f"all=${ss.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
