package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.PageRank

/** A/B the round-13 registry lifecycle change on its motivating operator:
  * (A) the old shape — unmanaged `pageRank`, count the lazy frame, leave
  * pins to session teardown — vs (B) the new shape — `pageRankManaged`,
  * collect the top-100 into a LocalRelation, release pins + checkpoint
  * blocks in-op. Reps interleave A,B,A,B,... in ONE JVM so ambient load
  * and JIT warmth cancel; the per-shape MIN is the signal. Run in a quiet
  * window; cites from SCALE.md round-13.
  */
object GraphReleaseAB {
  def main(args: Array[String]): Unit = {
    // this probe measures the DISTRIBUTED iteration regimes: pin them (the
    // tiny/medium fixtures would otherwise take the round-14 local fast path)
    sys.props("graft.graph.localEdgesMax") = "0"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    def edges = docs.select(col("doc_id").as("src"),
        explode(array(
          (col("doc_id") * 3 + 1) % n,
          (col("doc_id") * 5 + 2) % n,
          (col("doc_id") * 7 + 3) % n)).as("dst"))
      .distinct()

    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def runA(): Long = { // old: unmanaged, pins leak to session
      val r = PageRank.pageRank(edges, "src", "dst", iterations = 5)
      r.orderBy(col("rank_scaled").desc, col("node").asc).limit(100).count()
    }
    def runB(): Long = // new: managed, LocalRelation, in-op release
      PageRank.pageRankManaged(edges, "src", "dst", iterations = 5).use { r =>
        val rows = r.orderBy(col("rank_scaled").desc, col("node").asc)
          .limit(100).collect()
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), r.schema)
          .count()
      }
    runA(); runB() // warm both paths
    spark.catalog.clearCache() // A leaks pins by design; reset between reps
    val (as, bs) = (1 to reps).map { _ =>
      val a = timed(runA()); spark.catalog.clearCache()
      val b = timed(runB())
      (a, b)
    }.unzip
    println(f"[graphAB] A_unmanaged min=${as.min}%.3f all=${as.map(t => f"$t%.3f").mkString(",")}")
    println(f"[graphAB] B_managed   min=${bs.min}%.3f all=${bs.map(t => f"$t%.3f").mkString(",")}")
    println(f"[graphAB] delta_min=${bs.min - as.min}%.3f s (positive = release costs)")
    spark.stop()
  }
}
