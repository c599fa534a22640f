package graft.tools

import graft.ops.TextRank

/** Interleaved same-JVM A/B of the PageRank-loop lineage-truncation
  * cadence on the TextRank composition (symmetric graph → no dangling →
  * LINEAR plan nest): cadence 3 (the dangling-tuned default, which eagerly
  * materializes the nest at i=3 of the 5-iteration contract run) vs
  * cadence 8 (no mid-run checkpoint at 5 iterations). Results must be
  * IDENTICAL — truncation changes when frames materialize, never values.
  */
object TextRankCadenceAB {
  def main(args: Array[String]): Unit = {
    // this probe measures the DISTRIBUTED iteration regimes: pin them (the
    // tiny/medium fixtures would otherwise take the round-14 local fast path)
    sys.props("graft.graph.localEdgesMax") = "0"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def run(cadence: Int): (Double, String) = {
      sys.props("graft.graph.checkpointCadence") = cadence.toString
      val t0 = System.nanoTime()
      val top = TextRank.keywordsManaged(docs, "doc_id", "text")
        .use(_.collect())
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, top.take(5).mkString(";"))
    }

    val a = scala.collection.mutable.ArrayBuffer.empty[Double]
    val b = scala.collection.mutable.ArrayBuffer.empty[Double]
    var fingerA: String = null
    var fingerB: String = null
    (1 to reps).foreach { _ =>
      val (ta, fa) = run(3); a += ta; fingerA = fa
      val (tb, fb) = run(8); b += tb; fingerB = fb
    }
    sys.props -= "graft.graph.checkpointCadence"
    require(fingerA == fingerB,
      s"cadence changed VALUES — bug:\nA=$fingerA\nB=$fingerB")
    println(f"[cadenceAB] cadence=3 floor=${a.min}%.2fs all=${a.map(x => f"$x%.2f").mkString(",")}")
    println(f"[cadenceAB] cadence=8 floor=${b.min}%.2fs all=${b.map(x => f"$x%.2f").mkString(",")}")
    println(f"[cadenceAB] identical top-5: $fingerA")
    spark.stop()
  }
}
