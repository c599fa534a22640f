package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{PageRank, TextRank}

/** Interleaved same-JVM A/B of the broadcast-regime eod dst-partitioning
  * (`-Dgraft.graph.dstPartition`): with it, each iteration's contrib
  * groupBy reuses the pre-partitioned edge table through the alias-aware
  * Project — zero exchanges per iteration; without it, every iteration
  * pays one. Results must be IDENTICAL (a repartition changes where rows
  * sit, never values). Prints per-rep timings plus the top-3 fingerprint
  * (value-identity witness); the structural zero-exchange evidence lives
  * in PLANS.md's executed-plan audits, not here.
  */
object GraphZeroExchangeAB {
  def main(args: Array[String]): Unit = {
    // this probe measures the DISTRIBUTED iteration regimes: pin them (the
    // tiny/medium fixtures would otherwise take the round-14 local fast path)
    sys.props("graft.graph.localEdgesMax") = "0"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val ev = graft.io.Sources.table(spark, sfDir, "events")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val edges = ev.select(col("user_id").as("src"),
      (col("event_id") % 5000).as("dst"))

    def run(on: Boolean): (Double, Double, String) = {
      sys.props("graft.graph.dstPartition") = on.toString
      val t0 = System.nanoTime()
      val pr = PageRank.pageRankManaged(edges, "src", "dst", iterations = 5)
      val top = pr.use(_.orderBy(col("rank_scaled").desc, col("node"))
        .limit(3).collect().mkString(";"))
      val tPr = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      TextRank.keywordsManaged(docs, "doc_id", "text").use(_.count())
      val tTr = (System.nanoTime() - t1) / 1e9
      (tPr, tTr, top)
    }

    val (aPr, aTr) = (collection.mutable.ArrayBuffer.empty[Double],
      collection.mutable.ArrayBuffer.empty[Double])
    val (bPr, bTr) = (collection.mutable.ArrayBuffer.empty[Double],
      collection.mutable.ArrayBuffer.empty[Double])
    var fa: String = null; var fb: String = null
    (1 to reps).foreach { _ =>
      val (p1, t1, f1) = run(on = false); bPr += p1; bTr += t1; fb = f1
      val (p2, t2, f2) = run(on = true); aPr += p2; aTr += t2; fa = f2
    }
    sys.props -= "graft.graph.dstPartition"
    require(fa == fb, s"dst-partitioning changed VALUES — bug:\nA=$fa\nB=$fb")
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(",")
    println(f"[zxAB] pagerank  OFF floor=${bPr.min}%.2f all=${fmt(bPr.toSeq)}  ON floor=${aPr.min}%.2f all=${fmt(aPr.toSeq)}")
    println(f"[zxAB] textrank  OFF floor=${bTr.min}%.2f all=${fmt(bTr.toSeq)}  ON floor=${aTr.min}%.2f all=${fmt(aTr.toSeq)}")
    println(s"[zxAB] identical top-3: $fa")
    spark.stop()
  }
}
