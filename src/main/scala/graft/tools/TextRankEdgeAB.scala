package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{NgramLm, TextStats}

/** Interleaved A/B of the two TextRank edge-build shapes on the real
  * documents table: (A) round-11 — string-level distinct on the raw
  * bigram stream, then symmetrize + second distinct on ids; (B) round-13
  * — broadcast id mapping onto the raw stream map-side, ONE distinct on
  * the canonical (least, greatest) id pair, explode directions after.
  * Same JVM, alternating reps; counts must match (identical edge sets).
  */
object TextRankEdgeAB {
  def main(args: Array[String]): Unit = {
    // this probe measures the DISTRIBUTED iteration regimes: pin them (the
    // tiny/medium fixtures would otherwise take the round-14 local fast path)
    sys.props("graft.graph.localEdgesMax") = "0"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val ids = TextStats.vocabIds(
      TextStats.vocabulary(docs, "doc_id", "text")).persist(lvl)
    ids.count()
    def idsAs(w: String, out: String) = broadcast(
      ids.withColumnRenamed("token", w).withColumnRenamed("token_id", out))

    def edgesA(): Long = {
      val big = NgramLm.docBigrams(docs, "doc_id", "text")
        .select("w1", "w2").distinct()
      val dir = big.join(idsAs("w1", "src"), Seq("w1"))
        .join(idsAs("w2", "dst"), Seq("w2")).select("src", "dst")
      dir.union(dir.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().count()
    }
    def edgesB(): Long = {
      val und = NgramLm.docBigrams(docs, "doc_id", "text")
        .join(idsAs("w1", "src"), Seq("w1"))
        .join(idsAs("w2", "dst"), Seq("w2"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      und.select(col("a").as("src"), col("b").as("dst"))
        .union(und.filter(col("a") =!= col("b"))
          .select(col("b").as("src"), col("a").as("dst")))
        .count()
    }
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    edgesA(); edgesB() // warm
    val rs = (1 to reps).map(_ => (timed(edgesA()), timed(edgesB())))
    val (as, bs) = rs.unzip
    println(f"[trAB] A_two_distinct min=${as.map(_._1).min}%.3f all=${as.map(t => f"${t._1}%.3f").mkString(",")} edges=${as.head._2}")
    println(f"[trAB] B_one_distinct min=${bs.map(_._1).min}%.3f all=${bs.map(t => f"${t._1}%.3f").mkString(",")} edges=${bs.head._2}")
    spark.stop()
  }
}
