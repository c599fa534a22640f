package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{NgramLm, PageRank, TextStats}

/** Phase timing for q_ext_textrank warm: vocab-id build vs edge build vs
  * the PageRank iteration vs the output join — separates setup from
  * per-round cost so the optimization target is measured, not guessed.
  * Run a few reps; read the LAST rep (JIT-warm).
  */
object TextRankPhaseProbe {
  def main(args: Array[String]): Unit = {
    // this probe measures the DISTRIBUTED iteration regimes: pin them (the
    // tiny/medium fixtures would otherwise take the round-14 local fast path)
    sys.props("graft.graph.localEdgesMax") = "0"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val docs = graft.io.Sources.table(spark, sfDir, "documents")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      val ids = TextStats.vocabIds(
        TextStats.vocabulary(docs, "doc_id", "text")).persist(lvl)
      val nIds = ids.count()
      val t1 = System.nanoTime()
      val und = NgramLm.docBigrams(docs, "doc_id", "text")
        .join(broadcast(ids.withColumnRenamed("token", "w1")
          .withColumnRenamed("token_id", "src")), Seq("w1"))
        .join(broadcast(ids.withColumnRenamed("token", "w2")
          .withColumnRenamed("token_id", "dst")), Seq("w2"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val edges = und.select(col("a").as("src"), col("b").as("dst"))
        .union(und.filter(col("a") =!= col("b"))
          .select(col("b").as("src"), col("a").as("dst")))
        .persist(lvl)
      val nEdges = edges.count()
      val t2 = System.nanoTime()
      for (iters <- Seq(1, 5)) {
        val ti = System.nanoTime()
        val pr = PageRank.pageRankManaged(edges, "src", "dst", iters)
        val n = pr.use(_.count())
        println(f"[tr-probe] rep=$rep pagerank iters=$iters ${(System.nanoTime() - ti) / 1e9}%6.2fs nodes=$n")
      }
      println(f"[tr-probe] rep=$rep vocab ${(t1 - t0) / 1e9}%6.2fs ($nIds ids)  edges ${(t2 - t1) / 1e9}%6.2fs ($nEdges)")
      ids.unpersist(false); edges.unpersist(false)
    }
    spark.stop()
  }
}
