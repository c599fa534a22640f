package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.{Retrieval, TextDedup}

/** Stagewise timing of the q_ext_bm25_topk shape: stats agg, tf
  * aggregation, tf persisted + dfreq, and the full query — to find which
  * piece owns the ~1.1 s build (round-19 guide §1).
  */
object Bm25AblateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val docs = graft.io.Sources.table(spark, sfDir, "documents")
    val terms = Seq("dup", "spark", "merge")

    def time(tag: String)(body: => Long): Unit = {
      body // warm
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = body
        println(f"[bm25] $tag%-26s rep=$r ${(System.nanoTime() - t0) / 1e9}%6.3f s n=$n")
      }
    }

    time("stats agg collect") {
      docs.select(size(TextDedup.tokens(col("text"))).as("dl"))
        .agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl"))
        .collect().length.toLong
    }

    def tf = {
      val candidates = docs.filter(
        terms.map(t => lower(col("text")).contains(t)).reduce(_ || _))
      candidates
        .select(col("doc_id"), TextDedup.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), size(col("__toks")).as("dl"),
          explode(col("__toks")).as("token"))
        .filter(col("token").isInCollection(terms))
        .groupBy(col("doc_id"), col("dl"), col("token"))
        .agg(count(lit(1)).as("tf"))
    }

    time("tf agg count") { tf.count() }

    time("tf persist + dfreq + unpersist") {
      val t = tf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = t.groupBy("token").agg(count(lit(1)).as("df")).collect().length.toLong
      t.unpersist()
      n
    }

    time("full bm25") {
      Retrieval.bm25(docs, "doc_id", "text", terms, topN = 20).count()
    }

    spark.stop()
  }
}
