package graft.tools

import org.apache.spark.sql.functions._

/** Phase timing for q_ext_bpe_merges warm: the one corpus wordCounts pass
  * (tokenize + groupBy) vs the gate jobs (count, collect) vs the driver
  * merge loop — pins the optimization target before touching the code.
  */
object BpePhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val docs = graft.io.Sources.table(spark, sfDir, "documents")
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      val wc = graft.ops.Bpe.wordCounts(docs, "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = wc.count()
      val t1 = System.nanoTime()
      val local = wc.collect().map(r => (r.getString(0), r.getLong(1)))
      val t2 = System.nanoTime()
      val merges = graft.ops.Bpe.learnMergesLocal(local, 12)
      val t3 = System.nanoTime()
      import spark.implicits._
      val df = merges.toDF("merge_rank", "pair_a", "pair_b", "pair_count")
      val rows = df.count()
      val t4 = System.nanoTime()
      wc.unpersist(false)
      println(f"[bpe-probe] rep=$rep wcCount=${(t1 - t0) / 1e9}%5.2fs (n=$n) " +
        f"collect=${(t2 - t1) / 1e9}%5.2fs loop=${(t3 - t2) / 1e9}%5.2fs " +
        f"toDF+count=${(t4 - t3) / 1e9}%5.2fs rows=$rows")
    }
    spark.stop()
  }
}
