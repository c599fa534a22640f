package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Ivf, Similarity}

/** One-off comparison: nprobe-4 recall@5 of the avg-trained vs the
  * portable integer-quantized IVF quantizer against brute force, on the
  * real embeddings table. Run: runMain graft.tools.IvfRecall <sfDir>
  */
object IvfRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val e = graft.io.Sources.table(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 8)
    val brute = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(m: Ivf.Model, name: String): Unit = {
      val got = Ivf.annTopK(q, e, "vec_id", "embedding", m, k = 5, nprobe = 4)
        .select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[ivf] $name recall@5 = ${got.intersect(brute).size}/${brute.size}")
    }
    recall(Ivf.train(e, "vec_id", "embedding", k = 16, iters = 2), "avg-train ")
    recall(Ivf.trainPortable(e, "vec_id", "embedding", k = 16, iters = 2), "portable  ")
    recall(Ivf.fixedModel(e, "vec_id", "embedding", (0 until 16).map(_ * 31L)), "fixed     ")
    spark.stop()
  }
}
