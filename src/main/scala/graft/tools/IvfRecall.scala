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
    // int8 brute force vs float brute force (quantization loss, no ANN)
    val qe = e.select(col("vec_id"), Similarity.quantizeInt8(col("embedding")).as("q"))
    val int8 = Similarity.bruteForceTopK(qe.filter(col("vec_id") < 8), qe,
        "vec_id", "q", k = 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[ivf] int8-brute  recall@5 = ${int8.intersect(brute).size}/${brute.size}")
    spark.stop()
  }
}
