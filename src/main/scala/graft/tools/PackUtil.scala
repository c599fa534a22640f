package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Packing, TextStats}

/** One-off comparison: offset vs greedy packing utilization on the real
  * documents corpus (per-lang shards, 512-token budget).
  * Run: runMain graft.tools.PackUtil <sfDir>
  */
object PackUtil {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    import spark.implicits._
    val budget = 512L
    val docs = graft.io.Sources.table(spark, sfDir, "documents")
      .select(col("lang").as("shard"), col("doc_id").as("id"),
        TextStats.wsTokenCount(col("text")).cast("long").as("n_tokens"))

    val offset = Packing.packOffsets(docs.toDF(), col("n_tokens"), budget,
      Seq(col("shard")), Seq(col("id")))
    val offSeqs = Packing.sequenceStats(offset, Seq(col("shard")))
    val greedy = Packing.packGreedy(docs.as[Packing.Doc], budget).toDF()
    val grSeqs = Packing.sequenceStats(greedy, Seq(col("shard")))

    def util(seqs: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val (n, tok) = seqs.agg(count(lit(1)), sum("total_tokens"))
        .as[(Long, Long)].collect().head
      println(f"[pack] $name%-7s sequences=$n util=${tok.toDouble / (n * budget)}%.4f")
    }
    util(offSeqs, "offset")
    util(grSeqs, "greedy")
    spark.stop()
  }
}
