package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Sampling
import graft.pipelines.CorpusPrep

/** Stage-count probe for the corpus-prep composition at an arbitrary SF
  * dir — how many docs each stage passes (the audit CorpusPrep.prepare
  * computes) plus the chunk count, for scale-fixture diagnosis.
  */
object CorpusPrepProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val split = Sampling.trainValTestSplit(
      graft.io.Sources.table(spark, dir, "documents"), "doc_id",
      testPct = 10, valPct = 10, salt = "corpus_v1")
    val bench = split.filter(col("split") === "test")
    val train = split.filter(col("split") === "train")
    val s = CorpusPrep.stages(train, bench,
      CorpusPrep.Config(shingleN = 5,
        budgetByGroup = Map("src1" -> 5000L), defaultBudget = 2000L))
    Seq(
      "train" -> train, "deduped" -> s.deduped, "quality_kept" -> s.kept,
      "decontaminated" -> s.clean, "budgeted" -> s.budgeted,
      "chunks" -> s.chunks
    ).foreach { case (n, df) => println(f"[probe] $n%-16s ${df.count()}%d") }
    spark.stop()
  }
}
