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

    // Round-16 convergence probe (verdict item 8): per-stage-frontier wall
    // times over `reps` repetitions — each frontier count re-executes its
    // whole prefix, so (stage_k − stage_{k-1}) isolates stage k's own
    // cost and the per-stage min/max spread pins which stage the ambient
    // load moves. args(1) = reps (default 5).
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val stages = Seq[(String, org.apache.spark.sql.DataFrame)](
      "split" -> train, "dedup" -> s.deduped, "quality" -> s.kept,
      "decontaminate" -> s.clean, "budget" -> s.budgeted,
      "chunks" -> s.chunks)
    val times = Array.fill(stages.size)(
      scala.collection.mutable.ArrayBuffer.empty[Double])
    (1 to reps).foreach { _ =>
      stages.zipWithIndex.foreach { case ((_, df), k) =>
        val t0 = System.nanoTime()
        df.count()
        times(k) += (System.nanoTime() - t0) / 1e9
      }
    }
    stages.zipWithIndex.foreach { case ((n, _), k) =>
      val ts = times(k).toSeq
      println(f"[prep-time] $n%-14s min=${ts.min}%5.2f max=${ts.max}%5.2f " +
        f"spread=${ts.max - ts.min}%5.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
