package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Bloom, Decontaminate, Sampling, TextDedup}

/** Bloom decontamination in its INTENDED regime: a small blocklist-style
  * benchmark against a large corpus (the registry query's test-split
  * benchmark contaminates ~100% of docs — the adversarial worst case, see
  * SCALE.md round 10). Reports broadcast-vs-bloom wall time AND the
  * prefilter's measured reduction (corpus shingles vs might-contain
  * survivors). Usage: `runMain graft.tools.BloomAB [docsDir] [benchPct]`.
  */
object BloomAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_100x")
    val pct = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val spark = LocalSession(cores = 32)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bench = Sampling.hashSample(docs, "doc_id", pct, salt = "bloom_ab")
      .select(col("doc_id").as("bench_id"), col("text"))
    val train = docs.join(bench.select(col("bench_id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    println(s"[bloomAB] docs=${docs.count()} bench=${bench.count()}")

    // prefilter reduction: corpus shingles vs sketch survivors
    val n = 3
    val corpusShingles = train.select(
      explode(array_distinct(TextDedup.shingles(col("text"), n))).as("__s"))
    val total = corpusShingles.count()
    val benchShingles = bench.select(
      explode(TextDedup.shingles(col("text"), n)).as("__s"))
    val bloomBytes = Bloom.build(benchShingles, col("__s"),
      expectedItems = benchShingles.count(), fpp = 0.01).get
    val survivors = corpusShingles
      .filter(Bloom.mightContain(bloomBytes, col("__s"))).count()
    println(f"[bloomAB] corpus_shingles=$total survivors=$survivors " +
      f"reduction=${100.0 * (total - survivors) / total}%.2f%%")

    def time(tag: String)(f: => Long): Unit = {
      val warm = f
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[bloomAB] $tag min=${reps.min}%.2f p50=${reps.sorted.apply(1)}%.2f contaminated=$warm")
    }
    time("broadcast") {
      Decontaminate.tag(train, "doc_id", "text", bench, "text", n)
        .filter(col("contaminated")).count()
    }
    time("bloom") {
      Decontaminate.tagBloom(train, "doc_id", "text", bench, "text", n)
        .filter(col("contaminated")).count()
    }
    spark.stop()
  }
}
