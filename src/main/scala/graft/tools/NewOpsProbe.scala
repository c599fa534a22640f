package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{NgramLm, PageRank, Packing, TextDedup, TextStats}

/** Scale probe for the round-10 operator additions (SCALE.md entry):
  *
  *  - PageRank on synthetic 3-regular graphs at growing |V| (the query's
  *    graph is id-modular, so generating N× nodes is exact, not
  *    approximate scaling); checks the per-iteration cost curve.
  *  - NgramLm / vocabCoverage / sourceOverlap / lengthBuckets on a
  *    ScaleGen-multiplied corpus (token-suffix bijection preserves the
  *    in-copy structure; cross-copy vocab is disjoint, so vocab and
  *    bigram tables scale linearly like a real crawl).
  *
  * Usage: `sbt "runMain graft.tools.NewOpsProbe [copies]"` (default 10 —
  * 50k docs from sf0.1; pagerank sweeps 5k/50k/500k/2M nodes).
  */
object NewOpsProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    import spark.implicits._

    val reps = 3
    // min over reps, after a warmup run: single cold measurements conflate
    // codegen/JVM warmup with operator cost (SCALE.md measurement
    // discipline; the first cold pagerank measured 31 s vs a 1.9 s floor)
    def time[A](label: String)(f: => A): Unit = {
      f // warmup
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[newops] $label%-42s min=${times.min}%.2f s " +
        s"all=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    // --- PageRank / HITS sweep: 3-regular modular graphs ---
    Seq(5000L, 500000L, 2000000L).foreach { n =>
      val edges = spark.range(n).toDF("src")
        .select(col("src"), explode(array(
          (col("src") * 3 + 1) % n, (col("src") * 5 + 2) % n,
          (col("src") * 7 + 3) % n)).as("dst"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      edges.count()
      time(s"pagerank |V|=$n 5 iters") {
        PageRank.pageRank(edges, "src", "dst", iterations = 5)
          .agg(sum("rank_scaled")).collect()
      }
      time(s"hits |V|=$n 3 iters") {
        graft.ops.Hits.hits(edges, "src", "dst", iterations = 3)
          .agg(sum("auth_scaled")).collect()
      }
      edges.unpersist()
    }

    // --- corpus family at `copies`× sf0.1 ---
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docs = ScaleGen.copies(spark, base, copies, Seq("doc_id"), 1000000L,
        Seq("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[newops] corpus rows = ${docs.count()} (${copies}x)")

    time(s"lm_score ${copies}x") {
      NgramLm.avgLogProb(docs, "doc_id", "text").count()
    }
    time(s"vocab_coverage ${copies}x") {
      TextStats.vocabCoverage(docs, "doc_id", "text", topN = 200).count()
    }
    val text2 = when(col("doc_id") % 5 === 0,
      concat(lit("shared boilerplate "), (col("doc_id") % 3).cast("string")))
      .otherwise(col("text"))
    time(s"source_overlap ${copies}x") {
      TextDedup.sourceOverlap(docs.withColumn("text", text2), "source",
        TextDedup.contentHash(col("text"))).count()
    }
    time(s"length_buckets ${copies}x") {
      Packing.lengthBuckets(docs, TextStats.wsTokenCount(col("text"))).count()
    }
    docs.unpersist()
    spark.stop()
  }
}
