package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Blocking, TextDedup}

/** Wall-time of the INCREMENTAL near-dup path against a degenerate stored
  * corpus ([[TextDedup.minhashIncrement]]'s round-8 guard): the corpus is
  * the sf documents table plus a stored pile of K boilerplate copies; the
  * arriving batch carries `batchPile` more copies plus novel docs. Uncapped,
  * the new↔corpus leg alone is batchPile × K pairs. Prints wall seconds and
  * emitted pair count per (K, mode).
  *
  * Usage: `sbt "runMain graft.tools.IngestSkewBench [sfDir] [piles] [batchPile] [modes]"`.
  */
object IngestSkewBench {

  private val boiler =
    ("this web site and all of its contents are provided under the standard " +
      "terms of service all rights reserved by the operator please read " +
      "these terms carefully before using the site your continued use " +
      "constitutes acceptance of all conditions stated herein")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val piles = args.lift(1).getOrElse("8000,64000").split(",").map(_.trim.toInt)
    val batchPile = args.lift(2).map(_.toInt).getOrElse(500)
    val modes = args.lift(3).getOrElse("auto,off").split(",").map(_.trim)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    import spark.implicits._

    val base = graft.io.Sources.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    for (pile <- piles; mode <- modes) {
      val cap = mode match {
        case "auto" => Blocking.Auto
        case "off" => 0
        case n => n.toInt
      }
      val pileDf = spark.range(pile)
        .select(($"id" + 900000000L).as("doc_id"), lit(boiler).as("text"))
      val corpus = TextDedup.minhashPrepare(base.unionByName(pileDf),
          "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      corpus.count() // store-warm: signatures computed at "ingest time"
      val batch = spark.range(batchPile)
        .select(($"id" + 950000000L).as("doc_id"), lit(boiler).as("text"))
        .unionByName(spark.range(100)
          .select(($"id" + 960000000L).as("doc_id"),
            concat(lit("novel document number "), $"id",
              lit(" about an unrelated subject")).as("text")))
      val t0 = System.nanoTime()
      val inc = TextDedup.minhashIncrement(batch, corpus, "doc_id", "text",
        threshold = 0.5, maxBucket = cap)
      val pairs = inc.pairs.count()
      val sec = (System.nanoTime() - t0) / 1e9
      inc.release(); corpus.unpersist()
      println(f"[ingestskew] corpusPile=$pile%-7d batchPile=$batchPile%-5d " +
        f"mode=$mode%-5s wall=$sec%8.2f s pairs=$pairs")
    }
    spark.stop()
  }
}
