package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Blocking, TextDedup}

/** Wall-time of MinHash-LSH near-dup on a BOILERPLATE-SKEWED corpus — the
  * scale-killer the auto hot-bucket cap ([[Blocking]]) defends against: the
  * real documents table (optionally ScaleGen-multiplied) plus a pile of K
  * exact copies of one boilerplate page, the shape of a mirrored ToS page
  * in a web crawl. Uncapped, the pile's bucket self-join is K²; the
  * round-8 auto cap collapses it to O(K). Prints one line per (pile, mode)
  * with wall seconds and emitted pair count.
  *
  * Usage: `sbt "runMain graft.tools.SkewBench [sfDir] [copies] [piles] [modes] [op]"`
  *   piles  comma-separated pile sizes, default 2000,8000,32000
  *   modes  comma-separated maxBucket values, `auto`|`off`|int, default auto,off
  *   op     `minhash` (default) or `ngram` — ngram maps auto/off to
  *          collapseExact on/off ([[TextDedup.ngramJaccardPairs]]'s
  *          output-identical exact-dup collapse)
  */
object SkewBench {

  private val boiler =
    ("this web site and all of its contents are provided under the standard " +
      "terms of service all rights reserved by the operator please read " +
      "these terms carefully before using the site your continued use " +
      "constitutes acceptance of all conditions stated herein").split(" ")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(1)
    val piles = args.lift(2).getOrElse("2000,8000,32000").split(",").map(_.trim.toInt)
    val modes = args.lift(3).getOrElse("auto,off").split(",").map(_.trim)
    val op = args.lift(4).getOrElse("minhash")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    import spark.implicits._

    val base0 = graft.io.Sources.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val base = if (copies <= 1) base0
      else ScaleGen.copies(spark, base0, copies, Seq("doc_id"), 1000000L, Seq("text"))
    val baseN = base.count()
    println(s"[skewbench] base corpus: $baseN docs ($sfDir x $copies)")

    val boilerText = boiler.mkString(" ")
    for (pile <- piles; mode <- modes) {
      val cap = mode match {
        case "auto" => Blocking.Auto
        case "off" => 0
        case n => n.toInt
      }
      // pile ids sit above every ScaleGen-shifted id
      val pileDf = spark.range(pile)
        .select(($"id" + 900000000L).as("doc_id"), lit(boilerText).as("text"))
      val corpus = base.unionByName(pileDf)
      val t0 = System.nanoTime()
      val managed =
        if (op == "ngram")
          TextDedup.ngramJaccardPairsManaged(corpus, "doc_id", "text",
            threshold = 0.5, collapseExact = cap != 0)
        else
          TextDedup.minhashNearDupsManaged(corpus, "doc_id", "text",
            threshold = 0.5, maxBucket = cap)
      val pairs = managed.df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      managed.release()
      println(f"[skewbench] op=$op pile=$pile%-7d mode=$mode%-5s wall=$sec%8.2f s pairs=$pairs")
    }
    spark.stop()
  }
}
