package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.TextDedup
import graft.streaming.LshStream

/** Latency of the streaming tagger when the INDEX holds a boilerplate pile
  * ([[LshStream.serveCollapsed]]'s case): every arriving near-dup of the
  * pile emits pile-size output rows through the plain index, vs one rep row
  * through the collapsed index. Measures single-event addData +
  * processAllAvailable wall time (p50 over `singles` events) for both
  * servings of the SAME corpus.
  *
  * Usage: `sbt "runMain graft.tools.PileTagBench [sfDir] [pile] [singles]"`.
  */
object PileTagBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pile = args.lift(1).map(_.toInt).getOrElse(50000)
    val singles = args.lift(2).map(_.toInt).getOrElse(20)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val boiler = "this web site and all of its contents are provided under " +
      "the standard terms of service all rights reserved by the operator"
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(spark.range(pile)
        .select(($"id" + 900000000L).as("doc_id"), lit(boiler).as("text")))
    val prepared = TextDedup.minhashPrepare(corpus, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val raw = LshStream.corpusIndex(prepared, "doc_id")

    // multiprobe (r19): the SAME plain serving, query-side probe expansion
    // only — its delta vs `plain` is the multi-probe tag's latency cost
    // (expected ~(1 + rowsPerBand)x bucket fan-out on the broadcast side)
    Seq("plain" -> LshStream.serve(raw, "doc_id"),
        "multiprobe" -> LshStream.serve(raw, "doc_id"),
        "collapsed" -> LshStream.serveCollapsed(raw, "doc_id")).foreach {
      case (mode, idx0) =>
        val index = idx0.persist()
        val input = MemoryStream[(Long, String)]
        val stream = input.toDF().toDF("doc_id", "text")
        val tagged =
          if (mode == "multiprobe")
            LshStream.nearDupTagStreamMultiProbe(stream, index, "doc_id",
              "text", shingleN = 3, bands = 16, rowsPerBand = 4,
              threshold = 0.5)
          else LshStream.nearDupTagStream(stream, index, "doc_id", "text",
            shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
        val query = tagged
          .writeStream.format("memory").queryName(s"pile_$mode")
          .outputMode("append").start()
        def feed(rows: Seq[(Long, String)]): Double = {
          val t0 = System.nanoTime()
          input.addData(rows)
          query.processAllAvailable()
          (System.nanoTime() - t0) / 1e6
        }
        try {
          (1 to 3).foreach(i => feed(Seq((80000L + i, boiler)))) // warm
          val lat = (1 to singles).map(i => feed(Seq((90000L + i, boiler))))
            .sorted
          val rows = spark.table(s"pile_$mode").count()
          println(f"[piletag] mode=$mode%-9s pile=$pile " +
            f"p50=${lat(singles / 2)}%8.1f ms p95=${lat((singles * 95) / 100)}%8.1f ms " +
            f"outRows=$rows")
        } finally { query.stop(); index.unpersist() }
    }
    prepared.unpersist()
    spark.stop()
  }
}
