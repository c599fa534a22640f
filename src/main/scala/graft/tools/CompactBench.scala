package graft.tools

import org.apache.spark.sql.functions._

import graft.pipelines.{CorpusPipeline, CorpusStore}

/** Cost curve of [[CorpusStore.compact]] at a 100×-sized store — the one
  * store operation whose cost was only measured at StoreBench scale
  * before round 11. Builds a store by ingesting the 100× documents
  * fixture (`ScaleGen` output, ~500k docs) in N `appendBatch` commits,
  * then measures one compaction: wall time, the pair-history GC ratio
  * (accumulated O(edges) history → spanning-star O(grouped docs)), and
  * the file-count collapse, plus a rebuild-integrity check (labels
  * regenerate from the compacted pairs with identical group structure).
  *
  * Usage: `sbt "runMain graft.tools.CompactBench [dir100x] [batches]"`.
  */
object CompactBench {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft_100x")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")

    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nCopies = docs.select(expr("max(doc_id div 1000000)")).head()
      .getLong(0).toInt + 1
    val per = math.max(1, nCopies / nBatches)
    val bench = {
      import spark.implicits._
      Seq("benchmark sentence matching nothing at all").toDF("text")
    }

    val dir = java.nio.file.Files.createTempDirectory("graft-compactbench").toString
    var state = CorpusPipeline.emptyState(spark, "doc_id")
    (0 until nBatches).foreach { j =>
      val lo = j * per
      val hi = if (j == nBatches - 1) nCopies else (j + 1) * per
      val batch = docs.filter(expr(s"doc_id div 1000000") >= lo &&
        expr(s"doc_id div 1000000") < hi)
      val t0 = System.nanoTime()
      val r = CorpusPipeline.ingest(state, batch, "doc_id", "text",
        bench, "text", checkpointState = true)
      state = r.state
      CorpusStore.appendBatch(r, dir)
      println(f"[compactbench] batch $j ingest+append " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    def files(table: String): Int =
      new java.io.File(
        CorpusStore.tablePath(spark, dir, table).stripPrefix("file:"))
        .listFiles().count(_.getName.endsWith(".parquet"))
    val before = CorpusStore.read(spark, dir)
    val pairsBefore = before.pairs.count()
    val labelsBefore = before.labels
      .filter(col("doc_id") =!= col("group_id")).count()
    val filesBefore = (files("prepared"), files("buckets"), files("pairs"))

    val t0 = System.nanoTime()
    CorpusStore.compact(spark, dir, "doc_id")
    val compactSec = (System.nanoTime() - t0) / 1e9

    val after = CorpusStore.read(spark, dir)
    val pairsAfter = after.pairs.count()
    val filesAfter = (files("prepared"), files("buckets"), files("pairs"))
    // integrity: components rebuilt from the compacted pairs carry the
    // same non-root membership count as the committed labels
    val rebuilt = graft.ops.DedupGroups.resolveFromPairs(
        after.prepared.select("doc_id"), "doc_id", after.pairs)
      .filter(col("doc_id") =!= col("group_id")).count()
    println(f"[compactbench] store docs=${after.prepared.count()} " +
      f"pairs $pairsBefore -> $pairsAfter " +
      f"(gc ${if (pairsAfter > 0) pairsBefore.toDouble / pairsAfter else 0.0}%.1fx) " +
      f"files $filesBefore -> $filesAfter compact=$compactSec%.1f s " +
      f"rebuilt_nonroots=$rebuilt labels_nonroots=$labelsBefore " +
      f"integrity=${if (rebuilt == labelsBefore) "OK" else "MISMATCH"}")
    spark.stop()
  }
}
