package graft.tools

import org.apache.spark.sql.functions._

import graft.pipelines.{CorpusPipeline, CorpusStore}

/** Per-batch commit cost of the durable corpus store: the append layout
  * ([[CorpusStore.appendBatch]], O(batch) write volume) vs the whole-state
  * rewrite ([[CorpusStore.write]], O(corpus)) as the corpus grows over N
  * ingested batches of the real documents table. The deployment question
  * this answers: does the write path stay flat as the corpus accumulates?
  *
  * Usage: `sbt "runMain graft.tools.StoreBench [sfDir] [batches]"`.
  */
object StoreBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val bench = Seq("benchmark sentence matching nothing at all").toDF("text")
    val batches = docs.grouped(math.max(1, docs.length / nBatches)).toSeq

    Seq("append", "rewrite").foreach { mode =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-storebench-$mode").toString
      var state = CorpusPipeline.emptyState(spark, "doc_id")
      val times = batches.zipWithIndex.map { case (b, i) =>
        val r = CorpusPipeline.ingest(state, b.toSeq.toDF("doc_id", "text"),
          "doc_id", "text", bench, "text", checkpointState = true)
        state = r.state
        val t0 = System.nanoTime()
        if (mode == "append") CorpusStore.appendBatch(r, dir)
        else CorpusStore.write(state, dir)
        (System.nanoTime() - t0) / 1e3 / 1e3
      }
      println(f"[storebench] mode=$mode%-8s batches=${batches.length} " +
        f"first=${times.head}%6.0f ms last=${times.last}%6.0f ms " +
        f"all=${times.map(t => f"$t%.0f").mkString(",")}")
    }
    spark.stop()
  }
}
