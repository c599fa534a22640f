package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.streaming.VecStream

/** Measure the stateless embedding tagger (SCALE.md evidence): per-event
  * latency and micro-batch throughput of [[VecStream.nearDupTagStream]]
  * against the sf embeddings corpus, MemoryStream-driven like the spec but
  * timed. Events are corpus vectors under fresh ids, so every event
  * exercises the full sign → bucket join → cosine verify path.
  *
  * Usage: `sbt "runMain graft.tools.VecStreamBench [sfDir] [singles] [batch]"`.
  */
object VecStreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val singles = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val batchN = args.drop(2).headOption.map(_.toInt).getOrElse(1000)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val planes = Similarity.hyperplanes(nbits = 8, dim = 64)
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val index = VecStream.corpusIndex(corpus, "vec_id", "embedding", planes)
      .persist()
    val nIndex = index.count()

    val events = corpus
      .select((col("vec_id") + 50000000L).as("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()

    val input = MemoryStream[(Long, Seq[Float])]
    val query = VecStream.nearDupTagStream(
        input.toDF().toDF("vec_id", "embedding"), index, "vec_id",
        "embedding", planes, threshold = 0.8)
      .writeStream.format("memory").queryName("vec_bench")
      .outputMode("append").start()

    def feed(rows: Seq[(Long, Seq[Float])]): Double = {
      val t0 = System.nanoTime()
      input.addData(rows)
      query.processAllAvailable()
      (System.nanoTime() - t0) / 1e6
    }

    try {
      (0 until 5).foreach(i => feed(Seq(events(i))))
      val lat = (5 until 5 + singles).map(i => feed(Seq(events(i)))).sorted
      val batchRows = events.slice(5 + singles, 5 + singles + batchN)
      val batchMs = feed(batchRows)

      require(query.lastProgress.stateOperators.isEmpty,
        "tagger plan grew a state store operator")
      val tagged = spark.table("vec_bench").count()
      println(f"[vecbench] index=$nIndex vectors, tagged=$tagged pair rows")
      println(f"[vecbench] single-event latency over $singles events: " +
        f"p50=${lat(singles / 2)}%.0fms p95=${lat((singles * 95) / 100)}%.0fms " +
        f"mean=${lat.sum / singles}%.0fms")
      println(f"[vecbench] batch of ${batchRows.length}: ${batchMs}%.0fms = " +
        f"${batchRows.length / (batchMs / 1000)}%.0f events/s")
    } finally {
      query.stop()
      spark.stop()
    }
  }
}
