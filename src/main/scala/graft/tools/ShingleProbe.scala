package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.TextDedup

/** Scratch: native shingle_windows vs HOF reference on the sf0.1 corpus. */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").persist()
    docs.count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[shingle] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs check=$r")
    }
    // warm both codegen paths once
    docs.select(sum(size(TextDedup.shingles(col("text"), 3)))).collect()
    docs.select(sum(size(TextDedup.shinglesHof(col("text"), 3)))).collect()

    (1 to 3).foreach { i =>
      time(s"native #$i") {
        docs.select(sum(size(TextDedup.shingles(col("text"), 3))))
          .collect()(0).getLong(0)
      }
      time(s"hof    #$i") {
        docs.select(sum(size(TextDedup.shinglesHof(col("text"), 3))))
          .collect()(0).getLong(0)
      }
    }
    spark.stop()
  }
}
