package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.TextDedup

/** Scratch: jaccard verify cost — array_intersect/array_union composition
  * vs a native counting expression, on realistic candidate pairs.
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")

    // candidate-pair shape: every doc paired with a rotated copy of itself
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), TextDedup.shingles(col("text"), 3).as("__sh"))
    val pairs = docs.as("a").join(
        docs.withColumn("doc_id", col("doc_id") + 1).as("b"), Seq("doc_id"))
      .select(col("a.__sh").as("__sa"), col("b.__sh").as("__sb"))
      .persist()
    pairs.count()

    def time(label: String)(c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      var check = 0.0
      (1 to reps).foreach { _ =>
        check = pairs.select(sum(c)).collect()(0).getDouble(0)
      }
      println(f"[jac] $label%-18s ${(System.nanoTime() - t0) / 1e9 / reps}%7.3fs/pass check=$check%.3f")
    }
    time("warmup")(TextDedup.jaccard(col("__sa"), col("__sb")))
    time("native jaccard")(TextDedup.jaccard(col("__sa"), col("__sb")))
    time("hof jaccard")(TextDedup.jaccardHof(col("__sa"), col("__sb")))
    spark.stop()
  }
}
