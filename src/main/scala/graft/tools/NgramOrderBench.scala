package graft.tools

/** Measures lexicographic vs frequency-ordered prefix filtering in
  * `TextDedup.ngramJaccardPairs` on the full documents table (SCALE.md
  * round-2 note): wall time and result parity at a given sfDir.
  * Usage: `sbt "runMain graft.tools.NgramOrderBench [sfDir]"`.
  */
object NgramOrderBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    import org.apache.spark.sql.functions._
    val docs =
      if (sfDir == "skewed") {
        // hot-shingle corpus: half the docs share a long boilerplate
        // header, so lexicographic prefixes collide corpus-wide
        val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        base.withColumn("text",
          when(col("doc_id") % 2 === 0,
            concat(lit("this document is provided under the standard terms " +
              "and conditions of the corpus license agreement please read " +
              "carefully before proceeding further with "), col("text")))
            .otherwise(col("text")))
      } else spark.read.parquet(s"$sfDir/documents.parquet")
    def run(freq: Boolean): (Long, Double) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.ops.TextDedup.ngramJaccardPairs(
        docs, "doc_id", "text", threshold = 0.5, freqOrdered = freq).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    run(freq = false) // warm JIT once
    val (nLex, tLex) = run(freq = false)
    val (nFreq, tFreq) = run(freq = true)
    println(f"[ngram-order] lex: $nLex pairs in $tLex%.2fs; freq: $nFreq pairs in $tFreq%.2fs")
    spark.stop()
  }
}
