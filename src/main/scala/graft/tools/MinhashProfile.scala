package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.TextDedup

/** One-off cold-path profile of the minhash LSH stages (NEXT r4 item 3):
  * signature build, bucket self-join, jaccard verification — each stage's
  * FIRST run carries its own codegen compile. Run after a warm-up query
  * so session startup doesn't pollute stage 1.
  * Usage: runMain graft.tools.MinhashProfile [sfDir]
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // absorb session + scan startup

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mh] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val prepared = TextDedup.minhashPrepare(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("signatures (cold)")(prepared.count())
    t("signatures (warm)")(prepared.count())
    val buckets = TextDedup.lshBuckets(prepared, "doc_id", "__sig", 16, 4)
    val a = buckets.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
    val b = buckets.select(col("doc_id").as("id_b"), col("band"), col("bucket"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    t("bucket join (cold)")(candidates.count())
    t("full pairs (cold)")(
      TextDedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5).count())
    t("full pairs (warm)")(
      TextDedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5).count())
    // parquet-backed corpus store (the CorpusPipeline deployment shape):
    // write signatures once, run the LSH join from the re-read table
    val store = "/tmp/graft_mh_store"
    t("store write")(
      TextDedup.minhashPrepare(docs, "doc_id", "text")
        .write.mode("overwrite").parquet(store))
    val stored = spark.read.parquet(store)
    t("pairs from store")(
      TextDedup.minhashPairsFromPrepared(stored, "doc_id", threshold = 0.5).count())
    spark.stop()
  }
}
