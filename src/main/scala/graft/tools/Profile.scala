package graft.tools
import org.apache.spark.sql.functions._
import graft.ops.TextDedup
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime()-t0)/1e9}%8.2fs"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = time("shingles.count") {
      docs.select(col("doc_id"), TextDedup.shingles(col("text"), 3).as("s")).count()
    }
    val prepared = docs.select(col("doc_id"), col("text"))
      .withColumn("__shingles", TextDedup.shingles(col("text"), 3))
      .withColumn("__sig", TextDedup.minhashSignature(col("__shingles"), 64))
      .persist()
    time("signatures materialize") { prepared.count() }
    val buckets = TextDedup.lshBuckets(prepared, "doc_id", "__sig", 16, 4).persist()
    time("buckets") { buckets.count() }
    val a = buckets.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
    val b = buckets.select(col("doc_id").as("id_b"), col("band"), col("bucket"))
    val cand = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().persist()
    time("candidates") { println("cand=" + cand.count()) }
    val sa = prepared.select(col("doc_id").as("id_a"), col("__shingles").as("__sh_a"))
    val sb = prepared.select(col("doc_id").as("id_b"), col("__shingles").as("__sh_b"))
    time("verify jaccard") {
      cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn("j", TextDedup.jaccard(col("__sh_a"), col("__sh_b")))
        .filter(col("j") >= 0.5).count()
    }
    spark.stop()
  }
}
