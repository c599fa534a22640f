package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Similarity, TextDedup}

/** Measure the LSH-family block-size distributions on a corpus — the
  * evidence behind [[graft.ops.Blocking.AutoFloor]] /
  * [[graft.ops.Blocking.AutoFactor]] (the auto hot-bucket cap): prints
  * per-family block count, p50/p99/p99.9/max block size, and the derived
  * auto cap, so the "auto is a no-op on well-behaved corpora" claim is a
  * measurement, not an assumption.
  *
  * Usage: `sbt "runMain graft.tools.BucketProbe [sfDir]"`.
  */
object BucketProbe {

  def describe(name: String, blocks: DataFrame, blockCols: Seq[String]): Unit = {
    val r = blocks.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("__bsz"))
      .agg(count(lit(1)).as("blocks"),
        percentile_approx(col("__bsz"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("__bsz"), lit(0.99), lit(10000)).as("p99"),
        percentile_approx(col("__bsz"), lit(0.999), lit(10000)).as("p999"),
        max(col("__bsz")).as("max"),
        sum(col("__bsz")).as("mass"))
      .collect()(0)
    val p999 = r.getAs[Long]("p999")
    val auto = math.max(graft.ops.Blocking.AutoFloor,
      math.min(graft.ops.Blocking.AutoFactor * p999,
        (graft.ops.Blocking.AutoMassFrac * r.getAs[Long]("mass")).toLong))
    println(f"$name%-22s blocks=${r.getAs[Long]("blocks")}%-9d " +
      f"p50=${r.getAs[Long]("p50")}%-5d p99=${r.getAs[Long]("p99")}%-5d " +
      f"p999=$p999%-5d max=${r.getAs[Long]("max")}%-7d autoCap=$auto " +
      (if (r.getAs[Long]("max") <= auto) "(no-op)" else "(CAPS)"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val docs = graft.io.Sources.table(spark, sfDir, "documents")

    val prepared = TextDedup.minhashPrepare(docs, "doc_id", "text").persist()
    describe("minhash 16x4", TextDedup.lshBuckets(prepared, "doc_id", "__sig",
      bands = 16, rowsPerBand = 4), Seq("band", "bucket"))
    prepared.unpersist()

    val sim = docs.select(col("doc_id"),
      TextDedup.simhash60(TextDedup.tokens(col("text"))).as("__simhash"))
    val quarters = sim.select(col("doc_id"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("__simhash"), q * 15).bitwiseAND(lit((1L << 15) - 1))): _*))
        .as(Seq("q", "qval")))
    describe("simhash quarters", quarters, Seq("q", "qval"))

    val emb = graft.io.Sources.table(spark, sfDir, "embeddings")
    val planes = Similarity.hyperplanes(6, 64)
    val buckets = emb.select(col("vec_id"),
      Similarity.lshSignature(col("embedding"), planes).as("__bucket"))
    describe("cosine nbits=6", buckets, Seq("__bucket"))

    spark.stop()
  }
}
