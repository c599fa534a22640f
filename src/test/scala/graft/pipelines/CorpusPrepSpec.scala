package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[CorpusPrep.prepare]] — the stages compose, each one demonstrably
  * engages on the real documents table, and the bloom/broadcast
  * decontamination paths agree end-to-end.
  */
class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val bench = docs
    .filter(pmod(col("doc_id"), lit(10)) === 0)
    .select(col("doc_id").as("bench_id"), col("text"))
  private lazy val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)

  "prepare" should "run every stage and account for every document" in {
    val out = CorpusPrep.prepare(train, bench,
      CorpusPrep.Config(defaultBudget = 30L))
    val s = out.summary.as[(String, Long)].collect().toMap
    s("input") shouldBe train.count()
    // monotone non-increasing doc counts through the selection stages
    s("deduped") should be <= s("input")
    s("quality_kept") should be <= s("deduped")
    s("decontaminated") should be <= s("quality_kept")
    s("budgeted") should be <= s("decontaminated")
    // the contamination and budget stages both actually engage here
    s("decontaminated") should be < s("quality_kept")
    s("budgeted") should be < s("decontaminated")
    // chunking multiplies: every surviving doc emits >= 1 chunk
    s("chunks") should be >= s("budgeted")
    out.chunks.select(countDistinct("doc_id")).as[Long].head() shouldBe
      s("budgeted")
  }

  it should "produce identical output through the bloom decontamination path" in {
    val cfg = CorpusPrep.Config(defaultBudget = 30L)
    val broadcastPath = CorpusPrep.prepare(train, bench, cfg)
    val bloomPath = CorpusPrep.prepare(train, bench,
      cfg.copy(bloomBenchmark = true))
    val a = broadcastPath.chunks.orderBy("doc_id", "chunk_idx").collect()
    val b = bloomPath.chunks.orderBy("doc_id", "chunk_idx").collect()
    b shouldBe a
  }
}
