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

  "stagesWithSemantic" should "prune semantic dups and keep vectorless docs" in {
    import graft.ops.{Ivf, SemDedup}
    val embeddings = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Ivf.fixedModel(embeddings, "vec_id", "embedding",
      Seq(0L, 7L, 14L, 21L))
    val plain = CorpusPrep.stages(train, bench,
      CorpusPrep.Config(defaultBudget = 30L))
    val sem = CorpusPrep.stagesWithSemantic(train, bench, embeddings,
      "vec_id", "embedding", model, tau = 0.4,
      CorpusPrep.Config(defaultBudget = 30L))
    val plainIds = plain.deduped.select("doc_id").as[Long].collect().toSet
    val semIds = sem.deduped.select("doc_id").as[Long].collect().toSet
    semIds.subsetOf(plainIds) shouldBe true
    // the semantic pass engages: embedding near-dups exist in the corpus
    semIds.size should be < plainIds.size
    // vectorless docs (no embedding row) are never dropped by the stage
    val vectorless = plainIds.diff(
      embeddings.select("vec_id").as[Long].collect().toSet)
    vectorless.subsetOf(semIds) shouldBe true
    // the dropped set matches a direct SemDedup run on the embedded subset
    val embedded = train.join(
        embeddings.select(col("vec_id").as("doc_id"), col("embedding")),
        "doc_id")
      .join(plain.deduped.select("doc_id"), "doc_id")
    val directKept = SemDedup.dedup(embedded, "doc_id", "embedding",
        model, tau = 0.4)
      .select("doc_id").as[Long].collect().toSet
    semIds shouldBe (vectorless ++ directKept)
    // downstream stages still run on the pruned frontier
    sem.chunks.count() should be > 0L
  }
}
