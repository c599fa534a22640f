package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // (id, shard, n_tokens): shard a fills 10-token sequences as
  // 6 | 4,3(straddles) | 3 cont'd... shard b independent
  private val docs = Seq(
    (1L, "a", 6L), (2L, "a", 4L), (3L, "a", 7L), (4L, "a", 2L),
    (5L, "b", 12L), (6L, "b", 1L))
    .toDF("id", "shard", "n")

  "packOffsets" should "assign sequence ids and offsets per shard" in {
    val out = Packing.packOffsets(docs, tokens = col("n"), budget = 10,
        partitionBy = Seq(col("shard")), orderBy = Seq(col("id")))
      .select("id", "seq_id", "seq_offset")
      .orderBy("id").as[(Long, Long, Long)].collect()
    out shouldBe Array(
      (1L, 0L, 0L),  // before=0
      (2L, 0L, 6L),  // before=6, straddles into seq 1
      (3L, 1L, 0L),  // before=10
      (4L, 1L, 7L),  // before=17
      (5L, 0L, 0L),  // shard b restarts
      (6L, 1L, 2L))  // before=12
  }

  it should "preserve every input row and token" in {
    val packed = Packing.packOffsets(docs, col("n"), 10,
      Seq(col("shard")), Seq(col("id")))
    packed.count() shouldBe docs.count()
    packed.agg(sum("n_tokens")).as[Long].collect().head shouldBe
      docs.agg(sum("n")).as[Long].collect().head
  }

  "sequenceStats" should "report per-sequence utilization" in {
    val packed = Packing.packOffsets(docs, col("n"), 10,
      Seq(col("shard")), Seq(col("id")))
    val stats = Packing.sequenceStats(packed, Seq(col("shard")))
      .orderBy("shard", "seq_id")
      .select("shard", "seq_id", "n_docs", "total_tokens")
      .as[(String, Long, Long, Long)].collect()
    stats shouldBe Array(
      ("a", 0L, 2L, 10L), ("a", 1L, 2L, 9L),
      ("b", 0L, 1L, 12L), ("b", 1L, 1L, 1L))
  }

  "stratifiedHashSample" should "apply per-stratum quotas deterministically" in {
    val rows = (0L until 1000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedHashSample(rows, "id", "lang",
      Map("en" -> 0, "de" -> 100), defaultPct = 50, salt = "s")
    val byLang = kept.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    byLang.getOrElse("en", 0L) shouldBe 0L
    byLang("de") shouldBe 333L                 // 100% of the de rows
    byLang("fr") should (be > 100L and be < 250L) // ~50% of 333
    // determinism: same rows on a rerun
    val again = Sampling.stratifiedHashSample(rows, "id", "lang",
      Map("en" -> 0, "de" -> 100), defaultPct = 50, salt = "s")
    again.select("id").as[Long].collect().sorted shouldBe
      kept.select("id").as[Long].collect().sorted
  }
}
