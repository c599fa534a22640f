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

  "packGreedy" should "never straddle a boundary and match a driver-side fold" in {
    val ds = docs.as[(Long, String, Long)]
      .map { case (id, shard, n) => Packing.Doc(shard, id, n) }
    val out = Packing.packGreedy(ds, budget = 10L)
      .orderBy("shard", "id")
      .as[Packing.Packed].collect()
    // shard a: 6 | 4+? 4+7>10 -> new | 7+2 ; shard b: 12 alone | 1
    out shouldBe Array(
      Packing.Packed("a", 1L, 6L, 0L, 0L),
      Packing.Packed("a", 2L, 4L, 0L, 6L),  // 6+4 = 10 fits exactly
      Packing.Packed("a", 3L, 7L, 1L, 0L),  // 10+7 would overflow
      Packing.Packed("a", 4L, 2L, 1L, 7L),
      Packing.Packed("b", 5L, 12L, 0L, 0L), // oversized doc: own sequence
      Packing.Packed("b", 6L, 1L, 1L, 0L))
    // no-straddle invariant: offset + tokens <= budget unless doc alone
    out.foreach { p =>
      if (p.seq_offset > 0) (p.seq_offset + p.n_tokens) should be <= 10L
    }
  }

  it should "carry bin state across micro-batches on a stream" in {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Packing.Doc]
    val query = Packing.packGreedy(input.toDS(), budget = 10L)
      .writeStream.format("memory").queryName("pack_greedy")
      .outputMode("append").start()
    try {
      input.addData(Packing.Doc("a", 1L, 6L))
      query.processAllAvailable()
      input.addData(Packing.Doc("a", 2L, 4L), Packing.Doc("a", 3L, 7L))
      query.processAllAvailable()
      val out = spark.table("pack_greedy").orderBy("id")
        .as[Packing.Packed].collect()
      out shouldBe Array(
        Packing.Packed("a", 1L, 6L, 0L, 0L),
        Packing.Packed("a", 2L, 4L, 0L, 6L), // bin state survived the batch gap
        Packing.Packed("a", 3L, 7L, 1L, 0L))
    } finally query.stop()
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

  "pow2Bucket" should "round up to the next power of two, exact powers kept" in {
    val got = Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L, 1023L, 1024L, 1025L)
      .toDF("n").select(col("n"), Packing.pow2Bucket(col("n")).as("b"))
      .as[(Long, Long)].collect().toMap
    got shouldBe Map(1L -> 1L, 2L -> 2L, 3L -> 4L, 4L -> 4L, 5L -> 8L,
      7L -> 8L, 8L -> 8L, 9L -> 16L, 1023L -> 1024L, 1024L -> 1024L,
      1025L -> 2048L)
  }

  "lengthBuckets" should "account padding waste per bucket" in {
    // bucket 8: docs of 6 and 7 -> padded 16, sum 13, waste 18.75%
    // bucket 4: docs of 4 and 2(->2)? no: 2 -> bucket 2
    val rows = Packing.lengthBuckets(docs, tokens = col("n"))
      .orderBy("bucket")
      .select("bucket", "n_docs", "sum_tokens", "padded_tokens", "waste_pct")
      .as[(Long, Long, Long, Long, Double)].collect()
    rows shouldBe Array(
      (1L, 1L, 1L, 1L, 0.0),          // the 1-token doc
      (2L, 1L, 2L, 2L, 0.0),          // the 2-token doc
      (4L, 1L, 4L, 4L, 0.0),          // the 4-token doc
      (8L, 2L, 13L, 16L, 18.75),      // 6 + 7
      (16L, 1L, 12L, 16L, 25.0))      // 12
  }

  it should "surface degenerate zero-length docs as a null-waste bucket" in {
    val rows = Packing.lengthBuckets(Seq(0L, 3L).toDF("n"), col("n"))
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.isNullAt(5)))
    rows shouldBe Array((0L, 1L, true), (4L, 1L, false))
  }
}
