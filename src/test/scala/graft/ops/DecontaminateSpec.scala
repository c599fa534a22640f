package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (100L, "what is the capital of france"),
    (101L, "compute the square root of nine"))
    .toDF("bench_id", "text")

  private val docs = Seq(
    (1L, "many pages discuss what is the capital of france today"), // leaks q1
    (2L, "an unrelated essay about distributed query engines"),
    (3L, "compute the square root of nine was the question"),       // leaks q2
    (4L, "short doc"))                                              // < n tokens
    .toDF("doc_id", "text")

  "tag" should "flag documents sharing a benchmark n-gram" in {
    val out = Decontaminate.tag(docs, "doc_id", "text", bench, "text", n = 5)
      .select("doc_id", "n_contaminated", "contaminated")
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect()
    out.map(r => r._1 -> r._3).toMap shouldBe
      Map(1L -> true, 2L -> false, 3L -> true, 4L -> false)
    out.filter(_._3).foreach(_._2 should be >= 1L)
  }

  it should "match short documents via the whole-text shingle fallback" in {
    val shortBench = Seq("short doc").toDF("text")
    val out = Decontaminate.tag(docs, "doc_id", "text", shortBench, "text", n = 5)
      .filter(col("contaminated"))
      .select("doc_id").as[Long].collect()
    out shouldBe Array(4L)
  }

  "clean" should "drop contaminated rows and keep original columns" in {
    val out = Decontaminate.clean(docs, "doc_id", "text", bench, "text", n = 5)
    out.columns.toSeq shouldBe Seq("doc_id", "text")
    out.select("doc_id").as[Long].collect().sorted shouldBe Array(2L, 4L)
  }

  it should "keep exactly the tag form's survivors (anti-join rewrite)" in {
    // round 16: clean() is an id-distinct anti-join, one shuffle lighter
    // than tag+filter — the survivor SET must be identical by contract
    val viaTag = Decontaminate.tag(docs, "doc_id", "text", bench, "text", n = 5)
      .filter(!col("contaminated")).drop("n_contaminated", "contaminated")
      .orderBy("doc_id").collect()
    Decontaminate.clean(docs, "doc_id", "text", bench, "text", n = 5)
      .orderBy("doc_id").collect() shouldBe viaTag
  }
}
