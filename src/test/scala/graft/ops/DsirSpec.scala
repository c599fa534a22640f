package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Dsir]] — importance weights for target-directed resampling. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // a corpus with two sublanguages; target = the "tea" dialect
  private val docs = Seq(
    (1L, "green tea leaf brew", "t"),
    (2L, "black tea leaf steep", "t"),
    (3L, "oolong tea brew slow", "t"),
    (4L, "gear oil pump valve", "m"),
    (5L, "pump valve torque bolt", "m"),
    (6L, "tea pump hybrid doc", "x")).toDF("doc_id", "text", "kind")

  private def weights(buckets: Option[Int] = None) =
    Dsir.importanceWeights(docs, docs.filter($"kind" === "t"),
      "doc_id", "text", buckets)

  "importanceWeights" should "rank target-like documents above off-target ones" in {
    val w = weights().collect().map(r =>
      r.getLong(0) -> r.getLong(2)).toMap
    // every tea doc outweighs every machinery doc; the hybrid in between
    Seq(1L, 2L, 3L).foreach { t =>
      Seq(4L, 5L).foreach { m => assert(w(t) > w(m), s"w($t) <= w($m)") }
    }
    assert(w(6L) > w(4L) && w(6L) < w(1L))
  }

  it should "count unigram + bigram occurrences as n_feats" in {
    val n = weights().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 4 tokens -> 4 unigrams + 3 bigrams
    n.values.toSet shouldBe Set(7L)
  }

  it should "match the exact form through the hashed path when buckets are collision-free" in {
    // verify injectivity of the bucketing on this corpus first, so the
    // equality below tests the arithmetic, not luck
    val f = Dsir.docFeatures(docs, "doc_id", "text").select("f").distinct()
    val b = 1 << 20
    val collisions = f.select(pmod(xxhash64($"f"), lit(b.toLong)).as("h"))
      .groupBy("h").count().filter($"count" > 1).count()
    collisions shouldBe 0L
    val exact = weights().orderBy("doc_id").collect().map(_.toSeq)
    val hashed = weights(Some(b)).orderBy("doc_id").collect().map(_.toSeq)
    hashed shouldBe exact
  }

  it should "fold features together under a tiny bucket count (the paper's trade)" in {
    val w = weights(Some(2)).collect()
    w.length shouldBe 6 // every doc still scored, arithmetic total
    w.map(_.getLong(1)).toSet shouldBe Set(7L) // occurrences unchanged
  }

  it should "drop empty documents (no features to score)" in {
    val withEmpty = docs.union(Seq((7L, "   ", "m")).toDF)
    val out = Dsir.importanceWeights(withEmpty,
      withEmpty.filter($"kind" === "t"), "doc_id", "text")
    out.filter($"doc_id" === 7L).count() shouldBe 0L
  }

  it should "compose with top-k hard selection" in {
    val top = weights().orderBy($"logw_scaled".desc, $"doc_id").limit(3)
      .select("doc_id").as[Long].collect().toSet
    top shouldBe Set(1L, 2L, 3L)
  }
}
