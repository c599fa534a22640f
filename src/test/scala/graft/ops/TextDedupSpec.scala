package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "  THE   quick brown fox jumps over the lazy dog "), // same after normalize
    (3L, "the quick brown fox jumps over the lazy cat"),      // near-dup of 1
    (4L, "completely different content about spark engines"),
    (5L, "completely different content about spark engines")) // exact dup of 4
    .toDF("doc_id", "text")

  "normalizeText" should "collapse whitespace and lowercase" in {
    val out = Seq(" A  B\tC ").toDF("t")
      .select(TextDedup.normalizeText($"t")).as[String].collect()
    out shouldBe Array("a b c")
  }

  "exactDedup" should "keep one doc per normalized content, smallest id first" in {
    val out = TextDedup.exactDedup(docs, "text", Seq(col("doc_id")))
    out.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 3L, 4L)
  }

  "shingles" should "produce n-gram shingles and fall back to whole text" in {
    val sh = Seq("a b c d").toDF("t")
      .select(TextDedup.shingles($"t", 3)).as[Seq[String]].collect().head
    sh shouldBe Seq("a b c", "b c d")
    val short = Seq("a b").toDF("t")
      .select(TextDedup.shingles($"t", 3)).as[Seq[String]].collect().head
    short shouldBe Seq("a b")
  }

  "jaccard" should "compute exact set similarity" in {
    val out = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(TextDedup.jaccard($"x", $"y")).as[Double].collect().head
    out shouldBe 0.5 +- 1e-9
  }

  "minhashNearDups" should "find near-duplicates and skip unrelated docs" in {
    val pairs = TextDedup.minhashNearDups(docs, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs should contain(1L -> 2L) // identical after normalization
    pairs should contain(4L -> 5L) // exact dup
    pairs should contain(1L -> 3L) // one-token difference
    pairs.exists { case (a, b) => Set(a, b).contains(4L) && Set(a, b).intersect(Set(1L, 2L, 3L)).nonEmpty } shouldBe false
  }

  "simhash64" should "be equal for identical token streams, near for similar" in {
    val hashes = docs.select(col("doc_id"),
        TextDedup.simhash64(TextDedup.tokens(col("text"))).as("h"))
      .as[(Long, Long)].collect().toMap
    hashes(1L) shouldBe hashes(2L)
    hashes(4L) shouldBe hashes(5L)
    java.lang.Long.bitCount(hashes(1L) ^ hashes(3L)) should be < 16
    java.lang.Long.bitCount(hashes(1L) ^ hashes(4L)) should be > 16
  }

  "simhashNearDups" should "find identical-content pairs within the hamming budget" in {
    val pairs = TextDedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs should contain(1L -> 2L)
    pairs should contain(4L -> 5L)
  }

  "ngramJaccardPairs" should "verify candidates with exact jaccard" in {
    val pairs = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs should contain(1L -> 2L)
    pairs should contain(4L -> 5L)
    pairs should not contain (1L -> 3L) // jaccard < 0.9
  }
}
