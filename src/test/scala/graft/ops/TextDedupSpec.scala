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

  it should "have complete recall: every pair at or above the threshold" in {
    // brute-force expected set via the same shingle/jaccard expressions
    val sh = docs.select(col("doc_id"),
      array_distinct(TextDedup.shingles(col("text"), 3)).as("s"))
    val a = sh.select(col("doc_id").as("id_a"), col("s").as("sa"))
    val b = sh.select(col("doc_id").as("id_b"), col("s").as("sb"))
    val expected = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("j", TextDedup.jaccard(col("sa"), col("sb")))
      .filter(col("j") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val got = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    got shouldBe expected
  }

  "simhash60" should "match the md5-derived bits DuckDB would compute" in {
    // spot-check the portable token hash against a reference value:
    // md5("fox") = 2b95d1f09b8b66c5c43622a4d9ec9a04 -> first 15 hex chars
    val h = Seq("fox").toDF("t")
      .select(TextDedup.md5Hash60(col("t"))).as[Long].collect().head
    h shouldBe java.lang.Long.parseLong("2b95d1f09b8b66c", 16)
  }

  "simhashNearDups(portable)" should "find the same dup structure as xxhash64" in {
    val pairs = TextDedup.simhashNearDups(docs, "doc_id", "text",
        maxHamming = 3, portable = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs should contain(1L -> 2L)
    pairs should contain(4L -> 5L)
  }

  it should "return identical pairs under frequency ordering" in {
    val lex = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
        threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val freq = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
        threshold = 0.5, freqOrdered = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    freq shouldBe lex
  }

  "minhashPairsFromPrepared" should "reproduce direct near-dups from a parquet store" in {
    val store = java.nio.file.Files.createTempDirectory("graft_mh_store").toString
    TextDedup.minhashPrepare(docs, "doc_id", "text")
      .write.mode("overwrite").parquet(store)
    val fromStore = TextDedup.minhashPairsFromPrepared(
        spark.read.parquet(store), "doc_id", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val direct = TextDedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    fromStore shouldBe direct
  }

  "minhashIncrement" should "find exactly the pairs touching the new batch" in {
    val corpusDocs = docs.filter(col("doc_id").isin(1L, 4L))
    val batch = docs.filter(col("doc_id").isin(2L, 3L, 5L))
    val corpus = TextDedup.minhashPrepare(corpusDocs, "doc_id", "text")
    val inc = TextDedup.minhashIncrement(batch, corpus, "doc_id", "text",
      threshold = 0.5)
    val got = inc.pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val full = TextDedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every full-corpus pair involves a batch doc here, so inc == full; and
    // the corpus-only run finds nothing (1 and 4 are unrelated)
    got shouldBe full
    got should contain allOf (1L -> 2L, 1L -> 3L, 4L -> 5L)
    TextDedup.minhashNearDups(corpusDocs, "doc_id", "text", threshold = 0.5)
      .count() shouldBe 0L
    inc.release()
  }

  it should "produce identical pairs from a maintained corpus bucket table" in {
    val corpusDocs = docs.filter(col("doc_id").isin(1L, 4L))
    val batch = docs.filter(col("doc_id").isin(2L, 3L, 5L))
    val corpus = TextDedup.minhashPrepare(corpusDocs, "doc_id", "text")
    val storedBuckets = TextDedup.lshBuckets(corpus, "doc_id", "__sig", 16, 4)
    val viaStore = TextDedup.minhashIncrement(batch, corpus, "doc_id", "text",
      threshold = 0.5, corpusBuckets = Some(storedBuckets))
    val derived = TextDedup.minhashIncrement(batch, corpus, "doc_id", "text",
      threshold = 0.5)
    viaStore.pairs.orderBy("id_a", "id_b").collect() shouldBe
      derived.pairs.orderBy("id_a", "id_b").collect()
    // deltaBuckets covers exactly the batch ids, bands x docs rows
    val db = viaStore.deltaBuckets.select("doc_id").distinct()
      .as[Long].collect().toSet
    db shouldBe Set(2L, 3L, 5L)
    viaStore.release(); derived.release()
  }

  "ngramJaccardPairs collapseExact" should "be output-identical on a dup-heavy corpus" in {
    // 60% exact dups (identical shingle sets) + a near-dup pair + a
    // null-text pair: the collapse path must reproduce the uncollapsed
    // pair set EXACTLY — including the degenerate [null]-shingle docs,
    // which pair with NOTHING (the prefix join never matches a null key)
    val docs = (
      (0 until 30).map(i => (i.toLong, "shared boilerplate text repeated verbatim across the corpus")) ++
      Seq(
        (100L, "the quick brown fox jumps over the lazy dog"),
        (101L, "the quick brown fox jumps over the lazy cat"),
        (102L, "totally unrelated content on stream processing"),
        (103L, null.asInstanceOf[String]),
        (104L, null.asInstanceOf[String]))
    ).toDF("doc_id", "text")
    def pairSet(collapse: Boolean) =
      TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
          shingleN = 3, threshold = 0.5, collapseExact = collapse,
          collapseMinGroup = 10) // force the collapse path on the 30-doc pile
        .as[(Long, Long, Double)].collect().toSet
    val collapsed = pairSet(true)
    collapsed shouldBe pairSet(false)
    // sanity: the preflight actually chose the collapse path's answer
    // shape (all 30 pile docs pairwise present, near-dups and null pair in)
    collapsed.count(p => p._1 < 30 && p._2 < 30) shouldBe 30 * 29 / 2
    collapsed.exists(p => p._1 == 100L && p._2 == 101L) shouldBe true
    collapsed.exists(p => p._1 == 103L || p._2 == 104L) shouldBe false
  }

  it should "leave a healthy corpus on the plain path with identical output" in {
    val pairs = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleN = 2, threshold = 0.3, collapseExact = true)
    val plain = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleN = 2, threshold = 0.3, collapseExact = false)
    pairs.orderBy("id_a", "id_b").collect() shouldBe
      plain.orderBy("id_a", "id_b").collect()
  }

  "Managed" should "release its caches after use" in {
    val cached = docs.persist()
    cached.count()
    cached.storageLevel.useMemory shouldBe true
    new Managed(cached, Seq(cached)).use(_.count()) shouldBe 5L
    cached.storageLevel.useMemory shouldBe false
  }

  "minhashNearDupsManaged" should "return the same pairs as the plain variant" in {
    val m = TextDedup.minhashNearDupsManaged(docs, "doc_id", "text",
      threshold = 0.5)
    val n = m.use(_.count())
    n shouldBe TextDedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.5).count()
  }

  "sourceOverlap" should "count distinct shared hashes per unordered source pair" in {
    import spark.implicits._
    val d = Seq(
      ("dup1", "s1"), ("dup1", "s2"), ("dup1", "s3"), // 3-way pile
      ("dup2", "s1"), ("dup2", "s2"),                 // s1-s2 again
      ("dup2", "s1"),                                 // same-source repeat: no pair
      ("only", "s3")).toDF("text", "src")
    val got = TextDedup.sourceOverlap(d, "src",
        TextDedup.contentHash(col("text")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    got shouldBe Map(
      ("s1", "s2") -> 2L, ("s1", "s3") -> 1L, ("s2", "s3") -> 1L)
  }

  it should "plan no self-join (set explode)" in {
    TextDedup.sourceOverlap(docs, "doc_id",
        TextDedup.contentHash(col("text")))
      .queryExecution.executedPlan.toString should not include "Join"
  }
}
