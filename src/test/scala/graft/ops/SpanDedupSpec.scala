package graft.ops

import graft.SparkSpec

/** Duplicate-span (exact-substring) removal: keep-first semantics,
  * run collapse, short/null/empty documents, and cache lifecycle.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0, "a b c d e f"),   // first occurrence of "b c d" — kept in full
    (1, "x b c d y"),     // repeats "b c d" — span cut
    (2, "p q r"),         // exactly k tokens, unique gram
    (3, null.asInstanceOf[String]),
    (4, ""),
    (5, "a b"),           // shorter than k: no spans, untouched
    (6, "m n o m n o m n o")) // repeated run: one copy survives
    .toDF("doc_id", "text")

  "SpanDedup.duplicateSpans" should "report count and the corpus-wide first occurrence" in {
    val occ = SpanDedup.spanOccurrences(corpus, "doc_id", "text", k = 3)
    val dup = SpanDedup.duplicateSpans(occ, "doc_id")
      .select("n_occurrences", "first_doc_id", "first_gpos")
      .as[(Long, Int, Int)].collect().toSet
    // "b c d" twice (first doc0@1); doc6's "m n o" ×3 (first @0),
    // "n o m" ×2 (@1), "o m n" ×2 (@2)
    dup shouldBe Set((2L, 0, 1), (3L, 6, 0), (2L, 6, 1), (2L, 6, 2))
  }

  "SpanDedup.dedupSpans" should "cut every repeated span except the first, preserving short/null/empty docs" in {
    val out = SpanDedup.dedupSpans(corpus, "doc_id", "text", k = 3)
      .orderBy("doc_id")
      .as[(Int, String, Long, Long)].collect()
    out shouldBe Array(
      (0, "a b c d e f", 6L, 0L),
      (1, "x y", 5L, 3L),
      (2, "p q r", 3L, 0L),
      (3, null, 0L, 0L),
      (4, "", 1L, 0L),
      (5, "a b", 2L, 0L),
      // covered = union of dropped windows @3..8 — exactly one run copy kept
      (6, "m n o", 9L, 6L))
  }

  it should "merge OVERLAPPING, ADJACENT, and NESTED span coverage by position union" in {
    val corpus = Seq(
      (0, "c d e x1 x2"),     // corpus-wide first "c d e"
      // OVERLAPPING: keeps "a b c" (its first occurrence), but the dropped
      // "c d e" occurrence @2 covers 2..4 and cuts into the kept window —
      // the documented position-union semantics
      (1, "a b c d e f"),
      (2, "q a b c q2"),      // "a b c" repeat (first is doc1@0) → cut
      // NESTED: a 5-token shared run's three overlapping windows are each
      // duplicated; their union removes the run in full (the L >= k
      // coverage argument), nothing of doc 3's originals is touched
      (3, "p q r s t u"),
      (4, "z1 p q r s t z2"),
      // ADJACENT: two dropped spans from DIFFERENT grams touch end-to-start
      // (0..2 and 3..5) — coverage merges into one contiguous cut
      (5, "s1 g h i s2"),     // first "g h i"
      (6, "s3 j k l s4"),     // first "j k l"
      (7, "g h i j k l m2"))
      .toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(corpus, "doc_id", "text", k = 3)
      .orderBy("doc_id")
      .as[(Int, String, Long, Long)].collect()
    out shouldBe Array(
      (0, "c d e x1 x2", 5L, 0L),
      (1, "a b f", 6L, 3L),
      (2, "q q2", 5L, 3L),
      (3, "p q r s t u", 6L, 0L),
      (4, "z1 z2", 7L, 5L),
      (5, "s1 g h i s2", 5L, 0L),
      (6, "s3 j k l s4", 5L, 0L),
      (7, "m2", 7L, 6L))
  }

  it should "be the identity when no span repeats" in {
    val solo = Seq((0, "a b c d"), (1, "e f g h")).toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(solo, "doc_id", "text", k = 3)
      .orderBy("doc_id").as[(Int, String, Long, Long)].collect()
    out shouldBe Array((0, "a b c d", 4L, 0L), (1, "e f g h", 4L, 0L))
  }

  it should "release its persisted occurrence table via the Managed handle" in {
    // Compare id SETS, not sizes: the context cleaner may concurrently GC
    // caches left by other suites, so a size delta is not a valid signal.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val m = SpanDedup.dedupSpansManaged(corpus, "doc_id", "text", k = 3)
    m.use(_.count()) shouldBe 7L
    (spark.sparkContext.getPersistentRDDs.keySet -- before) shouldBe empty
  }
}
