package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  "wsTokenCount" should "count whitespace tokens after normalization" in {
    val out = Seq("a  b\tc", "single").toDF("t")
      .select(TextStats.wsTokenCount($"t")).as[Int].collect()
    out shouldBe Array(3, 1)
  }

  "bpeishTokenCount" should "count letter runs, digits, and marks" in {
    val out = Seq("hello world 42!").toDF("t")
      .select(TextStats.bpeishTokenCount($"t")).as[Int].collect()
    out shouldBe Array(5) // hello, world, 4, 2, !
  }

  "langId" should "pick the language with most marker hits, und when none" in {
    val out = Seq(
      "the cat and the dog is not here",
      "el gato es que la casa de madrid",
      "der hund ist nicht und die katze",
      "xyzzy qwerty")
      .toDF("t").select(TextStats.langId($"t")).as[String].collect()
    out shouldBe Array("en", "es", "de", "und")
  }

  it should "break score ties to the alphabetically first language" in {
    // "la" and "que" are markers for both es and fr → tie → es
    val out = Seq("la que").toDF("t").select(TextStats.langId($"t")).as[String].collect()
    out shouldBe Array("es")
  }

  "fingerprint" should "collapse token order and repetition" in {
    val fps = Seq("b a a c", "c b a", "a b d").toDF("t")
      .select(TextStats.fingerprint($"t")).as[String].collect()
    fps(0) shouldBe fps(1)
    fps(0) should not be fps(2)
  }

  "langIdFromProfiles" should "score tokens via the broadcast profile table" in {
    val docs = Seq(
      (1L, "the fox and the hen"),      // en markers: the, and
      (2L, "der Hund ist nicht da."),   // de markers (case + punctuation stripped)
      (3L, "zzz qqq www"),              // no markers -> und
      (4L, "la que"))                   // es/fr tie -> es (alphabetical)
      .toDF("doc_id", "text")
    val out = TextStats.langIdFromProfiles(docs, "doc_id", "text",
        TextStats.profilesTable(spark))
      .orderBy("doc_id").as[(Long, String)].collect()
    out shouldBe Array(1L -> "en", 2L -> "de", 3L -> "und", 4L -> "es")
  }

  "qualityFilter" should "label the first violated rule, in order" in {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // keeps
      (2L, "too short"),                                          // < 5 tokens
      (3L, "supercalifragilistic anthropomorphization uncharacteristically " +
        "electroencephalography institutionalization misunderstanding"),
      (4L, "well!!! okay??? see... (hmm) 'yes'"))                 // punct-heavy
      .toDF("doc_id", "text")
    val out = TextStats.qualityFilter(docs, "text")
      .orderBy("doc_id").select("doc_id", "keep", "fail_reason")
      .as[(Long, Boolean, Option[String])].collect()
    out(0) shouldBe ((1L, true, None))
    out(1) shouldBe ((2L, false, Some("too_few_tokens")))
    out(2) shouldBe ((3L, false, Some("mean_token_too_long")))
    out(3) shouldBe ((4L, false, Some("too_much_punct")))
  }

  "vocabulary" should "count total and document frequency per token" in {
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val v = TextStats.vocabulary(docs, "doc_id", "text")
      .orderBy("token").as[(String, Long, Long)].collect()
    v shouldBe Array(("a", 3L, 2L), ("b", 1L, 1L), ("c", 1L, 1L))
  }

  "tfidfTopTerms" should "rank rare terms above common ones" in {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a d")).toDF("doc_id", "text")
    val top = TextStats.tfidfTopTerms(docs, "doc_id", "text", k = 1,
        idfOf = TextStats.rationalIdf)
      .orderBy("doc_id").select("doc_id", "token").as[(Long, String)].collect()
    // "a" is in every doc (low idf); each doc's distinctive token wins
    top shouldBe Array(1L -> "b", 2L -> "c", 3L -> "d")
  }

  "qualityMetrics" should "produce the expected bundle" in {
    val m = TextStats.qualityMetrics(col("t"))
    val row = Seq("The cat, the hat.").toDF("t")
      .select(m.map { case (n, c) => c.as(n) }: _*).collect().head
    row.getAs[Int]("n_chars") shouldBe 17
    row.getAs[Int]("n_tokens") shouldBe 4
    row.getAs[Double]("punct_ratio") shouldBe (2.0 / 17) +- 1e-3
    row.getAs[Double]("stopword_ratio") shouldBe 0.5 +- 1e-9
  }

  "encodeTokens" should "emit ordered ids with -1 for OOV tokens" in {
    val docs = Seq((1L, "b a b zzz"), (2L, "")).toDF("doc_id", "text")
    // vocab: a (tf 1), b (tf 2) -> ids: b=0, a=1; zzz OOV
    val ids = TextStats.vocabIds(
      TextStats.vocabulary(docs, "doc_id", "text").filter(col("token").isin("a", "b")))
    val out = TextStats.encodeTokens(docs, "doc_id", "text", ids)
      .orderBy("doc_id")
      .as[(Long, Seq[Long], Long)].collect()
    out shouldBe Array(
      (1L, Seq(0L, 1L, 0L, -1L), 1L),
      (2L, Seq(-1L), 1L)) // empty text -> [""] token, OOV
  }

  "vocabIds" should "assign dense 0..N-1 ids in (tf desc, token asc) order across partitions" in {
    // 500 tokens over 8 input partitions with heavy tf ties (tf = i % 7)
    // exercises the cross-partition offset math the ADVICE flagged: range
    // partitioning + zipWithIndex must yield exactly the global rank order.
    val vocab = spark.range(0, 500, 1, 8)
      .selectExpr("format_string('tok%04d', id) as token", "id % 7 as tf")
    val out = TextStats.vocabIds(vocab)
      .orderBy("token_id").as[(String, Long)].collect()
    out.map(_._2).toSeq shouldBe (0L until 500L)
    val expected = (0L until 500L)
      .map(i => (f"tok$i%04d", i % 7))
      .sortBy { case (tok, tf) => (-tf, tok) }
      .map(_._1)
    out.map(_._1).toSeq shouldBe expected
  }

  "dupNgramFraction" should "score repeated n-grams and handle short docs" in {
    def frac(text: String, n: Int): Double =
      Seq(text).toDF("t")
        .select(TextStats.dupNgramFraction(col("t"), n)).as[Double]
        .collect().head
    // "a b a b a": tokens 5 distinct 2 -> 3/5; 2-grams [a b, b a, a b, b a]
    // -> 2/4; 3-grams [a b a, b a b, a b a] -> 1/3
    frac("a b a b a", 1) shouldBe 0.6 +- 1e-12
    frac("a b a b a", 2) shouldBe 0.5 +- 1e-12
    frac("a b a b a", 3) shouldBe (1.0 / 3) +- 1e-12
    frac("all unique words here", 1) shouldBe 0.0
    frac("ab", 3) shouldBe 0.0 // fewer than n tokens -> no n-grams
    frac("", 2) shouldBe 0.0
  }

  "dominantScript" should "pick the majority script with fixed-order ties" in {
    def script(text: String): String =
      Seq(text).toDF("t")
        .select(TextStats.dominantScript(col("t"))).as[String]
        .collect().head
    script("hello world") shouldBe "latin"
    script("привет мир") shouldBe "cyrillic"
    script("γειά σου κόσμε") shouldBe "greek"
    script("你好世界") shouldBe "cjk"
    script("123 !?.") shouldBe "none"
    script("") shouldBe "none"
    script("ab пр") shouldBe "latin" // tie -> earlier-declared script
    script("hi приветик") shouldBe "cyrillic" // majority wins over latin
  }

  "scriptCount" should "count class characters only" in {
    val r = Seq("aб1γ好x").toDF("t").select(
      TextStats.scriptRanges.map { case (n, p) =>
        TextStats.scriptCount(col("t"), p).as(n)
      }: _*).collect().head
    r.getInt(0) shouldBe 2 // a, x
    r.getInt(1) shouldBe 1 // б
    r.getInt(2) shouldBe 1 // γ
    r.getInt(3) shouldBe 1 // 好
  }

  "vocabCoverage" should "accumulate exact token mass in rank order" in {
    // corpus mass 8: a=4, b=2, c=1, d=1
    val docs = Seq((1L, "a a b c"), (2L, "a a b d")).toDF("id", "text")
    val rows = TextStats.vocabCoverage(docs, "id", "text", topN = 3)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    rows shouldBe Array(
      (1, "a", 4L, 4L, 0.5),
      (2, "b", 2L, 6L, 0.75),
      (3, "c", 1L, 7L, 0.875)) // tie c/d -> token asc
  }

  it should "cap at the vocabulary size" in {
    TextStats.vocabCoverage(Seq((1L, "x y")).toDF("id", "text"), "id",
      "text", topN = 10).count() shouldBe 2L
  }
}
