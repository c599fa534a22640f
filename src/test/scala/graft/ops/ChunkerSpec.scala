package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.ShingleExpressions

/** [[Chunker]] / [[ShingleExpressions.StridedWindows]] — window emission
  * rule, overlap/offset bookkeeping, degenerate strides (1 = shingles-ish,
  * width = non-overlapping chunks), and edge texts.
  */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def windows(text: String, width: Int, stride: Int): Seq[String] =
    Seq(text).toDF("text")
      .select(ShingleExpressions.strided_windows(
        TextDedup.tokens(col("text")), width, stride).as("w"))
      .as[Seq[String]].head()

  "strided_windows" should "emit overlapping windows ending exactly at the last token" in {
    // 7 tokens, width 3, stride 2 -> starts 0,2,4 (window at 4 covers to 7)
    windows("a b c d e f g", 3, 2) shouldBe
      Seq("a b c", "c d e", "e f g")
  }

  it should "emit one window for short input and never a contained trailing window" in {
    windows("a b", 3, 2) shouldBe Seq("a b")
    windows("a b c", 3, 2) shouldBe Seq("a b c")
    // 5 tokens: starts 0,2 — window at 2 is "c d e"; start 4 would be
    // "e", fully inside the previous window, and must NOT appear
    windows("a b c d e", 3, 2) shouldBe Seq("a b c", "c d e")
  }

  it should "degenerate to non-overlapping chunks at stride == width" in {
    windows("a b c d e f g", 3, 3) shouldBe Seq("a b c", "d e f", "g")
  }

  it should "degenerate to shingles at stride 1 (long input)" in {
    windows("a b c d e", 2, 1) shouldBe Seq("a b", "b c", "c d", "d e")
  }

  it should "reject invalid stride/width" in {
    an[IllegalArgumentException] should be thrownBy
      ShingleExpressions.strided_windows(col("x"), 4, 5)
    an[IllegalArgumentException] should be thrownBy
      ShingleExpressions.strided_windows(col("x"), 0, 0)
  }

  "Chunker.chunk" should "carry consistent indices, offsets, and token counts" in {
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 tokens -> 3 windows at width 3 stride 2
      (2L, "x"),             // 1 token  -> 1 window
      (3L, ""))              // empty norm -> [""] -> 1 empty chunk
      .toDF("doc_id", "text")
    val out = Chunker.chunk(docs, "doc_id", "text", width = 3, stride = 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Int, Int, String)].collect()
    out shouldBe Array(
      (1L, 0, 0, 3, "a b c"),
      (1L, 1, 2, 3, "c d e"),
      (1L, 2, 4, 3, "e f g"),
      (2L, 0, 0, 1, "x"),
      (3L, 0, 0, 1, ""))
  }

  it should "match the in-memory model on random inputs and parameters" in {
    val rnd = new scala.util.Random(42)
    def model(toks: Seq[String], width: Int, stride: Int): Seq[String] = {
      val len = toks.length
      if (len == 0) Seq.empty
      else {
        val nw = if (len <= width) 1 else 1 + ((len - width + stride - 1) / stride)
        (0 until nw).map(i =>
          toks.slice(i * stride, math.min(i * stride + width, len)).mkString(" "))
      }
    }
    (1 to 60).foreach { _ =>
      val len = rnd.nextInt(40)
      val toks = Seq.fill(len)(('a' + rnd.nextInt(26)).toChar.toString)
      val width = 1 + rnd.nextInt(8)
      val stride = 1 + rnd.nextInt(width)
      val got = Seq(Tuple1(toks)).toDF("t")
        .select(ShingleExpressions.strided_windows(col("t"), width, stride))
        .as[Seq[String]].head()
      withClue(s"len=$len width=$width stride=$stride: ") {
        got shouldBe model(toks, width, stride)
      }
    }
  }

  it should "run unchanged inside a streaming ingest (stateless projection)" in {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val chunked = Chunker.chunk(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      width = 3, stride = 2)
    val query = chunked.writeStream.format("memory")
      .queryName("chunk_stream").outputMode("append").start()
    try {
      input.addData((1L, "a b c d e f g"), (2L, "x"))
      query.processAllAvailable()
      val rows = spark.table("chunk_stream")
        .orderBy("doc_id", "chunk_idx")
        .as[(Long, Int, Int, Int, String)].collect()
      rows.map(_._5).toSeq shouldBe Seq("a b c", "c d e", "e f g", "x")
    } finally query.stop()
  }

  it should "cover every token of every document exactly" in {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val chunks = Chunker.chunk(docs, "doc_id", "text", width = 32, stride = 24)
    // coverage invariant: the union of every window's [start_tok,
    // start_tok + n_tokens) spans exactly [0, n_tokens(doc)) per document
    val covered = chunks
      .select(col("doc_id"),
        explode(sequence(col("start_tok"),
          col("start_tok") + col("n_tokens") - 1)).as("pos"))
      .distinct()
      .groupBy("doc_id").agg(max("pos").as("max_pos"), count(lit(1)).as("n_cov"))
    val expected = docs
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(TextDedup.tokens(col("text")))
          .as("n_tok"))
    val bad = covered.join(expected, "doc_id")
      .filter(col("n_cov") =!= col("n_tok") ||
        col("max_pos") =!= col("n_tok") - 1)
      .count()
    bad shouldBe 0L
  }
}
