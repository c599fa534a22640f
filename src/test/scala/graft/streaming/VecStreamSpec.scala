package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Similarity

class VecStreamSpec extends SparkSpec {
  import spark.implicits._

  private val planes = Similarity.md5Hyperplanes(nbits = 4, dim = 4)

  private val corpus = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),   // near 1
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f)))  // opposite of 1
    .toDF("vec_id", "embedding")

  private def index = VecStream.corpusIndex(corpus, "vec_id", "embedding", planes)

  private val arriving = Seq(
    (10L, Seq(0.95f, 0.05f, 0.0f, 0.0f)), // near 1 and 2
    (11L, Seq(0.0f, 0.0f, 1.0f, 0.0f)))   // no relatives
    .toDF("vec_id", "embedding")

  "corpusIndexCollapsed" should "tag a pile of identical vectors as one rep" in {
    val n = 300
    val pileVec = Seq(0.8f, 0.6f, 0.0f, 0.0f)
    val piled = corpus.unionByName(
      (0 until n).map(i => (1000L + i, pileVec)).toDF("vec_id", "embedding"))
    val collapsed = VecStream.corpusIndexCollapsed(piled, "vec_id",
      "embedding", planes)
    val probe = Seq((90000L, pileVec)).toDF("vec_id", "embedding")
    val viaCollapsed = VecStream.nearDupTagStream(probe, collapsed, "vec_id",
        "embedding", planes, threshold = 0.99)
      .as[(Long, Long, Double)].collect()
    viaCollapsed.map(t => (t._1, t._2)) shouldBe Array((90000L, 1000L))
    viaCollapsed.head._3 shouldBe 1.0
    // the plain index reports every pile member at the same score
    val viaPlain = VecStream.nearDupTagStream(probe,
        VecStream.corpusIndex(piled, "vec_id", "embedding", planes),
        "vec_id", "embedding", planes, threshold = 0.99)
      .as[(Long, Long, Double)].collect()
    viaPlain.length shouldBe n
    // multiplicity is available to consumers; singleton rows unchanged
    collapsed.filter(col("vec_id") === 1000L).select("__members")
      .as[Long].head() shouldBe n.toLong
    collapsed.count() shouldBe (corpus.count() + 1)
  }

  "VecStream.nearDupTagStream" should "match a bucket-blocked batch join" in {
    val tagged = VecStream.nearDupTagStream(arriving, index, "vec_id",
        "embedding", planes, threshold = 0.9)
      .orderBy("stream_id", "corpus_id")
      .as[(Long, Long, Double)].collect()

    // reference: same blocking computed longhand with the unrolled signer
    val a = arriving.select(col("vec_id").as("stream_id"),
      col("embedding").as("__a"),
      Similarity.lshSignatureUnrolled(col("embedding"), planes).as("__bucket"))
    val b = corpus.select(col("vec_id").as("corpus_id"),
      col("embedding").as("__b"),
      Similarity.lshSignatureUnrolled(col("embedding"), planes).as("__bucket"))
    val expected = a.join(b, Seq("__bucket"))
      .filter(col("stream_id") =!= col("corpus_id"))
      .withColumn("cosine", round(
        graft.functions.VectorExpressions.vec_cosine(col("__a"), col("__b")), 6))
      .filter(col("cosine") >= 0.9)
      .select("stream_id", "corpus_id", "cosine")
      .orderBy("stream_id", "corpus_id")
      .as[(Long, Long, Double)].collect()

    tagged shouldBe expected
    tagged.map(_._2).toSet should contain(1L) // 10 finds corpus vec 1
    tagged.map(_._1).toSet should not contain 11L
  }

  it should "not report a re-tagged vector as its own duplicate" in {
    val again = corpus.filter(col("vec_id") === 1L)
    val out = VecStream.nearDupTagStream(again, index, "vec_id", "embedding",
        planes, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    out.exists(r => r._1 == r._2) shouldBe false
  }

  it should "tag a live stream statelessly in append mode" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val query = VecStream.nearDupTagStream(
        input.toDF().toDF("vec_id", "embedding"), index, "vec_id",
        "embedding", planes, threshold = 0.9)
      .writeStream.format("memory").queryName("vec_tags")
      .outputMode("append").start()
    try {
      input.addData((10L, Seq(0.95f, 0.05f, 0.0f, 0.0f)))
      query.processAllAvailable()
      input.addData((11L, Seq(0.0f, 0.0f, 1.0f, 0.0f)))
      query.processAllAvailable()

      query.lastProgress.stateOperators.length shouldBe 0

      val live = spark.table("vec_tags").orderBy("stream_id", "corpus_id")
        .as[(Long, Long, Double)].collect()
      val batch = VecStream.nearDupTagStream(arriving, index, "vec_id",
          "embedding", planes, threshold = 0.9)
        .orderBy("stream_id", "corpus_id").as[(Long, Long, Double)].collect()
      live shouldBe batch
    } finally query.stop()
  }
}
