package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Dsir

/** [[DsirStream]]: streaming log-weight == batch rescore on the same
  * fitted model, OOV corpus-ratio floor, hashed-model parity.
  */
class DsirStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // the DsirSpec corpus: tea dialect target inside a mixed raw corpus
  private val rawDocs = Seq(
    (1L, "green tea leaf brew", "t"),
    (2L, "black tea leaf steep", "t"),
    (3L, "oolong tea brew slow", "t"),
    (4L, "gear oil pump valve", "m"),
    (5L, "pump valve torque bolt", "m"),
    (6L, "tea pump hybrid doc", "x")).toDF("doc_id", "text", "kind")
  private val model =
    Dsir.fit(rawDocs, rawDocs.filter($"kind" === "t"), "doc_id", "text")

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  private def runStream(name: String, docs: Seq[Doc],
                        buckets: Option[Int] = None,
                        m: Dsir.Model = model) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val query = DsirStream.scoreStream(input.toDF(), "doc_id", "ts", "text",
        m, buckets)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      query.processAllAvailable()
      // close the window: an event far past the watermark horizon
      input.addData(Doc(999L, ts("2024-01-02 12:00:00"), "tea"))
      query.processAllAvailable()
      spark.table(name).filter($"doc_id" =!= 999L)
        .select("doc_id", "n_feats", "logw_scaled")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    } finally query.stop()
  }

  "scoreStream" should "reproduce the batch rescore bit-for-bit once windows close" in {
    val docs = Seq(
      Doc(1L, ts("2024-01-01 00:05:00"), "green tea leaf brew"),
      Doc(4L, ts("2024-01-01 00:10:00"), "gear oil pump valve"),
      Doc(6L, ts("2024-01-01 00:15:00"), "tea pump hybrid doc"))
    val streamed = runStream("dsir_parity", docs)
    val batch = Dsir.score(
        docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
        model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    streamed shouldBe batch
  }

  it should "floor fully-OOV features at the corpus-ratio constant, not drop them" in {
    val out = runStream("dsir_oov",
      Seq(Doc(7L, ts("2024-01-01 00:05:00"), "zz qq")))
    // "zz qq" -> 3 features (2 unigrams + 1 bigram), all unseen:
    // every term is ln(1) - ln(Nt+F) - ln(1) + ln(Nr+F) = ln((Nr+F)/(Nt+F))
    val (n, lw) = out(7L)
    n shouldBe 3L
    // derive Nr/Nt/F from the model frames instead of hand arithmetic
    val nrV = model.rawTotals.head().getLong(0)
    val fV = model.rawTotals.head().getLong(1)
    val ntV = model.targetTotal.head().getLong(0)
    val term = math.floor(1e9 * (math.log(1.0) - math.log(ntV.toDouble + fV)
      - math.log(1.0) + math.log(nrV.toDouble + fV)) + 0.5).toLong
    lw shouldBe 3L * term
  }

  it should "score through a hashed model when buckets match fit-time" in {
    val b = 1 << 16
    val hashedModel = Dsir.fit(rawDocs, rawDocs.filter($"kind" === "t"),
      "doc_id", "text", Some(b))
    val docs = Seq(Doc(2L, ts("2024-01-01 00:05:00"), "black tea leaf steep"))
    val streamed = runStream("dsir_hashed", docs, Some(b), hashedModel)
    val batch = Dsir.score(Seq((2L, "black tea leaf steep")).toDF("doc_id", "text"),
        hashedModel, "doc_id", "text", Some(b))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    streamed shouldBe batch
  }
}
