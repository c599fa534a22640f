package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** [[BudgetStream.admitWithinBudget]] — budget consumed across
  * micro-batches, boundary-doc rule, per-group overrides, exhausted groups
  * stay closed.
  */
class BudgetStreamSpec extends SparkSpec {
  import spark.implicits._

  "admitWithinBudget" should "admit across batches until each source's budget is consumed" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[BudgetStream.Doc]
    val query = BudgetStream.admitWithinBudget(input.toDS(),
        budgetByGroup = Map("big" -> 100L), defaultBudget = 30L)
      .writeStream.format("memory").queryName("budget_stream")
      .outputMode("append").start()
    try {
      // batch 1: "a" consumes 25 (under 30); "big" consumes 60 (under 100)
      input.addData(
        BudgetStream.Doc(1, "a", 25),
        BudgetStream.Doc(2, "big", 60))
      query.processAllAvailable()
      // batch 2: "a" at 25 < 30 -> doc 3 is the included boundary doc
      // (consumed becomes 65); doc 4 arrives after -> rejected.
      // "big" at 60 < 100 -> doc 5 admitted (consumed 160).
      input.addData(
        BudgetStream.Doc(3, "a", 40),
        BudgetStream.Doc(4, "a", 1),
        BudgetStream.Doc(5, "big", 100))
      query.processAllAvailable()
      // batch 3: both sources exhausted; a NEW source uses the default
      input.addData(
        BudgetStream.Doc(6, "a", 1),
        BudgetStream.Doc(7, "big", 1),
        BudgetStream.Doc(8, "fresh", 10))
      query.processAllAvailable()
      val admitted = spark.table("budget_stream")
        .as[BudgetStream.Doc].collect().map(_.doc_id).sorted
      admitted shouldBe Array(1L, 2L, 3L, 5L, 8L)
    } finally query.stop()
  }

  it should "match the batch operator's admitted set on a single batch" in {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      BudgetStream.Doc(1, "x", 10), BudgetStream.Doc(2, "x", 10),
      BudgetStream.Doc(3, "x", 10), BudgetStream.Doc(4, "y", 5))
    val batch = graft.ops.Curation.tokenBudgetPerGroup(
        docs.toDF(), "source", "n_tokens", Seq(col("doc_id").asc),
        Map.empty, defaultBudget = 15L)
      .select("doc_id").as[Long].collect().sorted
    val input = MemoryStream[BudgetStream.Doc]
    val query = BudgetStream.admitWithinBudget(input.toDS(), Map.empty, 15L)
      .writeStream.format("memory").queryName("budget_stream_parity")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      query.processAllAvailable()
      spark.table("budget_stream_parity").as[BudgetStream.Doc]
        .collect().map(_.doc_id).sorted shouldBe batch
    } finally query.stop()
  }
}
