package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TopK

/** [[TopKExpressions.TopKBy]]: the heap aggregate must agree with the
  * rank-window form on every input — its whole reason to exist is being
  * a cheaper plan for the SAME answer.
  */
class TopKSpec extends SparkSpec {

  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("g", "rank", "id", "v")
  }

  private def heapTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    TopK.perGroupTopK(df, Seq("g"), col("v"), col("id"), k,
      payloadName = "id", ordName = "v")

  "top_k_by" should "match the rank window on random data incl ties" in {
    val rng = new scala.util.Random(7)
    // small value range forces heavy ord ties -> payload tie-break bites
    val rows = Seq.tabulate(500)(i => (s"g${rng.nextInt(7)}", i.toLong, rng.nextInt(10).toLong))
    val df = rows.toDF("g", "id", "v")
    val expected = windowTopK(df, 5).collect().map(_.toSeq).toSet
    val got = heapTopK(df, 5).collect().map(_.toSeq).toSet
    got shouldBe expected
  }

  it should "be partitioning-independent (merge path)" in {
    val rng = new scala.util.Random(13)
    val rows = Seq.tabulate(300)(i => (s"g${rng.nextInt(3)}", i.toLong, rng.nextInt(6).toLong))
    val one = heapTopK(rows.toDF("g", "id", "v").coalesce(1), 4)
      .collect().map(_.toSeq).toSet
    val many = heapTopK(rows.toDF("g", "id", "v").repartition(7), 4)
      .collect().map(_.toSeq).toSet
    many shouldBe one
  }

  it should "return whole groups smaller than k" in {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 5L)).toDF("g", "id", "v")
    heapTopK(df, 5).count() shouldBe 3
  }

  it should "ignore null ord or payload rows" in {
    val df = Seq[(String, java.lang.Long, java.lang.Long)](
      ("a", 1L, null), ("a", null, 9L), ("a", 2L, 3L))
      .toDF("g", "id", "v")
    val out = heapTopK(df, 5).collect()
    out.length shouldBe 1
    out.head.getLong(2) shouldBe 2L // id payload
  }

  it should "support string payloads (UTF8String copy across row reuse)" in {
    val df = Seq.tabulate(100)(i => ("g", f"name_$i%03d", (i % 10).toLong))
      .toDF("g", "name", "v")
    val out = df.groupBy("g")
      .agg(TopKExpressions.top_k_by(col("v"), col("name"), 3).as("t"))
      .select(explode(col("t.payload")).as("name"))
      .as[String].collect().toSeq
    // v=9 for i in 9,19,...,99; ties keep smallest payload strings
    out shouldBe Seq("name_009", "name_019", "name_029")
  }

  it should "shuffle only k structs per group (partial combine before exchange)" in {
    // the plan must show a partial top_k_by BELOW the exchange
    val df = Seq.tabulate(100)(i => ("g", i.toLong, i.toLong)).toDF("g", "id", "v")
    val plan = heapTopK(df, 3).queryExecution.executedPlan.toString
    val firstAgg = plan.indexOf("partial_top_k_by")
    val exchange = plan.indexOf("Exchange")
    withClue(plan) {
      firstAgg should be >= 0
      exchange should be >= 0
      // textual plan prints top-down: the Exchange node appears above the
      // partial aggregate that feeds it
      exchange should be < firstAgg
    }
  }
}
