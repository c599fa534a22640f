package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.SketchExpressions.MisraGries
import graft.ops.Sketches

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def hh(df: org.apache.spark.sql.DataFrame, capacity: Int) =
    df.agg(SketchExpressions.misra_gries(col("token"), capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.cnt"))
      .as[(String, Long)].collect()

  "misra_gries" should "be exact when capacity covers all distinct items" in {
    val tokens = (1 to 10).flatMap(i => Seq.fill(i)(s"t$i")) // t_i appears i times
    val df = tokens.toDF("token").repartition(7)
    val got = hh(df, capacity = 16).toMap
    got shouldBe (1 to 10).map(i => s"t$i" -> i.toLong).toMap
  }

  it should "sort the summary by count desc then token asc" in {
    val df = Seq("b", "b", "a", "a", "c").toDF("token")
    hh(df, capacity = 8).toSeq shouldBe Seq("a" -> 2L, "b" -> 2L, "c" -> 1L)
  }

  it should "ignore nulls" in {
    val df = Seq(Some("x"), None, Some("x"), None).toDF("token")
    hh(df, capacity = 4).toSeq shouldBe Seq("x" -> 2L)
  }

  it should "guarantee presence and the lower-bound error under capacity pressure" in {
    // 600 of "hot", 1 each of 200 rare tokens: n = 800, capacity k = 2 →
    // anything with freq > n/(k+1) = 266.7 MUST be present with count
    // short by at most 266.
    val tokens = Seq.fill(600)("hot") ++ (1 to 200).map(i => s"rare$i")
    val rng = new scala.util.Random(7)
    val df = rng.shuffle(tokens).toDF("token").repartition(5)
    val got = hh(df, capacity = 2).toMap
    got.keySet should contain("hot")
    val c = got("hot")
    c should be <= 600L            // lower bound never exceeds truth
    c should be >= (600L - 800L / 3) // deficiency ≤ n/(k+1)
  }

  it should "round-trip its buffer through serialize/deserialize" in {
    val agg = MisraGries(
      org.apache.spark.sql.graft.bridge.expression(lit("x")), capacity = 4)
    val buf = agg.createAggregationBuffer()
    buf("alpha") = 3L; buf("βeta") = 7L
    agg.deserialize(agg.serialize(buf)) shouldBe buf
  }

  it should "produce identical output regardless of partitioning in the exact regime" in {
    val tokens = (1 to 20).flatMap(i => Seq.fill(i % 5 + 1)(s"w$i"))
    val one = hh(tokens.toDF("token").repartition(1), capacity = 32).toSeq
    val many = hh(tokens.toDF("token").repartition(13), capacity = 32).toSeq
    many shouldBe one
  }

  "Sketches.tokenHeavyHitters" should "match a groupBy count over the same tokenization" in {
    val docs = Seq(
      (1L, "The quick brown fox"),
      (2L, "the QUICK  quick fox"),
      (3L, "lazy dog")).toDF("doc_id", "text")
    val got = Sketches.tokenHeavyHitters(docs, "text", capacity = 32, topN = 3)
      .as[(String, Long)].collect().toSeq
    got shouldBe Seq("quick" -> 3L, "fox" -> 2L, "the" -> 2L)
  }
}
