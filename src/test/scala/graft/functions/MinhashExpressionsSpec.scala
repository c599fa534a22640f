package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TextDedup

class MinhashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "spark engines process distributed data frames quickly",
    "a b",      // short doc -> whole-text shingle
    "")         // empty text -> [""] shingle
    .toDF("text")
    .withColumn("sh", TextDedup.shingles(col("text"), 3))

  "MinhashSignature" should "produce values identical to the HOF composition" in {
    val rows = docs.select(
        TextDedup.minhashSignature(col("sh"), 64).as("native"),
        TextDedup.minhashSignatureHof(col("sh"), 64).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (native, hof) => native shouldBe hof }
    rows.head._1.length shouldBe 64
  }

  it should "agree between codegen and interpreted eval" in {
    val expr = MinhashExpressions.MinhashSignature(
      org.apache.spark.sql.graft.bridge.expression(col("sh")), 16)
    // interpreted: direct eval on literal data
    val shingle = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(org.apache.spark.unsafe.types.UTF8String.fromString("a b c")))
    val interpreted = MinhashExpressions
      .compute(shingle,
        MinhashExpressions.hashFamily(16).map(_._1).toArray,
        MinhashExpressions.hashFamily(16).map(_._2).toArray)
      .toLongArray()
    // codegen: the same value through a projected column
    val viaPlan = Seq(Seq("a b c")).toDF("sh")
      .select(MinhashExpressions.minhash_signature(col("sh"), 16))
      .as[Seq[Long]].collect().head
    viaPlan shouldBe interpreted.toSeq
  }

  it should "treat null elements as Spark's xxhash64(null) does" in {
    val withNull = Seq(1).toDF("i")
      .select(array(lit("x"), lit(null).cast("string")).as("sh"))
    val native = withNull.select(TextDedup.minhashSignature(col("sh"), 8))
      .as[Seq[Long]].collect().head
    val hof = withNull.select(TextDedup.minhashSignatureHof(col("sh"), 8))
      .as[Seq[Long]].collect().head
    native shouldBe hof
  }

  it should "yield MaxValue accumulators for an empty array" in {
    val out = Seq(1).toDF("i")
      .select(array().cast("array<string>").as("sh"))
      .select(TextDedup.minhashSignature(col("sh"), 4))
      .as[Seq[Long]].collect().head
    out shouldBe Seq.fill(4)(Long.MaxValue)
  }
}
