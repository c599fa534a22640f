package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TextStats

class CompressRatioSpec extends SparkSpec {
  import spark.implicits._

  private def ratio(s: String): Double =
    Seq(s).toDF("t").select(TextStats.compressionRatio($"t"))
      .as[Double].head()

  "compress_ratio" should "compress repetitive text far harder than varied text" in {
    val repetitive = "the same paragraph over and over. " * 50
    val varied = (1 to 300)
      .map(i => s"w${i * 7919 % 1000}x${i * 104729 % 997}").mkString(" ")
    ratio(repetitive) should be < 0.1
    ratio(varied) should be > (ratio(repetitive) * 3)
  }

  it should "approach 1 on incompressible input and handle edge cases" in {
    val rng = new scala.util.Random(11)
    val noise = Array.fill(4096)(rng.nextPrintableChar()).mkString
    ratio(noise) should be > 0.5
    ratio("") shouldBe 1.0
    Seq(Option.empty[String]).toDF("t")
      .select(TextStats.compressionRatio($"t"))
      .collect().head.isNullAt(0) shouldBe true
  }

  it should "be deterministic across partitions and repeated evaluation" in {
    val docs = (1 to 100)
      .map(i => (i.toLong, s"doc $i " + ("lorem ipsum " * (i % 10 + 1))))
    val a = docs.toDF("id", "t").repartition(7)
      .select($"id", TextStats.compressionRatio($"t").as("r"))
      .orderBy("id").as[(Long, Double)].collect()
    val b = docs.toDF("id", "t").repartition(2)
      .select($"id", TextStats.compressionRatio($"t").as("r"))
      .orderBy("id").as[(Long, Double)].collect()
    b shouldBe a
  }

  it should "match its interpreted form under codegen" in {
    // eval() path (Literal fold) vs the generated projection
    val viaEval = CompressExpression.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc abc abc abc"))
    ratio("abc abc abc abc") shouldBe viaEval
  }
}
