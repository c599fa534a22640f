package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TextDedup

/** Parity of the native simhash_bits kernel with the nested-HOF reference
  * form, under both hash families and on edge shapes.
  */
class SimhashExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, ""),                                  // empty -> tokens [""]
    (3, "one"),
    (4, "repeated repeated repeated tokens"), // multiset voting
    (5, "Ünïcode tökens ärë fün"))
    .toDF("id", "text")
    .select(col("id"), TextDedup.tokens(col("text")).as("toks"))

  private def parity(bits: Int, hash: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
    val native = docs.select(col("id"),
      TextDedup.simhashBits(col("toks"), hash, bits).as("fp"))
      .orderBy("id").as[(Int, Long)].collect()
    val hof = docs.select(col("id"),
      TextDedup.simhashBitsHof(col("toks"), hash, bits).as("fp"))
      .orderBy("id").as[(Int, Long)].collect()
    native shouldBe hof
  }

  "simhash_bits" should "match the HOF reference under xxhash64 at 64 bits" in {
    parity(64, xxhash64(_))
  }

  it should "match the HOF reference under the portable md5 family at 60 bits" in {
    parity(60, TextDedup.md5Hash60)
  }

  it should "treat a null hash as voting -1 on every bit (HOF fallthrough)" in {
    val withNull = Seq(Seq[java.lang.Long](5L, null)).toDF("h")
    val native = withNull.select(
      SimhashExpression.simhash_bits(col("h"), 8)).as[Long].head()
    // 5 = 0b101 votes +1 on bits 0 and 2; null votes -1 everywhere -> ties
    // go to 0 (votes > 0 strictly), so fingerprint is 0
    native shouldBe 0L
  }

  it should "yield 0 for an empty hash array and null for a null array" in {
    val df = Seq((1, Some(Seq.empty[Long])), (2, None))
      .toDF("id", "h")
    val out = df.select(col("id"),
      SimhashExpression.simhash_bits(col("h"), 16).as("fp"))
      .orderBy("id").collect()
    out(0).getLong(1) shouldBe 0L
    out(1).isNullAt(1) shouldBe true
  }
}
