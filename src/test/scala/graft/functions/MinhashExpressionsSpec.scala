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

  "MinhashSignature2" should "carry the signature bit-identically in its first half" in {
    val rows = docs.select(
        TextDedup.minhashSignature2(col("sh"), 64).as("two"),
        TextDedup.minhashSignature(col("sh"), 64).as("one"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (two, one) =>
      two.length shouldBe 128
      two.take(64) shouldBe one
    }
  }

  it should "track each hash function's second-smallest DISTINCT value" in {
    // brute force per hash function over the shingle set: sort the
    // distinct transformed values, take the second (MaxValue when absent)
    val fam = MinhashExpressions.hashFamily(8)
    val p = MinhashExpressions.MersenneP
    val shingleSets = docs.select(col("sh")).as[Seq[String]].collect()
    val expected = shingleSets.map { sh =>
      val hs = sh.map { s =>
        val raw =
          if (s == null) MinhashExpressions.XxSeed
          else {
            val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
            org.apache.spark.sql.catalyst.expressions.XXH64
              .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes,
                MinhashExpressions.XxSeed)
          }
        ((raw % p) + p) % p
      }
      fam.map { case (a, b) =>
        val vs = hs.map(h => (h * a + b) % p).distinct.sorted
        (vs.headOption.getOrElse(Long.MaxValue),
          vs.drop(1).headOption.getOrElse(Long.MaxValue))
      }
    }
    val got = docs.select(TextDedup.minhashSignature2(col("sh"), 8))
      .as[Seq[Long]].collect()
    expected.zip(got).foreach { case (exp, sig2) =>
      sig2.take(8) shouldBe exp.map(_._1)
      sig2.drop(8) shouldBe exp.map(_._2)
    }
  }

  "probeBucketMatrix" should "lead each band with the exact bucketArray bucket" in {
    val withSigs = docs
      .withColumn("sig", TextDedup.minhashSignature(col("sh"), 64))
      .withColumn("sig2", TextDedup.minhashSignature2(col("sh"), 64))
    val rows = withSigs.select(
        TextDedup.bucketArray(col("sig"), 16, 4).as("plain"),
        TextDedup.probeBucketMatrix(col("sig2"), 16, 4).as("mp"))
      .as[(Seq[Long], Seq[Seq[Long]])].collect()
    rows.foreach { case (plain, mp) =>
      mp.length shouldBe 16
      mp.foreach(_.length shouldBe 5)
      mp.map(_.head) shouldBe plain
    }
  }
}
