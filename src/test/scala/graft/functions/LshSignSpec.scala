package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Similarity

/** Parity of the native lsh_sign expression with the unrolled
  * when(vec_dot > 0) OR-reduce, under both hyperplane families and on the
  * real embeddings table.
  */
class LshSignSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def parity(planes: Seq[Array[Double]]): Unit = {
    val native = vecs.select(col("vec_id"),
      Similarity.lshSignature(col("embedding"), planes).as("b"))
      .orderBy("vec_id").as[(Long, Long)].collect()
    val unrolled = vecs.select(col("vec_id"),
      Similarity.lshSignatureUnrolled(col("embedding"), planes).as("b"))
      .orderBy("vec_id").as[(Long, Long)].collect()
    native shouldBe unrolled
  }

  "lsh_sign" should "match the unrolled form under gaussian hyperplanes" in {
    parity(Similarity.hyperplanes(nbits = 8, dim = 64))
  }

  it should "match the unrolled form under the portable md5 hyperplanes" in {
    parity(Similarity.md5Hyperplanes(nbits = 8, dim = 64))
  }

  it should "stay constant-size at wide signatures and match at nbits=48" in {
    parity(Similarity.hyperplanes(nbits = 48, dim = 64))
  }

  it should "map a null vector to bucket 0 like the unrolled fallthrough" in {
    val df = Seq((1L, Some(Seq(1.0f, -2.0f))), (2L, None))
      .toDF("vec_id", "embedding")
    val planes = Seq(Array(1.0, 1.0), Array(-1.0, 0.5))
    val native = df.select(col("vec_id"),
      Similarity.lshSignature(col("embedding"), planes).as("b"))
      .orderBy("vec_id").as[(Long, Long)].collect()
    val unrolled = df.select(col("vec_id"),
      Similarity.lshSignatureUnrolled(col("embedding"), planes).as("b"))
      .orderBy("vec_id").as[(Long, Long)].collect()
    native shouldBe unrolled
    native.find(_._1 == 2L).get._2 shouldBe 0L
  }
}
