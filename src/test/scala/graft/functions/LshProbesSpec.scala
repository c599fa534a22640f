package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Similarity

/** [[VectorExpressions.LshProbes]] + [[Similarity.annTopKMultiProbe]]:
  * probe-0 == lsh_sign, margin-ranked flip order, recall dominance over
  * single-probe at fixed planes.
  */
class LshProbesSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  "lsh_probes" should "emit the exact signature as probe 0 on the real table" in {
    val planes = Similarity.md5Hyperplanes(nbits = 6, dim = 64)
    val both = vecs.select(col("vec_id"),
        Similarity.lshSignature(col("embedding"), planes).as("sig"),
        VectorExpressions.lsh_probes(col("embedding"), planes, 4).as("probes"))
      .collect()
    both.foreach { r =>
      r.getSeq[Long](2).head shouldBe r.getLong(1)
      r.getSeq[Long](2).size shouldBe 4
      r.getSeq[Long](2).distinct.size shouldBe 4 // distinct buckets
    }
  }

  it should "flip the smallest-|margin| planes first (hand fixture)" in {
    // dims=1 planes with known dots: margins |3|, |-1|, |0.5|
    val planes = Seq(Array(3.0), Array(-1.0), Array(0.5))
    val df = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
    val probes = df.select(
        VectorExpressions.lsh_probes(col("embedding"), planes, 4).as("p"))
      .head().getSeq[Long](0)
    // dots = (3, -1, 0.5) -> sig = bit0 | bit2 = 5
    // margin order: plane 2 (0.5), plane 1 (1), plane 0 (3)
    probes shouldBe Seq(5L, 5L ^ 4L, 5L ^ 2L, 5L ^ 1L)
  }

  it should "break margin ties by plane index ascending" in {
    val planes = Seq(Array(2.0), Array(-2.0), Array(2.0))
    val df = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
    val probes = df.select(
        VectorExpressions.lsh_probes(col("embedding"), planes, 3).as("p"))
      .head().getSeq[Long](0)
    // all margins 2.0 -> flip plane 0 then plane 1; sig = bit0|bit2 = 5
    probes shouldBe Seq(5L, 5L ^ 1L, 5L ^ 2L)
  }

  "annTopKMultiProbe" should "equal annTopK at nprobe=1 and dominate its recall above" in {
    val e = vecs
    val q = e.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val single = pairs(Similarity.annTopK(q, e, "vec_id", "embedding",
      k = 5, nbits = 6, dim = 64, planesFor = Similarity.md5Hyperplanes))
    val mp1 = pairs(Similarity.annTopKMultiProbe(q, e, "vec_id", "embedding",
      k = 5, nbits = 6, dim = 64, nprobe = 1,
      planesFor = Similarity.md5Hyperplanes))
    mp1 shouldBe single
    val truth = pairs(Similarity.bruteForceTopK(q, e, "vec_id", "embedding",
      k = 5))
    val mp3 = pairs(Similarity.annTopKMultiProbe(q, e, "vec_id", "embedding",
      k = 5, nbits = 6, dim = 64, nprobe = 3,
      planesFor = Similarity.md5Hyperplanes))
    val rSingle = single.intersect(truth).size
    val rMp3 = mp3.intersect(truth).size
    withClue(s"recall single=$rSingle mp3=$rMp3 of ${truth.size}: ") {
      rMp3 should be >= rSingle
      rMp3 should be > 0
    }
  }
}
