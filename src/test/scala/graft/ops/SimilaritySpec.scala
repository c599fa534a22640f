package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // identical to 0
    (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),   // close to 0
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal
    (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f)),  // opposite
    (5L, Seq(0.0f, 0.0f, 0.0f, 0.0f)))   // zero vector
    .toDF("vec_id", "embedding")

  "cosine" should "compute cosine similarity with zero-norm guard" in {
    def cos(a: Long, b: Long): Double = {
      val va = vecs.filter($"vec_id" === a).select(Similarity.toDouble($"embedding")).as[Seq[Double]].head()
      val vb = vecs.filter($"vec_id" === b).select(Similarity.toDouble($"embedding")).as[Seq[Double]].head()
      Seq((va, vb)).toDF("x", "y").select(Similarity.cosine($"x", $"y")).as[Double].head()
    }
    cos(0, 1) shouldBe 1.0 +- 1e-9
    cos(0, 3) shouldBe 0.0 +- 1e-9
    cos(0, 4) shouldBe -1.0 +- 1e-9
    cos(0, 5) shouldBe 0.0 +- 1e-9 // zero-norm guard
  }

  "bruteForceTopK" should "rank exact nearest neighbors with id tie-break" in {
    val top = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", k = 3)
      .orderBy("rank").select("cand_id").as[Long].collect()
    top shouldBe Array(1L, 2L, 3L) // 1.0, ~0.994, 0.0
  }

  "hardNegatives" should "rank nearest other-label candidates only" in {
    val labeled = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),  // same label: excluded
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f), 1),  // hardest negative
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val negs = Similarity.hardNegatives(
        labeled.filter($"vec_id" === 0), labeled,
        "vec_id", "embedding", "label", k = 3)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    negs shouldBe Array((2L, 1), (3L, 1), (4L, 2)) // 1 never appears
  }

  "annTopK" should "return the identical vector first for its own bucket" in {
    val top = Similarity.annTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding",
      k = 3, nbits = 4, dim = 4)
      .orderBy("rank").select("cand_id").as[Long].collect()
    top.headOption shouldBe Some(1L) // identical vector always shares the bucket
  }

  "cosineNearDups" should "find high-cosine pairs" in {
    val pairs = Similarity.cosineNearDups(vecs, "vec_id", "embedding",
        threshold = 0.9, nbits = 4, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs should contain(0L -> 1L)
  }

  "hyperplanes" should "be deterministic for a fixed seed" in {
    val a = Similarity.hyperplanes(4, 8, seed = 7L).map(_.toSeq)
    val b = Similarity.hyperplanes(4, 8, seed = 7L).map(_.toSeq)
    a shouldBe b
  }

  "md5Hyperplanes" should "reproduce the SQL-side md5 derivation exactly" in {
    val planes = Similarity.md5Hyperplanes(2, 3)
    // md5('plane_0_0') = d03501f9... -> 0xd03501f9 = 3493134841
    planes(0)(0) shouldBe (3493134841d / 4294967295d * 2 - 1)
    all(planes.flatten) should (be >= -1.0 and be <= 1.0)
  }

  "l2normalize" should "produce unit vectors and pass zero vectors through" in {
    val out = Seq(Seq(3.0f, 4.0f), Seq(0.0f, 0.0f)).toDF("v")
      .select(Similarity.l2normalize($"v").as("n"))
      .as[Seq[Double]].collect()
    out(0) shouldBe Seq(0.6, 0.8)
    out(1) shouldBe Seq(0.0, 0.0)
    // cosine over unit vectors == dot product
    val d = Seq((Seq(3.0f, 4.0f), Seq(4.0f, 3.0f))).toDF("a", "b")
      .select(
        Similarity.cosine($"a", $"b").as("cos"),
        Similarity.dot(Similarity.l2normalize($"a"), Similarity.l2normalize($"b")).as("dotu"))
      .as[(Double, Double)].collect().head
    d._1 shouldBe d._2 +- 1e-12
  }

  "quantizeInt8" should "bound values to [-127,127] and keep zero vectors" in {
    val out = Seq(Seq(0.5f, -1.0f, 0.25f), Seq(0.0f, 0.0f, 0.0f)).toDF("v")
      .select(Similarity.quantizeInt8($"v").as("q"))
      .as[Seq[Int]].collect()
    out(0) shouldBe Seq(64, -127, 32) // round(.5*127)=64 (HALF_UP), -127, 31.75->32
    out(1) shouldBe Seq(0, 0, 0)
  }

  it should "score with the native cosine and approximate the float ranking" in {
    val q = vecs.select($"vec_id", Similarity.quantizeInt8($"embedding").as("q"))
    val int8Top = Similarity.bruteForceTopK(q.filter($"vec_id" === 0), q,
        "vec_id", "q", k = 3)
      .orderBy("rank").select("cand_id").as[Long].collect()
    val floatTop = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs,
        "vec_id", "embedding", k = 3)
      .orderBy("rank").select("cand_id").as[Long].collect()
    // top-1 must survive 8-bit quantization on this well-separated fixture
    int8Top.head shouldBe floatTop.head
    int8Top.toSet shouldBe floatTop.toSet
  }
}
