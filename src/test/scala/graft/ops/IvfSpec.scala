package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around orthogonal axes + ids interleaved
  private val vecs = Seq(
    (0L, Seq(1.0f, 0.02f, 0.0f, 0.0f)),
    (1L, Seq(0.0f, 0.01f, 1.0f, 0.0f)),
    (2L, Seq(0.99f, 0.0f, 0.03f, 0.0f)),
    (3L, Seq(0.01f, 0.0f, 0.98f, 0.0f)),
    (4L, Seq(1.0f, 0.01f, 0.01f, 0.0f)),
    (5L, Seq(0.0f, 0.02f, 1.0f, 0.01f))).toDF("vec_id", "embedding")

  private lazy val model = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 3)

  "train" should "produce k unit centroids deterministically" in {
    model.k shouldBe 2
    model.centroids.foreach { c =>
      math.sqrt(c.map(x => x * x).sum) shouldBe 1.0 +- 1e-9
    }
    val again = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 3)
    again.centroids.map(_.toSeq) shouldBe model.centroids.map(_.toSeq)
  }

  "assign" should "put same-cluster vectors together" in {
    val assigned = Ivf.assign(vecs, "embedding", model)
      .select("vec_id", "ivf_cluster").as[(Long, Int)].collect().toMap
    assigned(0L) shouldBe assigned(2L)
    assigned(0L) shouldBe assigned(4L)
    assigned(1L) shouldBe assigned(3L)
    assigned(0L) should not be assigned(1L)
  }

  "annTopK" should "find the true nearest neighbor within the probed cluster" in {
    val top = Ivf.annTopK(vecs.filter($"vec_id" === 0), vecs,
        "vec_id", "embedding", model, k = 2, nprobe = 1)
      .orderBy("rank").select("cand_id").as[Long].collect()
    top.head shouldBe 4L // closest to vec 0
    top should contain(2L)
  }

  it should "support cluster-partitioned storage with partition-pruned probes" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_parts").toString
    // the scale path: persist the corpus partitioned by coarse cluster...
    graft.io.Sinks.parquet(Ivf.assign(vecs, "embedding", model),
      s"$dir/vectors", partitionBy = Seq("ivf_cluster"))
    // ...so a probe of one cluster reads only that partition
    val probed = spark.read.parquet(s"$dir/vectors")
      .filter($"ivf_cluster" === 0)
    probed.count() should be > 0L
    val plan = probed.queryExecution.executedPlan.toString
    plan should include("PartitionFilters: [isnotnull(ivf_cluster")
    new java.io.File(s"$dir/vectors").listFiles()
      .count(_.getName.startsWith("ivf_cluster=")) shouldBe 2
  }

  it should "match brute force when probing all clusters" in {
    val brute = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs,
        "vec_id", "embedding", k = 3)
      .orderBy("rank").select("cand_id").as[Long].collect()
    val ivf = Ivf.annTopK(vecs.filter($"vec_id" === 0), vecs,
        "vec_id", "embedding", model, k = 3, nprobe = 2)
      .orderBy("rank").select("cand_id").as[Long].collect()
    ivf shouldBe brute
  }

  "trainPortable" should "be deterministic and recover the same clusters as train" in {
    val pm = Ivf.trainPortable(vecs, "vec_id", "embedding", k = 2, iters = 3)
    val again = Ivf.trainPortable(vecs, "vec_id", "embedding", k = 2, iters = 3)
    again.centroids.map(_.toSeq) shouldBe pm.centroids.map(_.toSeq)
    val assigned = Ivf.assign(vecs, "embedding", pm)
      .select("vec_id", "ivf_cluster").as[(Long, Int)].collect().toMap
    assigned(0L) shouldBe assigned(2L)
    assigned(0L) shouldBe assigned(4L)
    assigned(1L) shouldBe assigned(3L)
    assigned(0L) should not be assigned(1L)
  }

  it should "match brute force when probing all clusters" in {
    val pm = Ivf.trainPortable(vecs, "vec_id", "embedding", k = 2, iters = 3)
    val brute = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs,
        "vec_id", "embedding", k = 3)
      .orderBy("rank").select("cand_id").as[Long].collect()
    val ivf = Ivf.annTopK(vecs.filter($"vec_id" === 0), vecs,
        "vec_id", "embedding", pm, k = 3, nprobe = 2)
      .orderBy("rank").select("cand_id").as[Long].collect()
    ivf shouldBe brute
  }

  "fixedModel" should "take the given rows as centroids, unnormalized" in {
    val fixed = Ivf.fixedModel(vecs, "vec_id", "embedding", Seq(0L, 1L))
    fixed.k shouldBe 2
    fixed.centroids(0).take(2).toSeq shouldBe Seq(1.0, 0.02f.toDouble)
    fixed.centroids(1)(2) shouldBe 1.0
    an[IllegalArgumentException] should be thrownBy
      Ivf.fixedModel(vecs, "vec_id", "embedding", Seq(0L, 99L))
  }

  it should "match brute force when probing all its clusters" in {
    val fixed = Ivf.fixedModel(vecs, "vec_id", "embedding", Seq(0L, 1L))
    val brute = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 2), vecs,
        "vec_id", "embedding", k = 3)
      .orderBy("rank").select("cand_id").as[Long].collect()
    val ivf = Ivf.annTopK(vecs.filter($"vec_id" === 2), vecs,
        "vec_id", "embedding", fixed, k = 3, nprobe = 2)
      .orderBy("rank").select("cand_id").as[Long].collect()
    ivf shouldBe brute
  }
}
