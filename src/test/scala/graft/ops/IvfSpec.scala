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

  it should "assign null vectors to the -1 sentinel, never a real cluster" in {
    // regression: a null vector nulls only the scored structs' score FIELD,
    // so the argmax still produced a real cluster id (observed: k-1) and a
    // bare coalesce never fired — the sentinel needs an explicit vec guard
    val df = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS embedding " +
      "UNION ALL SELECT array(1.0D, 0.0D, 0.0D, 0.0D)")
    val out = df.select(Ivf.assignExpr(col("embedding"), model).as("c"))
      .as[Int].collect().sorted
    out.head shouldBe -1
    out.last should be >= 0
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

  "scoredCentroidsNative" should "match the unrolled form value-for-value" in {
    val unrolled = vecs.select(
      Ivf.scoredCentroidsUnrolled(col("embedding"), model).as("s")).collect()
    val native = vecs.select(
      Ivf.scoredCentroidsNative(col("embedding"), model).as("s")).collect()
    native.map(_.toString) shouldBe unrolled.map(_.toString)
  }

  it should "assign correctly at k=256 where unrolled codegen would blow up" in {
    val dim = 4
    // 300 deterministic pseudo-random vectors (seeded — no wall clock)
    val rng = new scala.util.Random(7)
    val data = (0 until 300).map(i =>
      (i.toLong, Seq.fill(dim)(rng.nextGaussian().toFloat)))
    val df = data.toDF("vec_id", "embedding")
    val big = Ivf.fixedModel(df, "vec_id", "embedding", 0L until 256L)
    big.k shouldBe 256
    val assigned = Ivf.assign(df, "embedding", big)
      .select("vec_id", "ivf_cluster").as[(Long, Int)].collect().toMap
    // driver-side expected argmax cosine, ties to the higher cluster id
    def cos(a: Seq[Float], c: Array[Double]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      for (j <- 0 until dim) {
        val x = a(j).toDouble; val y = c(j)
        ab += x * y; aa += x * x; bb += y * y
      }
      val d = math.sqrt(aa) * math.sqrt(bb)
      if (d == 0.0) 0.0 else ab / d
    }
    data.foreach { case (id, v) =>
      val expected = big.centroids.zipWithIndex
        .map { case (c, i) => (cos(v, c), i) }.max
      assigned(id) shouldBe expected._2
    }
    // and the probe path executes at large k too
    Ivf.annTopK(df.filter($"vec_id" === 0), df, "vec_id", "embedding",
      big, k = 3, nprobe = 4).count() shouldBe 3
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

  "saveModel/loadModel" should "round-trip centroids bit-exactly and preserve assignment" in {
    val model = Ivf.fixedModel(vecs, "vec_id", "embedding", Seq(0L, 1L))
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_model").toString + "/m"
    Ivf.saveModel(spark, model, path)
    val back = Ivf.loadModel(spark, path)
    back.k shouldBe model.k
    back.centroids.zip(model.centroids).foreach { case (a, b) =>
      a.toSeq shouldBe b.toSeq
    }
    val before = Ivf.assign(vecs, "embedding", model)
      .select("vec_id", "ivf_cluster").as[(Long, Int)].collect().sorted
    val after = Ivf.assign(vecs, "embedding", back)
      .select("vec_id", "ivf_cluster").as[(Long, Int)].collect().sorted
    after shouldBe before
  }

  it should "reject an empty model table" in {
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_model_empty").toString + "/m"
    import spark.implicits._
    Seq.empty[(Int, Seq[Double])].toDF("cid", "centroid")
      .write.parquet(path)
    an[IllegalArgumentException] should be thrownBy Ivf.loadModel(spark, path)
  }
}
