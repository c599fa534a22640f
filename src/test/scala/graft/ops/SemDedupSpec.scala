package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Two tight semantic groups around orthogonal directions plus an
  // outlier: centroids at ids 0 and 3 split them cleanly.
  private val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // group A representative
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // exact dup of 0
    (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),   // near-dup of 0
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // group B representative
    (4L, Seq(0.0f, 0.95f, 0.05f, 0.0f)), // near-dup of 3
    (5L, Seq(0.0f, 0.0f, 1.0f, 0.0f)))   // lone vector (assigned to B side)
    .toDF("vec_id", "embedding")

  private def model = Ivf.fixedModel(vecs, "vec_id", "embedding", Seq(0L, 3L))

  "SemDedup.dedup" should "keep the min-id survivor per within-cluster dup set" in {
    val kept = SemDedup.dedup(vecs, "vec_id", "embedding", model, tau = 0.9)
      .orderBy("vec_id").as[(Long, Int)].collect()
    // 1 and 2 fold into 0; 4 folds into 3; 5 is alone in its cluster.
    kept.map(_._1) shouldBe Array(0L, 3L, 5L)
    kept.toMap shouldBe Map(0L -> 0, 3L -> 1, 5L -> 1)
  }

  it should "not compare across clusters" in {
    // 0 and 3 are orthogonal; with tau = -1 every within-cluster pair is a
    // "dup", so survivors are exactly one min-id per cluster — proving no
    // cross-cluster pair was ever considered.
    val kept = SemDedup.dedup(vecs, "vec_id", "embedding", model, tau = -1.0)
      .orderBy("vec_id").as[(Long, Int)].collect()
    kept.map(_._1) shouldBe Array(0L, 3L)
  }

  "SemDedup.dedupIncrement" should "equal the full run when stored ids precede batch ids" in {
    val m = model
    val stored = vecs.filter(col("vec_id") < 3)
    val batch = vecs.filter(col("vec_id") >= 3)
    // stored corpus deduped + assigned once, as a store would hold it
    val storedKept = SemDedup.dedup(stored, "vec_id", "embedding", m, tau = 0.9)
    val storedAssigned = stored
      .join(storedKept.select("vec_id"), "vec_id")
      .withColumn("cluster", Ivf.assignExpr(col("embedding"), m))
    val increment = SemDedup.dedupIncrement(batch, storedAssigned,
        "vec_id", "embedding", m, tau = 0.9)
      .use(_.orderBy("vec_id").as[(Long, Int)].collect())
    val full = SemDedup.dedup(vecs, "vec_id", "embedding", m, tau = 0.9)
      .orderBy("vec_id").as[(Long, Int)].collect()
    val storedPart = storedKept.orderBy("vec_id").as[(Long, Int)].collect()
    (storedPart ++ increment).sortBy(_._1) shouldBe full
  }

  it should "drop a batch row that matches only a stored neighbor" in {
    val m = model
    // batch = the near-dup of stored 0 and the lone vector
    val stored = vecs.filter(col("vec_id") === 0L)
      .withColumn("cluster", Ivf.assignExpr(col("embedding"), m))
    val batch = vecs.filter(col("vec_id") === 2L || col("vec_id") === 5L)
    val kept = SemDedup.dedupIncrement(batch, stored,
        "vec_id", "embedding", m, tau = 0.9)
      .use(_.orderBy("vec_id").as[(Long, Int)].collect())
    kept.map(_._1) shouldBe Array(5L) // 2 folds into stored 0; 5 survives
  }

  "SemDedup.dedup with the hot-cluster cap" should "preserve the survivor set on an identical-vector pile" in {
    import org.apache.spark.sql.functions.col
    // a pile of 40 identical vectors + the base fixture, forced cap of 8
    val pile = (100L until 140L).map(i => (i, Seq(1.0f, 0.0f, 0.0f, 0.0f)))
    val corpus = vecs.unionByName(pile.toDF("vec_id", "embedding"))
    val m = model
    val uncapped = SemDedup.dedup(corpus, "vec_id", "embedding", m,
        tau = 0.9, maxCluster = 0)
      .orderBy("vec_id").as[(Long, Int)].collect()
    val capped = SemDedup.dedup(corpus, "vec_id", "embedding", m,
        tau = 0.9, maxCluster = 8)
      .orderBy("vec_id").as[(Long, Int)].collect()
    capped shouldBe uncapped
    capped.map(_._1) shouldBe Array(0L, 3L, 5L) // pile folds into 0
  }

  "SemDedup.clusterSizes" should "count members per cluster" in {
    val sizes = SemDedup.clusterSizes(vecs, "vec_id", "embedding", model)
      .orderBy("cluster").as[(Int, Long)].collect()
    sizes shouldBe Array(0 -> 3L, 1 -> 3L)
  }

  it should "agree with a per-row argmax over the centroid scores" in {
    val m = model
    val assigned = vecs
      .withColumn("cluster", Ivf.assignExpr(col("embedding"), m))
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val viaSizes = SemDedup.clusterSizes(vecs, "vec_id", "embedding", m)
      .as[(Int, Long)].collect().toMap
    assigned.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong } shouldBe viaSizes
  }
}
