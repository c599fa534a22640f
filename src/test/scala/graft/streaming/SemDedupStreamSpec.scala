package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.SparkSpec
import graft.ops.{Ivf, SemDedup}

/** [[SemDedupStream]] — cross-batch semantic admission: a batch vector
  * folds into stored OR earlier-batch near-dups, and the final admitted
  * set equals the batch [[SemDedup.dedup]] over the full id-ordered
  * corpus.
  */
class SemDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  // base directions: two orthogonal groups (centroids at 0 and 3)
  private val seed = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")
  private def model = Ivf.fixedModel(seed, "vec_id", "embedding", Seq(0L, 3L))

  private val all = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // stored
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // stored
    (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),  // batch 1: dup of stored 0
    (11L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),  // batch 1: novel
    (20L, Seq(0.0f, 0.0f, 0.99f, 0.1f)), // batch 2: dup of 11 (cross-batch)
    (21L, Seq(0.0f, 0.97f, 0.0f, 0.2f))) // batch 2: dup of stored 3

  "streamDedup" should "admit only semantically novel vectors across batches" in {
    implicit val sqlCtx = spark.sqlContext
    val m = model
    val stored = SemDedupStream.VecState(
      seed.withColumn("cluster", Ivf.assignExpr(col("embedding"), m))
        .localCheckpoint())
    val input = MemoryStream[(Long, Seq[Float])]
    val admittedIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val handle = SemDedupStream.streamDedup(
      input.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding",
      m, tau = 0.9, initial = Some(stored),
      onBatch = (_, adm) =>
        admittedIds ++= adm.select("vec_id").as[Long].collect())
    try {
      input.addData(all.filter(t => t._1 >= 10 && t._1 < 20): _*)
      handle.query.processAllAvailable()
      admittedIds.sorted.toSeq shouldBe Seq(11L) // 10 folds into stored 0

      input.addData(all.filter(_._1 >= 20): _*)
      handle.query.processAllAvailable()
      admittedIds.sorted.toSeq shouldBe Seq(11L) // 20 folds into 11; 21 into 3

      // state holds stored + admitted, all assigned
      handle.state.storedAssigned.select("vec_id").as[Long]
        .collect().sorted shouldBe Array(0L, 3L, 11L)

      // parity: stored ∪ admitted == batch dedup over the full corpus
      val full = SemDedup.dedup(all.toDF("vec_id", "embedding"),
          "vec_id", "embedding", m, tau = 0.9)
        .select("vec_id").as[Long].collect().sorted
      full shouldBe Array(0L, 3L, 11L)
    } finally handle.query.stop()
  }
}
