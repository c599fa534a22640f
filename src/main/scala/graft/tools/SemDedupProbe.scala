package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Ivf, SemDedup}

/** Measures the SemDeDup k-choice law: within-cluster pair volume is
  * Σ|cluster|² ≈ n²/k, so holding k fixed while the corpus grows 100×
  * grows the pair term 10,000× — k must scale with n (the paper keeps
  * n/k, the mean cluster size, constant). Usage:
  *
  *   sbt "runMain graft.tools.SemDedupProbe <sfDir> <k> [tau] [reps]"
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = args(1).toInt
    val tau = args.drop(2).headOption.map(_.toDouble).getOrElse(0.4)
    val reps = args.drop(3).headOption.map(_.toInt).getOrElse(3)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    // centroids = every (n/k)-th actual id (probe-only collect of the ids)
    val ids = e.select("vec_id").orderBy("vec_id")
      .collect().map(_.getLong(0))
    require(k <= ids.length, s"k=$k exceeds corpus size ${ids.length}")
    val model = Ivf.fixedModel(e, "vec_id", "embedding",
      (0 until k).map(i => ids(i * (ids.length / k))))

    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val kept = SemDedup.dedupManaged(e, "vec_id", "embedding", model, tau)
      val n = kept.use(_.count())
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[semdedup-probe] k=$k survivors=$n time=$dt%.2fs")
      dt
    }
    println(f"[semdedup-probe] k=$k floor=${times.min}%.2fs")

    // recall of the cluster blocking: fraction of ALL cosine>=tau pairs
    // whose members land in the same cluster (the SemDeDup recall trade)
    import graft.ops.Similarity
    val v = graft.ops.Partitioning.spread(e)
      .select(col("vec_id"), col("embedding").as("__v"))
      .withColumn("__c", Ivf.assignExpr(col("__v"), model))
      .persist()
    val a = v.select(col("vec_id").as("id_a"), col("__v").as("__va"),
      col("__c").as("__ca"))
    val b = v.select(col("vec_id").as("id_b"), col("__v").as("__vb"),
      col("__c").as("__cb"))
    val all = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("s", round(Similarity.cosine(col("__va"), col("__vb")), 6))
      .filter(col("s") >= tau)
      .select((col("__ca") === col("__cb")).as("same_cluster"))
      .groupBy().agg(count(lit(1)).as("pairs"),
        coalesce(sum(when(col("same_cluster"), 1L).otherwise(0L)), lit(0L))
          .as("same"))
      .head()
    v.unpersist(false)
    val (pairs, same) = (all.getLong(0), all.getLong(1))
    println(f"[semdedup-probe] k=$k dup_pairs=$pairs within_cluster=$same " +
      f"recall=${if (pairs == 0) 1.0 else same.toDouble / pairs}%.3f")
    spark.stop()
  }
}
