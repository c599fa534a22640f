package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Ivf, Partitioning, SemDedup, Similarity}

/** SemDeDup recall in its OWN regime, at probe scale: a topic-structured
  * corpus with PLANTED near-identical duplicates (cosine ≈ 0.998), the
  * operating point of Abbas et al. 2023 — complementing the round-10
  * `SemDedupProbe` recall pass, which measured the OTHER regime
  * (direction-uniform corpus, moderate tau) and found recall falls with
  * k there. This probe answers: over clustered data at high tau, what
  * fraction of true dup pairs does cluster blocking see, and does the
  * blocked survivor set equal the brute-force one?
  *
  * Corpus: `topics` Gaussian anchor directions; each base = its topic's
  * anchor + 0.08/component noise (~24° intra-topic spread); `dupFrac` of
  * bases get a planted copy at +0.01/component noise. Brute-force truth
  * = all-pairs cosine ≥ tau (n² bounded by probe scale).
  *
  *   sbt "runMain graft.tools.PlantedRecallProbe [n] [topics] [dupFrac] [tau]"
  */
object PlantedRecallProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    val topics = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val dupFrac = args.drop(2).headOption.map(_.toDouble).getOrElse(0.1)
    val tau = args.drop(3).headOption.map(_.toDouble).getOrElse(0.95)
    val d = 32
    val nDup = (n * dupFrac).toInt
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(42)
    def gaussian(): Array[Double] = Array.fill(d)(rnd.nextGaussian())
    def normalize(v: Array[Double]): Array[Double] = {
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / norm)
    }
    val anchors = IndexedSeq.fill(topics)(normalize(gaussian()))
    val bases = (0 until n).map { i =>
      val noise = gaussian().map(_ * 0.08)
      normalize(anchors(i % topics).zip(noise).map { case (a, b) => a + b })
    }
    val rows = bases.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(_.toFloat).toSeq)
    } ++ (0 until nDup).map { i =>
      val noise = gaussian().map(_ * 0.01)
      val v = normalize(bases(i).zip(noise).map { case (a, b) => a + b })
      ((n + i).toLong, v.map(_.toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
      .repartition(32).persist()
    df.count()

    val model = Ivf.fixedModel(df, "vec_id", "embedding",
      (0 until topics).map(_.toLong))

    // ground truth: ALL cosine>=tau pairs by brute force (n² probe cost)
    val v = Partitioning.spread(df)
      .select(col("vec_id"), col("embedding").as("__v"))
      .withColumn("__c", Ivf.assignExpr(col("__v"), model))
      .persist()
    val a = v.select(col("vec_id").as("id_a"), col("__v").as("__va"),
      col("__c").as("__ca"))
    val b = v.select(col("vec_id").as("id_b"), col("__v").as("__vb"),
      col("__c").as("__cb"))
    val t0 = System.nanoTime()
    val agg = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("s", round(Similarity.cosine(col("__va"), col("__vb")), 6))
      .filter(col("s") >= tau)
      .select((col("__ca") === col("__cb")).as("same_cluster"))
      .groupBy().agg(count(lit(1)).as("pairs"),
        coalesce(sum(when(col("same_cluster"), 1L).otherwise(0L)), lit(0L))
          .as("same"))
      .head()
    val bruteSec = (System.nanoTime() - t0) / 1e9
    val (pairs, same) = (agg.getLong(0), agg.getLong(1))
    println(f"[planted-recall] n=$n topics=$topics planted=$nDup " +
      f"true_pairs=$pairs co_clustered=$same " +
      f"recall=${same.toDouble / pairs}%.4f brute_sec=$bruteSec%.1f")

    // survivor-set equality: blocked SemDedup vs brute-force min-id rule
    val t1 = System.nanoTime()
    val blocked = SemDedup.dedupManaged(df, "vec_id", "embedding", model, tau)
    val keptBlocked = blocked.use(_.select("vec_id").as[Long].collect().toSet)
    val blockedSec = (System.nanoTime() - t1) / 1e9
    val droppedBrute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("s", round(Similarity.cosine(col("__va"), col("__vb")), 6))
      .filter(col("s") >= tau)
      .select(col("id_b")).distinct().as[Long].collect().toSet
    val keptBrute = rows.map(_._1).filterNot(droppedBrute).toSet
    val diff = (keptBlocked -- keptBrute) ++ (keptBrute -- keptBlocked)
    println(f"[planted-recall] survivors blocked=${keptBlocked.size} " +
      f"brute=${keptBrute.size} diff=${diff.size} " +
      f"semdedup_sec=$blockedSec%.1f " +
      f"equal=${if (diff.isEmpty) "YES" else "NO"}")
    v.unpersist(false)
    spark.stop()
  }
}
