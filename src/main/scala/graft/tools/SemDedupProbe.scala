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
    spark.stop()
  }
}
