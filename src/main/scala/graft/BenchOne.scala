package graft
import org.apache.spark.sql.SparkSession

/** Focused benchmark: time only the queries named on the command line
  * (min of `SPARK_GRAFT_REPS`, default 3, after one warmup) — the
  * iterate-on-one-operator loop, where running the whole registry drowns
  * the signal. Same session config as [[Bench]].
  *
  * Usage: sbt "runMain graft.BenchOne q_ext_dedup_groups q_ext_vocab_encode"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bounded-buffer typed aggregates: avoid the 128-key
      // ObjectHashAggregate sort fallback (SCALE.md round-10 probe)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(",")}"))
      fn(spark, sfDir).count() // warmup
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"BENCHONE $name min=${times.map(_._1).min}%.3f all=${times.map(t => f"${t._1}%.3f").mkString(",")} rows=${times.head._2}")
    }
    spark.stop()
  }
}
