package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: stage timing of the exact-quantile rank-select pipeline. */
object QuantProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[quant] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val exploded = df
        .select(posexplode(array(cols.map(c => col(c).cast("double")): _*))
          .as(Seq("__ci", "__v")))
        .filter(col("__v").isNotNull)
      t("scan+explode count") { exploded.count() }
      val counts = exploded
        .repartitionByRange(col("__ci"), col("__v"))
        .groupBy("__ci", "__v").agg(count(lit(1)).as("__cnt"))
        .sortWithinPartitions("__ci", "__v")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("counts materialize") { counts.count() }
      val partTotals = t("partTotals pass") {
        counts.rdd.mapPartitions { it =>
          val m = scala.collection.mutable.Map.empty[Int, Long]
          it.foreach(r => m.update(r.getInt(0), m.getOrElse(r.getInt(0), 0L) + r.getLong(2)))
          Iterator.single(m.toMap)
        }.collect()
      }
      t("hits pass") {
        counts.rdd.mapPartitionsWithIndex { case (i, it) =>
          var x = 0L
          it.foreach(r => x += r.getLong(2))
          Iterator.single(x)
        }.collect()
      }
      println(s"[quant] counts rows = ${counts.count()}, partitions = ${counts.rdd.getNumPartitions}, totals keys = ${partTotals.map(_.size).sum}")
      counts.unpersist()
    }
    spark.stop()
  }
}
