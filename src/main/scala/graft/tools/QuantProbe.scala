package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Scratch: structural A/B of the exact-quantile rank-select pipeline
  * (round-20: where do q_ext_profile_quantiles' 1.5 s go, and which
  * restructure actually lowers it?). Variants:
  *
  *   A  range-first + persist   (the shipped round-18/19 form)
  *   B  range-first, NO persist (second job re-pays agg+sort via shuffle
  *      reuse instead of paying the cache build)
  *   C  hash-agg first + persist + range over the aggregate (the round-19
  *      verdict idea — measured 1.85x SLOWER end-to-end via QuantAB)
  *
  * Each variant runs the FULL driver protocol (sample/shuffle, partTotals
  * collect, hits-shaped second collect) so the numbers are comparable.
  */
object QuantProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    def exploded() = df
      .select(posexplode(array(cols.map(c => col(c).cast("double")): _*))
        .as(Seq("__ci", "__v")))
      .filter(col("__v").isNotNull)

    def protocol(counts: DataFrame): Long = {
      val partTotals = counts.rdd.mapPartitions { it =>
        val m = scala.collection.mutable.Map.empty[Int, Long]
        it.foreach(r => m.update(r.getInt(0), m.getOrElse(r.getInt(0), 0L) + r.getLong(2)))
        Iterator.single(m.toMap)
      }.collect()
      val hits = counts.rdd.mapPartitionsWithIndex { case (_, it) =>
        var x = 0L
        it.foreach(r => x += r.getLong(2))
        Iterator.single(x)
      }.collect()
      partTotals.map(_.values.sum).sum + hits.sum
    }

    def variantA(): Long = {
      val counts = exploded()
        .repartitionByRange(col("__ci"), col("__v"))
        .groupBy("__ci", "__v").agg(count(lit(1)).as("__cnt"))
        .sortWithinPartitions("__ci", "__v")
        .persist(lvl)
      try protocol(counts) finally counts.unpersist(false)
    }

    def variantB(): Long = {
      val counts = exploded()
        .repartitionByRange(col("__ci"), col("__v"))
        .groupBy("__ci", "__v").agg(count(lit(1)).as("__cnt"))
        .sortWithinPartitions("__ci", "__v")
      protocol(counts)
    }

    def variantC(): Long = {
      val agg = exploded()
        .groupBy("__ci", "__v").agg(count(lit(1)).as("__cnt"))
        .persist(lvl)
      val counts = agg
        .repartitionByRange(col("__ci"), col("__v"))
        .sortWithinPartitions("__ci", "__v")
      try protocol(counts) finally agg.unpersist(false)
    }

    def time(tag: String)(f: => Long): Unit = {
      f // warm
      val reps = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[quant] $tag min=${reps.min}%.3f p50=${reps.sorted.apply(2)}%.3f")
    }

    time("A range+persist ")(variantA())
    time("B range-nopersist")(variantB())
    time("C hashagg-first  ")(variantC())
    spark.stop()
  }
}
