package graft.ops

import org.apache.spark.sql.DataFrame

/** Partition-geometry helpers shared by the per-row-expensive operators. */
object Partitioning {

  /** Spread a frame across all cores before per-row-expensive expression
    * work. Small single-file inputs otherwise arrive as ONE partition and
    * signature/scoring work runs serially; at real scale the input already
    * has enough splits and this is a no-op.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
