package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Partition-geometry helpers shared by the per-row-expensive operators. */
object Partitioning {

  /** Spread a frame across all cores before per-row-expensive expression
    * work. Small single-file inputs otherwise arrive as ONE partition and
    * signature/scoring work runs serially; at real scale the input already
    * has enough splits and this is a no-op.
    *
    * The split estimate comes from the optimized LOGICAL plan's file
    * relations (file count, and total bytes over `maxPartitionBytes` for
    * few-but-large files) — not from `df.rdd.getNumPartitions`, which
    * forces a plan-to-RDD conversion at every call site and pins a physical
    * plan AQE can no longer re-plan. Non-file leaves (in-memory relations,
    * streaming sources) are assumed already spread: repartitioning them
    * unconditionally would insert a shuffle the caller didn't ask for.
    */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxSplit = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    val estimate = df.queryExecution.optimizedPlan.collectLeaves().map {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        val files = fs.location.inputFiles.length.toLong
        val bySize = (fs.location.sizeInBytes + maxSplit - 1) / maxSplit
        math.max(files, bySize)
      case _ => target.toLong
    }.sum
    if (estimate < target) df.repartition(target) else df
  }
}
