package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, FileScan, FileTable}

/** Partition-geometry helpers shared by the per-row-expensive operators. */
object Partitioning {

  /** Spread a frame across all cores before per-row-expensive expression
    * work. Small single-file inputs otherwise arrive as ONE partition and
    * signature/scoring work runs serially; at real scale the input already
    * has enough splits and this is a no-op.
    *
    * The split estimate comes from the optimized LOGICAL plan's FILE
    * leaves — v1 `HadoopFsRelation` and v2 `FileScan` relations — using
    * file count, and total bytes over `maxPartitionBytes` for
    * few-but-large files. Not `df.rdd.getNumPartitions`, which forces a
    * plan-to-RDD conversion at every call site and pins a physical plan
    * AQE can no longer re-plan.
    *
    * Non-file leaves (in-memory relations, streaming sources) are assumed
    * already spread and EXCLUDED from the estimate — repartitioning them
    * unconditionally would insert a shuffle the caller didn't ask for, but
    * letting them count as "fully split" would mask an under-split file
    * scan sitting next to them (a single-file scan joined to an in-memory
    * dim must still spread). A plan with no file leaves at all is left
    * untouched.
    */
  def spread(df: DataFrame): DataFrame = {
    // a streaming frame cannot be batch-analyzed (optimizedPlan would
    // throw UnsupportedOperationChecker) and its micro-batch partitioning
    // is the source's business — pass through untouched
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxSplit = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    def estimate(files: Long, bytes: Long): Long =
      math.max(files, (bytes + maxSplit - 1) / maxSplit)
    // ANALYZED plan, not optimized: the file leaves are identical (scan
    // relations resolve during analysis) but this skips a full optimizer
    // run per call site — Dsir.fit/avgLogProb call spread several times
    // per query build (round-19 advice: driver-side work growing with
    // plan size)
    val fileLeafSplits = df.queryExecution.analyzed.collectLeaves().flatMap {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Some(estimate(fs.location.inputFiles.length.toLong, fs.location.sizeInBytes))
      // pre-pushdown v2 form (what the ANALYZED plan carries)
      case r: DataSourceV2Relation => r.table match {
        case ft: FileTable =>
          Some(estimate(ft.fileIndex.inputFiles.length.toLong,
            ft.fileIndex.sizeInBytes))
        case _ => None
      }
      // post-pushdown v2 form, kept for callers passing optimized frames
      case r: DataSourceV2ScanRelation => r.scan match {
        case f: FileScan =>
          Some(estimate(f.fileIndex.inputFiles.length.toLong,
            f.fileIndex.sizeInBytes))
        case _ => None
      }
      case _ => None
    }
    if (fileLeafSplits.nonEmpty && fileLeafSplits.sum < target)
      df.repartition(target)
    else df
  }
}
