package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Durable quarantine sink for the intake monitors: flagged rows from
  * [[DriftStream.drift]] / [[DriftStream.quantileDrift]] land in a
  * partitioned parquet table the moment their window closes — the signal
  * becomes an auditable ARTIFACT (the CorpusStore posture) instead of a
  * row in a memory sink nobody reads after the incident.
  *
  * Exactly-once by construction: each micro-batch writes into its own
  * `batch_id=` partition with dynamic partition overwrite, so a batch
  * replayed after a failure OVERWRITES its own partition rather than
  * appending duplicates — the standard idempotent-foreachBatch recipe.
  * Readers see one row per flagged (window, column) per delivery.
  */
object DriftSink {

  /** Writer that persists only the `drift = true` rows of a monitor
    * output to `path`, partitioned by micro-batch id. Caller supplies
    * checkpointLocation and calls `.start()`.
    */
  def quarantine(flagged: DataFrame, path: String): DataStreamWriter[Row] =
    flagged.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch.filter(col("drift"))
        .withColumn("batch_id", lit(batchId))
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    }
}
