package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType, StructField, StructType}

import graft.ops.{Ivf, SemDedup}

/** Streaming semantic dedup over foreachBatch — the vector counterpart of
  * [[graft.pipelines.CorpusPrepStream]]'s text recipe: each micro-batch is
  * [[SemDedup.dedupIncrement]]'d against the ACCUMULATED assigned store,
  * so an admitted vector is semantically novel versus everything admitted
  * before it (and versus its own batch, min-id first).
  *
  * State is the assigned store itself — (id, vector, cluster) of every
  * admitted row; assignment is computed ONCE at admission and reread as
  * stored column data (the signature-store lesson). foreachBatch executes
  * serially, so the state fold is single-writer; frames are
  * localCheckpoint'd per batch (a real deployment appends to a parquet
  * store — [[graft.pipelines.CorpusStore]] — and re-reads lazily, same
  * contract as the text path).
  *
  * Relationship to [[VecStream]]: VecStream TAGS arrivals against a
  * static corpus at per-event latency (stateless, bucket-blocked);
  * this stream ADMITS against a growing corpus with the full SemDeDup
  * semantics (cluster-blocked, min-id survivor, batch-order effects).
  */
object SemDedupStream {

  /** Accumulated admitted store: (idCol, vecCol, cluster). */
  final case class VecState(storedAssigned: DataFrame)

  def emptyState(spark: SparkSession, idCol: String, vecCol: String,
                 elementType: DataType = FloatType): VecState =
    VecState(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField(idCol, LongType),
        StructField(vecCol, ArrayType(elementType)),
        StructField("cluster", IntegerType)))))

  /** One batch: admit semantically-novel vectors, append them (with their
    * assignment) to the store. Returns (next state, admitted frame).
    */
  def dedupBatch(state: VecState, batch: DataFrame, idCol: String,
                 vecCol: String, model: Ivf.Model, tau: Double,
                 checkpointState: Boolean = false): (VecState, DataFrame) = {
    def frontier(df: DataFrame): DataFrame =
      if (checkpointState) df.localCheckpoint() else df
    val incM = SemDedup.dedupIncrement(batch, state.storedAssigned,
      idCol, vecCol, model, tau)
    val admitted = frontier(
      batch.select(col(idCol), col(vecCol)).join(incM.df, Seq(idCol))
        .select(col(idCol), col(vecCol), col("cluster")))
    if (checkpointState) incM.release()
    val nextStored = frontier(state.storedAssigned.unionByName(admitted))
    (VecState(nextStored), admitted)
  }

  /** Handle over a running stream: current state + the query. */
  final class StreamingDedup(initial: VecState) {
    @volatile var state: VecState = initial
    @volatile private[SemDedupStream] var queryRef:
        org.apache.spark.sql.streaming.StreamingQuery = _
    def query: org.apache.spark.sql.streaming.StreamingQuery = queryRef
  }

  /** Run admission over an unbounded vector stream; `onBatch` receives
    * each batch's admitted frame (route to a store append there).
    */
  def streamDedup(stream: DataFrame, idCol: String, vecCol: String,
                  model: Ivf.Model, tau: Double,
                  initial: Option[VecState] = None,
                  onBatch: (Long, DataFrame) => Unit = (_, _) => ()): StreamingDedup = {
    val handle = new StreamingDedup(initial.getOrElse(
      emptyState(stream.sparkSession, idCol, vecCol)))
    handle.queryRef = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (next, admitted) = dedupBatch(handle.state, batch, idCol,
          vecCol, model, tau, checkpointState = true)
        handle.state = next
        onBatch(batchId, admitted)
      }
      .start()
    handle
  }
}
