package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ShingleExpressions

/** Overlapping token-window chunking — the context-window preparation step
  * of a RAG / training pipeline: split each document into `width`-token
  * windows starting every `stride` tokens (overlap = width - stride), with
  * stable per-document chunk indices and token offsets.
  *
  * The reference (a payroll ETL) has no counterpart; the shape follows the
  * standard retrieval-chunking recipe. The window builder is a native
  * codegen'd expression ([[ShingleExpressions.StridedWindows]]) for the
  * same reason as the shingle/chunk kernels: the HOF form re-evaluates the
  * tokenizer once per window and runs interpreted.
  *
  * Scale posture: one narrow projection + `posexplode` — no shuffle at
  * all; output size is `ceil(tokens/stride)` rows per document, each
  * carrying only its own window text. Chunk offsets derive from the index
  * (`start_tok = chunk_idx * stride`), so no window function or join is
  * needed for position bookkeeping.
  */
object Chunker {

  /** One row per chunk: (id, chunk_idx, start_tok, n_tokens, chunk_text).
    * Windows cover the document exactly: the final window ends at the last
    * token, and no window is fully contained in its predecessor (see
    * [[ShingleExpressions.computeStrided]] for the emission rule).
    * Documents whose normalized text is empty still emit one empty chunk
    * (their token array is [""], mirroring `split` semantics on both
    * engines).
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            width: Int, stride: Int): DataFrame =
    docs
      .select(col(idCol),
        posexplode(ShingleExpressions.strided_windows(
          TextDedup.tokens(col(textCol)), width, stride))
          .as(Seq("chunk_idx", "chunk_text")))
      .select(
        col(idCol),
        col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        size(split(col("chunk_text"), " ")).as("n_tokens"),
        col("chunk_text"))
}
