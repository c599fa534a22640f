package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the word-shingling hot path.
  *
  * The higher-order-function form — `transform(sequence(0, len-n), i =>
  * array_join(slice(toks, i+1, n), " "))` — embeds the token array
  * expression INSIDE the lambda body, so the full tokenize pipeline
  * (regexp_replace → trim → lower → split) is re-evaluated once per
  * SHINGLE, not once per document (~|tokens|× redundant work), and HOFs
  * are CodegenFallback so it all runs interpreted. This expression takes
  * the token array as a regular child (evaluated once per row) and emits
  * the sliding windows in one primitive loop; generated code is a single
  * static call.
  *
  * Value parity with the HOF form is exact (ShingleExpressionsSpec):
  * `len >= n` → the len-n+1 windows of n tokens joined by " ";
  * `len < n`  → one element joining ALL tokens by " " (for arrays from
  * `TextDedup.tokens` this equals the normalized text, which is what the
  * HOF form's else-branch produced); null elements are skipped by the
  * join exactly like `array_join`.
  */
object ShingleExpressions {

  private val Space = UTF8String.fromString(" ")

  private def joinRange(arr: ArrayData, from: Int, until: Int): UTF8String = {
    val parts = new Array[UTF8String](until - from)
    var i = from
    while (i < until) {
      // concatWs skips nulls — array_join(..., " ") semantics
      parts(i - from) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    UTF8String.concatWs(Space, parts: _*)
  }

  def compute(arr: ArrayData, n: Int): GenericArrayData = {
    val len = arr.numElements()
    if (len >= n) {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i <= len - n) {
        out(i) = joinRange(arr, i, i + n)
        i += 1
      }
      new GenericArrayData(out)
    } else new GenericArrayData(Array[Any](joinRange(arr, 0, len)))
  }

  case class ShingleWindows(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, s"shingle width must be >= 1, got $n")

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_windows requires array<string> input, got $other")
    }

    override def nullSafeEval(v: Any): Any =
      compute(v.asInstanceOf[ArrayData], n)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ShingleExpressions.compute($c, $n);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "shingle_windows"
  }

  def shingle_windows(tokens: Column, n: Int): Column =
    bridge.column(ShingleWindows(bridge.expression(tokens), n))

  /** Stride-`n` variant of [[compute]]: NON-overlapping windows (the tail
    * window may be shorter than `n`), i.e. `ceil(len / n)` chunks, chunk
    * `i` = tokens `[i*n, min((i+1)*n, len))` joined by one space. Empty
    * input → empty output (no whole-text fallback: chunking partitions the
    * token sequence, it does not need every doc to emit a window).
    */
  def computeChunks(arr: ArrayData, n: Int): GenericArrayData = {
    val len = arr.numElements()
    val out = new Array[Any]((len + n - 1) / n)
    var i = 0
    while (i * n < len) {
      out(i) = joinRange(arr, i * n, math.min(i * n + n, len))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Non-overlapping n-token chunks of a token array — the line-builder for
    * segment-level (C4-style line) dedup over corpora whose documents carry
    * no natural line structure. Same motivation as [[ShingleWindows]]: a
    * `transform(sequence(...), i => array_join(slice(toks, ...)))` HOF form
    * re-evaluates the token-array expression once per CHUNK (the
    * lambda-invariant recompute trap), runs interpreted, and O(len²/n)
    * char-work per document would bite on long documents at scale.
    */
  case class ChunkWindows(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, s"chunk width must be >= 1, got $n")

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"chunk_windows requires array<string> input, got $other")
    }

    override def nullSafeEval(v: Any): Any =
      computeChunks(v.asInstanceOf[ArrayData], n)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ShingleExpressions.computeChunks($c, $n);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "chunk_windows"
  }

  def chunk_windows(tokens: Column, n: Int): Column =
    bridge.column(ChunkWindows(bridge.expression(tokens), n))

  /** Strided (overlapping) windows — the RAG/training chunk shape
    * generalizing [[computeChunks]] (stride == width) and
    * [[compute]] (stride == 1, minus its short-input fallback):
    * window `i` = tokens `[i*stride, min(i*stride + width, len))`, emitted
    * while the previous window has not already covered the end — i.e.
    * `len <= width` → 1 window, else `1 + ceil((len-width)/stride)` —
    * so the final window always ends at `len` and no trailing window is
    * fully contained in its predecessor. Empty input → empty output.
    */
  def computeStrided(arr: ArrayData, width: Int, stride: Int): GenericArrayData = {
    val len = arr.numElements()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val nw = if (len <= width) 1 else 1 + (len - width + stride - 1) / stride
    val out = new Array[Any](nw)
    var i = 0
    while (i < nw) {
      val from = i * stride
      out(i) = joinRange(arr, from, math.min(from + width, len))
      i += 1
    }
    new GenericArrayData(out)
  }

  case class StridedWindows(child: Expression, width: Int, stride: Int)
      extends UnaryExpression {
    require(width >= 1, s"window width must be >= 1, got $width")
    require(stride >= 1 && stride <= width,
      s"stride must be in [1, width=$width], got $stride")

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"strided_windows requires array<string> input, got $other")
    }

    override def nullSafeEval(v: Any): Any =
      computeStrided(v.asInstanceOf[ArrayData], width, stride)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ShingleExpressions.computeStrided($c, $width, $stride);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "strided_windows"
  }

  def strided_windows(tokens: Column, width: Int, stride: Int): Column =
    bridge.column(StridedWindows(bridge.expression(tokens), width, stride))
}
