package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: deflate(text).length / text.bytes.length.
  *
  * A standard corpus heuristic (low ratio → templated/repetitive content —
  * machine-generated boilerplate compresses hard; very high ratio → noise
  * that doesn't compress at all, e.g. base64/binary spill). Complements the
  * token-level repetition metrics in [[graft.ops.TextStats]]: deflate's
  * LZ77 window catches LONG-RANGE duplication (a paragraph pasted ten
  * times) that bigram fractions miss.
  *
  * Determinism: deflate at a FIXED level with nowrap is a pure function of
  * the bytes for a given zlib, and the JVM pins its own zlib — so the
  * metric is stable across runs, partitions, and executors of one engine
  * build. It is NOT portably reproducible across engines (zlib versions
  * may pick different matches), so the query carrying it is declared
  * WITHOUT a SQL oracle (rows-only check) — the engine's only such query,
  * by design; the spec covers the signal's semantics instead.
  *
  * Scale posture: map-side, one Deflater per thread (reused — allocating
  * one per row measured ~3× slower), output bounded by deflate's ~1.0003×
  * worst-case expansion. Codegen is a single static call.
  */
object CompressExpression {

  private val CompressLevel = 6

  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(CompressLevel, true) // nowrap: no zlib header/checksum
  }

  /** compressed-bytes / raw-bytes of the UTF-8 text; 1.0 for empty text. */
  def compute(text: UTF8String): Double = {
    val bytes = text.getBytes
    if (bytes.length == 0) 1.0
    else {
      val d = deflaters.get()
      d.reset()
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      out.toDouble / bytes.length
    }
  }

  case class CompressRatio(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"compress_ratio requires string input, got $other")
    }

    override def nullSafeEval(v: Any): Any =
      compute(v.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.CompressExpression.compute($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "compress_ratio"
  }

  def compress_ratio(c: Column): Column =
    bridge.column(CompressRatio(bridge.expression(c)))
}
