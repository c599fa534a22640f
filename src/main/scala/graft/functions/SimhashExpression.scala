package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native SimHash vote-and-sign kernel.
  *
  * The higher-order-function form aggregates a `bits`-wide accumulator
  * array with a `bits`-wide unrolled vote array per token — the same
  * shape whose Janino compile cost pushed MinHash to a native expression
  * in round 3, and HOFs evaluate interpreted with two array allocations
  * per token. This expression takes the PRE-HASHED token array (the hash
  * family — xxhash64 or the md5-portable one — stays outside as ordinary
  * Spark expressions, so the DuckDB oracle parity of the portable path is
  * untouched) and folds votes in one primitive loop.
  *
  * Value parity with the HOF form is exact (SimhashExpressionSpec): per
  * bit j, each token votes +1 if bit j of its hash is set else −1 (a NULL
  * hash votes −1 everywhere, like the HOF's null-condition fallthrough =
  * hash 0); fingerprint bit j is set iff votes > 0; empty array → 0L;
  * null array → null.
  */
object SimhashExpression {

  def compute(hashes: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = if (hashes.isNullAt(i)) 0L else hashes.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  case class SimhashBits(child: Expression, bits: Int)
      extends UnaryExpression {
    require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")

    override def dataType: DataType = LongType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash_bits requires array<bigint> input, got $other")
    }

    override def nullSafeEval(v: Any): Any =
      compute(v.asInstanceOf[ArrayData], bits)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SimhashExpression.compute($c, $bits);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "simhash_bits"
  }

  def simhash_bits(hashes: Column, bits: Int): Column =
    bridge.column(SimhashBits(bridge.expression(hashes), bits))
}
