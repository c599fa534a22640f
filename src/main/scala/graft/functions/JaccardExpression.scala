package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaccard similarity of two string arrays — the LSH candidate
  * verify kernel.
  *
  * The built-in composition `size(array_intersect(a,b)) /
  * size(array_union(a,b))` MATERIALIZES both the intersection and the
  * union as arrays (copying every element) only to take their sizes.
  * This expression counts distinct overlap in one hash-set pass:
  * |A∩B| via probe, |A∪B| = |A| + |B| − |A∩B| — no arrays built.
  *
  * Value parity with the composition is exact (JaccardExpressionSpec):
  * distinct-set semantics (duplicates collapse, like array_intersect /
  * array_union), a null ELEMENT is one distinct value, both-empty → 0.0,
  * null ARRAY → null. Division is the same double divide of the same two
  * integer counts, so results are bit-identical.
  */
object JaccardExpression {

  def compute(a: ArrayData, b: ArrayData): Double = {
    val seen = new java.util.HashSet[UTF8String]()
    var aNull = false
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) aNull = true else seen.add(a.getUTF8String(i))
      i += 1
    }
    val sizeA = seen.size + (if (aNull) 1 else 0)
    val inB = new java.util.HashSet[UTF8String]()
    var bNull = false
    var inter = 0L
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      if (b.isNullAt(j)) bNull = true
      else {
        val s = b.getUTF8String(j)
        if (inB.add(s) && seen.contains(s)) inter += 1
      }
      j += 1
    }
    val sizeB = inB.size + (if (bNull) 1 else 0)
    if (aNull && bNull) inter += 1
    val union = sizeA.toLong + sizeB.toLong - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  case class JaccardSim(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"jaccard_sim requires two array<string> inputs, got $other")
      }

    override def nullSafeEval(a: Any, b: Any): Any =
      compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.JaccardExpression.compute($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "jaccard_sim"
  }

  def jaccard_sim(a: Column, b: Column): Column =
    bridge.column(JaccardSim(bridge.expression(a), bridge.expression(b)))
}
