package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native centroid scoring for IVF ([[graft.ops.Ivf]]) at LARGE k.
  *
  * The unrolled form — one `vec_cosine(vec, array(lit...))` per centroid —
  * generates O(k × dim) Java source, which is fine at k ≈ 16 but collides
  * with Janino's 64 KB method limit as k reaches the hundreds. This
  * expression keeps generated-code size CONSTANT in k: the k × dim centroid
  * table rides along as a codegen reference object and the scoring is one
  * static-call into a JIT-compiled primitive loop.
  *
  * Arithmetic is bit-identical to [[VectorExpressions.VectorCosine]] run
  * per centroid (same accumulation order, same min-length and null-element
  * handling, same zero-norm guard), so the two forms are interchangeable —
  * IvfSpec asserts value equality — and the DuckDB IVF oracle remains valid
  * for either.
  */
object IvfExpressions {

  /** (cosine score, centroid index) structs for a vector against every
    * centroid — the large-k twin of Ivf.scoredCentroids' unrolled array.
    */
  case class CentroidScores(child: Expression, centroids: Seq[Seq[Double]])
      extends UnaryExpression {

    @transient private lazy val cents: Array[Array[Double]] =
      centroids.map(_.toArray).toArray

    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("s", DoubleType, nullable = false),
        StructField("i", IntegerType, nullable = false))),
      containsNull = false)

    private def elemTag: Int = child.dataType match {
      case ArrayType(FloatType, _) => 0
      case ArrayType(IntegerType, _) => 2
      case _ => 1
    }

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"centroid_scores requires array<float|double|int> input, got $other")
    }

    override def nullSafeEval(v: Any): Any =
      IvfExpressions.scores(v.asInstanceOf[ArrayData], elemTag, cents)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centsRef = ctx.addReferenceObj("centroids", cents, "double[][]")
      val tag = elemTag
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.IvfExpressions.scores($a, $tag, $centsRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "centroid_scores"
  }

  /** Static scoring kernel shared by eval and codegen: one pass unpacks the
    * vector to primitives, then k tight loops score it against each
    * centroid with VectorCosine's exact arithmetic.
    */
  def scores(x: ArrayData, elemTag: Int, cents: Array[Array[Double]]): ArrayData = {
    val m = x.numElements()
    val xs = new Array[Double](m)
    val nulls = new Array[Boolean](m)
    var j = 0
    while (j < m) {
      if (x.isNullAt(j)) nulls(j) = true
      else xs(j) = elemTag match {
        case 0 => x.getFloat(j).toDouble
        case 2 => x.getInt(j).toDouble
        case _ => x.getDouble(j)
      }
      j += 1
    }
    val k = cents.length
    val out = new Array[Any](k)
    var ci = 0
    while (ci < k) {
      val c = cents(ci)
      val n = math.min(m, c.length)
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      var i = 0
      while (i < n) {
        if (!nulls(i)) {
          val xv = xs(i); val cv = c(i)
          ab += xv * cv; aa += xv * xv; bb += cv * cv
        }
        i += 1
      }
      val denom = math.sqrt(aa) * math.sqrt(bb)
      out(ci) = InternalRow(if (denom == 0.0) 0.0 else ab / denom, ci)
      ci += 1
    }
    new GenericArrayData(out)
  }

  // ------------------------------------------------------ Column API

  def centroid_scores(vec: Column, centroids: Seq[Array[Double]]): Column =
    bridge.column(CentroidScores(bridge.expression(vec),
      centroids.map(_.toSeq)))
}
