package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native product-quantization kernels for [[graft.ops.Pq]] at LARGE k.
  *
  * The unrolled forms — one `vec_dot(slice(vec,…), array(lit…))` term per
  * (subspace, codeword) — generate O(m × k × subDim) Java source: fine at
  * m·k ≈ 64, Janino-method-limit trouble at the production k = 256. These
  * expressions keep generated code CONSTANT-size in m and k: the codebook
  * rides along as a codegen reference object and the work is one static
  * call into a JIT-compiled primitive loop.
  *
  * Arithmetic is bit-identical to the unrolled forms (same slice → min-
  * length semantics, null elements skipped exactly as
  * [[VectorExpressions.VectorDot]] skips them, half-norms accumulated in
  * index order like the driver literals, argmax ties to the HIGHER
  * codeword id like struct array_max) — PqSpec asserts value equality, so
  * the DuckDB PQ oracles remain valid for either form.
  */
object PqExpressions {

  private def elemTagOf(dt: DataType): Int = dt match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(IntegerType, _) => 2
    case _ => 1
  }

  private def checkVec(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType | IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float|double|int> input, got $other")
  }

  /** PQ code array (m ints) — the large-k twin of Pq.encodeExpr's
    * unrolled argmax array. Null input → null (the ops layer supplies the
    * all−1 sentinel branch, as it does for the unrolled form).
    */
  case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
      extends UnaryExpression {

    @transient private lazy val cws: Array[Array[Array[Double]]] =
      codebooks.map(_.map(_.toArray).toArray).toArray
    // half squared norms, accumulated in index order (the driver-literal
    // convention of the unrolled form)
    @transient private lazy val halfNorms: Array[Array[Double]] =
      cws.map(_.map { c =>
        var s = 0.0; var i = 0
        while (i < c.length) { s += c(i) * c(i); i += 1 }
        s / 2
      })

    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult =
      checkVec(child.dataType, "pq_encode")

    override def nullSafeEval(v: Any): Any =
      PqExpressions.encode(v.asInstanceOf[ArrayData],
        elemTagOf(child.dataType), cws, halfNorms)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cwRef = ctx.addReferenceObj("codebooks", cws, "double[][][]")
      val hnRef = ctx.addReferenceObj("halfNorms", halfNorms, "double[][]")
      val tag = elemTagOf(child.dataType)
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.PqExpressions.encode($a, $tag, $cwRef, $hnRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "pq_encode"
  }

  /** Flat m×k ADC lookup table (array<double>, entry s·k+j = sub-dot) —
    * the large-k twin of Pq.lutExpr.
    */
  case class PqLut(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
      extends UnaryExpression {

    @transient private lazy val cws: Array[Array[Array[Double]]] =
      codebooks.map(_.map(_.toArray).toArray).toArray

    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult =
      checkVec(child.dataType, "pq_lut")

    override def nullSafeEval(v: Any): Any =
      PqExpressions.lut(v.asInstanceOf[ArrayData], elemTagOf(child.dataType), cws)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cwRef = ctx.addReferenceObj("codebooks", cws, "double[][][]")
      val tag = elemTagOf(child.dataType)
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.PqExpressions.lut($a, $tag, $cwRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "pq_lut"
  }

  /** Sub-vector dot against one codeword with VectorDot's exact semantics
    * over the slice window [s·subDim, s·subDim + subDim): min-length via
    * the vector's actual length, null elements skipped.
    */
  private def subDot(x: ArrayData, tag: Int, base: Int,
                     cw: Array[Double]): Double = {
    val lim = math.min(cw.length, x.numElements() - base)
    var s = 0.0; var i = 0
    while (i < lim) {
      val p = base + i
      if (!x.isNullAt(p)) {
        val xv = tag match {
          case 0 => x.getFloat(p).toDouble
          case 2 => x.getInt(p).toDouble
          case _ => x.getDouble(p)
        }
        s += xv * cw(i)
      }
      i += 1
    }
    s
  }

  /** Static encode kernel shared by eval and codegen. Ties go to the
    * HIGHER codeword id (`>=` replacement while ascending — the struct
    * array_max convention of the unrolled form). NaN scores follow Spark's
    * ordering (NaN greatest): once any NaN score appears it wins over every
    * finite score, and among NaN scores the highest codeword id wins — so a
    * NaN-carrying vector encodes identically on both sides of the
    * UnrollMaxTerms boundary.
    */
  def encode(x: ArrayData, tag: Int, cws: Array[Array[Array[Double]]],
             halfNorms: Array[Array[Double]]): ArrayData = {
    val m = cws.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val k = cws(s).length
      val base = s * cws(s)(0).length
      var best = Double.NegativeInfinity
      var bestNaN = false
      var bestJ = -1
      var j = 0
      while (j < k) {
        val sc = subDot(x, tag, base, cws(s)(j)) - halfNorms(s)(j)
        val scNaN = java.lang.Double.isNaN(sc)
        // Spark struct-max ordering: NaN > any finite; ties -> higher j.
        if (scNaN || (!bestNaN && sc >= best)) {
          best = sc; bestNaN = scNaN; bestJ = j
        }
        j += 1
      }
      out(s) = bestJ
      s += 1
    }
    new GenericArrayData(out.map(v => v: Any))
  }

  /** Static LUT kernel shared by eval and codegen. */
  def lut(x: ArrayData, tag: Int, cws: Array[Array[Array[Double]]]): ArrayData = {
    val m = cws.length
    val k = if (m > 0) cws(0).length else 0
    val out = new Array[Any](m * k)
    var s = 0
    while (s < m) {
      val base = s * cws(s)(0).length
      var j = 0
      while (j < k) {
        out(s * k + j) = subDot(x, tag, base, cws(s)(j))
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score — the large-m twin of Pq.adcScoreExpr's unrolled
    * element_at chain: `Σ_s lut[s·k + codes[s]]` accumulated in ascending
    * subspace order (the exact left-associated FP order of the unrolled
    * `reduceLeft(_ + _)`, so values are bit-identical — PqSpec asserts
    * it). Generated code is one static call, constant-size in m and k.
    * Null inputs → null (BinaryExpression default); null ELEMENTS,
    * malformed codes (empty, -1 sentinel, >= k) and LUT/m·k size
    * mismatches fail loudly in the kernel instead of the primitive
    * getter's silent 0.0 / raw AIOOBE — at least as total as the
    * unrolled form's ANSI element_at contract.
    */
  case class PqAdc(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType

    // containsNull=true types are ACCEPTED (parquet round-trips mark
    // every array containsNull regardless of content); actual null slots
    // fail loudly in the kernel instead of silently reading as 0.0
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"pq_adc requires (array<double>, array<int>), got $other")
      }

    override def nullSafeEval(lutV: Any, codesV: Any): Any =
      PqExpressions.adc(lutV.asInstanceOf[ArrayData],
        codesV.asInstanceOf[ArrayData], k)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (l, c) =>
        s"graft.functions.PqExpressions.adc($l, $c, $k)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "pq_adc"
  }

  /** Static ADC kernel shared by eval and codegen: ascending-s sum,
    * SEEDED with the first term rather than 0.0 — `0.0 + (-0.0)` is 0.0,
    * so a zero-seeded loop would differ from the unrolled reduceLeft
    * chain on a negative-zero first term (sign surfaces in the rounded
    * string the oracle hashes).
    *
    * Precondition (asserted, not assumed): codes non-empty, every code in
    * [0, k), and lut holds exactly m·k entries — a -1 sentinel or a
    * truncated LUT fails loudly with the operator name instead of an
    * executor ArrayIndexOutOfBoundsException (or, worse, a silent wrong
    * read); a null SLOT (legal in parquet-typed arrays) likewise fails
    * loudly instead of the primitive getter's silent 0.0. The checks are
    * branch-only (no allocation), so the constant-size-kernel win over
    * the unrolled chain is preserved.
    */
  def adc(lut: ArrayData, codes: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    if (m == 0) throw new IllegalArgumentException("pq_adc: empty codes array")
    if (lut.numElements() != m * k) throw new IllegalArgumentException(
      s"pq_adc: lut has ${lut.numElements()} entries, expected m*k = ${m * k}")
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) throw new IllegalArgumentException(
        s"pq_adc: null code at subspace $s")
      val c = codes.getInt(s)
      if (c < 0 || c >= k) throw new IllegalArgumentException(
        s"pq_adc: code $c at subspace $s out of [0, $k)")
      val i = s * k + c
      if (lut.isNullAt(i)) throw new IllegalArgumentException(
        s"pq_adc: null lut entry at $i")
      val t = lut.getDouble(i)
      if (s == 0) acc = t else acc += t
      s += 1
    }
    acc
  }

  // ------------------------------------------------------ Column API

  def pq_encode(vec: Column, codebooks: Seq[Seq[Array[Double]]]): Column =
    bridge.column(PqEncode(bridge.expression(vec),
      codebooks.map(_.map(_.toSeq))))

  def pq_lut(vec: Column, codebooks: Seq[Seq[Array[Double]]]): Column =
    bridge.column(PqLut(bridge.expression(vec),
      codebooks.map(_.map(_.toSeq))))

  def pq_adc(lut: Column, codes: Column, k: Int): Column =
    bridge.column(PqAdc(bridge.expression(lut), bridge.expression(codes), k))
}
