package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding-similarity hot path
  * (SURVEY §7.8 similarity search; builder brief: "a native Catalyst
  * Expression (with doGenCode) beats a Scala UDF").
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) walks
  * both arrays through boxed lambda evaluation per element; these expressions
  * compile to a tight primitive loop inside whole-stage codegen, read
  * float32 parquet vectors directly (no array<double> cast pass), and
  * accumulate in double in array order — bit-identical to summing the
  * double-cast vectors sequentially, which keeps DuckDB-oracle parity.
  *
  * Null elements contribute 0; a null array yields null (BinaryExpression
  * null-intolerance).
  */
object VectorExpressions {

  private def checkVec(dt: DataType): Boolean = dt match {
    // int arrays: quantized vectors (Similarity.quantizeInt8) score with
    // the same expressions — cosine is scale-invariant
    case ArrayType(FloatType | DoubleType | IntegerType, _) => true
    case _ => false
  }

  private def accessor(arr: String, dt: DataType, i: String): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case _ => s"$arr.getDouble($i)"
    }

  private def get(arr: ArrayData, dt: DataType, i: Int): Double =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case _ => arr.getDouble(i)
    }

  /** dot(a, b) = Σ a_i * b_i over min(|a|, |b|) elements, double accumulate. */
  case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      if (checkVec(left.dataType) && checkVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float|double|int> inputs, got (${left.dataType}, ${right.dataType})")

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i))
          s += get(x, left.dataType, i) * get(y, right.dataType, i)
        i += 1
      }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
           |    $s += ${accessor(a, left.dataType, i)} * ${accessor(b, right.dataType, i)};
           |  }
           |}
           |${ev.value} = $s;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "vec_dot"
  }

  /** Single-pass cosine similarity: Σab / (sqrt(Σaa) * sqrt(Σbb)), 0 when
    * either norm is 0. One loop computes all three accumulators.
    */
  case class VectorCosine(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      if (checkVec(left.dataType) && checkVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_cosine requires array<float|double|int> inputs, got (${left.dataType}, ${right.dataType})")

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i)) {
          val xv = get(x, left.dataType, i); val yv = get(y, right.dataType, i)
          ab += xv * yv; aa += xv * xv; bb += yv * yv
        }
        i += 1
      }
      val denom = math.sqrt(aa) * math.sqrt(bb)
      if (denom == 0.0) 0.0 else ab / denom
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val ab = ctx.freshName("ab"); val aa = ctx.freshName("aa"); val bb = ctx.freshName("bb")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        val denom = ctx.freshName("denom")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
           |    double $xv = ${accessor(a, left.dataType, i)};
           |    double $yv = ${accessor(b, right.dataType, i)};
           |    $ab += $xv * $yv; $aa += $xv * $xv; $bb += $yv * $yv;
           |  }
           |}
           |double $denom = java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb);
           |${ev.value} = ($denom == 0.0) ? 0.0 : ($ab / $denom);
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "vec_cosine"
  }

  // ------------------------------------------------------ Column API

  /** Sign-LSH signature of a vector under a fixed plane table: bit p is set
    * iff dot(vec, planes(p)) > 0, with EXACTLY [[VectorDot]]'s arithmetic
    * per plane (min-length loop, null elements skipped, double accumulate
    * in index order) — bit-identical to the unrolled when(vec_dot(...) > 0)
    * OR-reduce, which keeps the md5-portable hyperplane oracle intact.
    *
    * The unrolled form generates O(nbits × dim) literal code (the IVF
    * codegen-size problem at wide signatures); here the plane table is a
    * codegen reference object and generated code is one constant-size call.
    * A null VECTOR yields bucket 0L, not null — the value the unrolled
    * form's per-plane `otherwise(0)` fallthrough produced — making the
    * expression non-nullable, so bucket joins infer no isnotnull filter.
    */
  def sigCompute(vec: ArrayData, dt: Int, planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(vec.numElements(), plane.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!vec.isNullAt(i)) {
          val x = dt match {
            case 0 => vec.getFloat(i).toDouble
            case 1 => vec.getInt(i).toDouble
            case _ => vec.getDouble(i)
          }
          s += x * plane(i)
        }
        i += 1
      }
      if (s > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  case class LshSign(child: Expression, planes: IndexedSeq[IndexedSeq[Double]])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    require(planes.nonEmpty && planes.length <= 64,
      s"plane count must be in [1,64], got ${planes.length}")

    // The case field is an immutable Vector-of-Vectors so case-class
    // equality/hashCode are STRUCTURAL — two LshSign nodes over the same
    // plane values canonicalize equal (semantic-equality + subexpression
    // elimination work), and no caller-owned mutable array is aliased.
    // eval/codegen consume the primitive form, built once per node.
    @transient private lazy val planesArr: Array[Array[Double]] =
      planes.map(_.toArray).toArray

    override def dataType: DataType = LongType
    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult =
      if (checkVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"lsh_sign requires array<float|double|int> input, got ${child.dataType}")

    private def dtCode: Int = child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => 0
      case IntegerType => 1
      case _ => 2
    }

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) 0L
      else sigCompute(v.asInstanceOf[ArrayData], dtCode, planesArr)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
      val c = child.genCode(ctx)
      val planesRef = ctx.addReferenceObj("lshPlanes", planesArr, "double[][]")
      ev.copy(code =
        code"""
          ${c.code}
          long ${ev.value} = ${c.isNull} ? 0L :
            graft.functions.VectorExpressions.sigCompute(${c.value}, $dtCode, $planesRef);
          """,
        isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "lsh_sign"
  }

  def lsh_sign(vec: Column, planes: Seq[Array[Double]]): Column =
    bridge.column(LshSign(bridge.expression(vec),
      planes.map(_.toVector).toVector))

  /** Margin-ranked multi-probe sequence (Lv et al., "Multi-Probe LSH",
    * VLDB 2007): the vector's own bucket first, then the single-bit
    * flips of the `nprobe-1` planes with the SMALLEST |dot| margin —
    * the buckets a near-neighbor most plausibly fell into, since a
    * small margin means the hyperplane barely separated them. Per-plane
    * dot arithmetic is EXACTLY [[sigCompute]]'s (min-length loop, null
    * elements skipped, accumulate in index order), so probe 0 equals
    * [[LshSign]] bit-for-bit and the margin order is reproducible in
    * any IEEE engine (ties by plane index ascending).
    */
  def probesCompute(vec: ArrayData, dt: Int, planes: Array[Array[Double]],
                    nprobe: Int): Array[Long] = {
    val dots = new Array[Double](planes.length)
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(vec.numElements(), plane.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!vec.isNullAt(i)) {
          val x = dt match {
            case 0 => vec.getFloat(i).toDouble
            case 1 => vec.getInt(i).toDouble
            case _ => vec.getDouble(i)
          }
          s += x * plane(i)
        }
        i += 1
      }
      dots(p) = s
      if (s > 0) sig |= (1L << p)
      p += 1
    }
    val order = (0 until planes.length).sortBy(j => (math.abs(dots(j)), j))
    val m = math.min(nprobe, planes.length + 1)
    val out = new Array[Long](m)
    out(0) = sig
    var j = 1
    while (j < m) { out(j) = sig ^ (1L << order(j - 1)); j += 1 }
    out
  }

  case class LshProbes(child: Expression, planes: IndexedSeq[IndexedSeq[Double]],
                       nprobe: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    require(planes.nonEmpty && planes.length <= 64,
      s"plane count must be in [1,64], got ${planes.length}")
    require(nprobe >= 1 && nprobe <= planes.length + 1,
      s"nprobe must be in [1, nbits+1], got $nprobe")

    @transient private lazy val planesArr: Array[Array[Double]] =
      planes.map(_.toArray).toArray

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult =
      if (checkVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"lsh_probes requires array<float|double|int> input, got ${child.dataType}")

    private def dtCode: Int = child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => 0
      case IntegerType => 1
      case _ => 2
    }

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      val arr =
        if (v == null) probesCompute(ArrayData.toArrayData(Array.empty[Double]),
          2, planesArr, nprobe)
        else probesCompute(v.asInstanceOf[ArrayData], dtCode, planesArr, nprobe)
      ArrayData.toArrayData(arr)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
      val c = child.genCode(ctx)
      val planesRef = ctx.addReferenceObj("lshProbePlanes", planesArr, "double[][]")
      val empty = ctx.addReferenceObj("lshProbeEmpty",
        ArrayData.toArrayData(Array.empty[Double]),
        "org.apache.spark.sql.catalyst.util.ArrayData")
      ev.copy(code =
        code"""
          ${c.code}
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
            org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
              graft.functions.VectorExpressions.probesCompute(
                ${c.isNull} ? $empty : ${c.value}, $dtCode, $planesRef, $nprobe));
          """,
        isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "lsh_probes"
  }

  /** Deterministic OPQ-style rotation y = H·D·x / √n: a fixed per-index
    * sign flip (D, Knuth multiplicative hash of the index) followed by the
    * unnormalized fast Walsh–Hadamard transform (H, in-place butterflies)
    * and one division by √n. Orthogonal, self-transpose up to the sign
    * flip, O(n log n) per row, shuffle-free — applied before PQ training/
    * encoding it spreads anisotropic per-dimension energy evenly across
    * the m subspaces (the OPQ effect, Ge et al. CVPR 2013, via the
    * structured-rotation shortcut used by FALCONN-style cross-polytope
    * LSH). On the clustered recall fixture (within-cluster variance
    * concentrated in 2 of 64 dims, i.e. one PQ subspace) it recovers most
    * of the quantization-loss gap: c_pq_rerank 0.6375 → 0.7250 measured,
    * against an exact-dot shortlist ceiling of 0.7875 (SCALE.md r19).
    *
    * Replays exactly in SQL: every output element of each butterfly stage
    * is ONE `a + b` / `a - b` of the previous stage (no reassociation),
    * the sign rule is integer arithmetic, and for n = 64 the final scale
    * √64 = 8 is FP-exact — the DuckDB oracle chains seven
    * `list_transform` CTEs and divides by 8, bit-identical.
    *
    * Requires a power-of-two length (the fixture/registry dim is 64);
    * null ELEMENTS contribute 0 like [[VectorDot]], a null VECTOR yields
    * null. Throws on other lengths — a corrupt row should fail loudly
    * under this engine's ANSI posture, not silently mis-rotate.
    */
  def rotateCompute(vec: ArrayData, dt: Int): Array[Double] = {
    val n = vec.numElements()
    require(n > 0 && (n & (n - 1)) == 0,
      s"vec_rotate requires a power-of-two vector length, got $n")
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x =
        if (vec.isNullAt(i)) 0.0
        else dt match {
          case 0 => vec.getFloat(i).toDouble
          case 1 => vec.getInt(i).toDouble
          case _ => vec.getDouble(i)
        }
      buf(i) = if (((i.toLong * 2654435761L) >> 7 & 1L) == 1L) x else -x
      i += 1
    }
    var h = 1
    while (h < n) {
      var b = 0
      while (b < n) {
        var j = b
        while (j < b + h) {
          val a = buf(j); val c = buf(j + h)
          buf(j) = a + c; buf(j + h) = a - c
          j += 1
        }
        b += 2 * h
      }
      h <<= 1
    }
    val s = math.sqrt(n.toDouble)
    i = 0
    while (i < n) { buf(i) = buf(i) / s; i += 1 }
    buf
  }

  case class VecRotate(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult =
      if (checkVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_rotate requires array<float|double|int> input, got ${child.dataType}")

    private def dtCode: Int = child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => 0
      case IntegerType => 1
      case _ => 2
    }

    override def nullSafeEval(v: Any): Any =
      ArrayData.toArrayData(rotateCompute(v.asInstanceOf[ArrayData], dtCode))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => s"""
        |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        |  graft.functions.VectorExpressions.rotateCompute($v, $dtCode));
        |""".stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "vec_rotate"
  }

  def vec_rotate(vec: Column): Column =
    bridge.column(VecRotate(bridge.expression(vec)))

  def lsh_probes(vec: Column, planes: Seq[Array[Double]], nprobe: Int): Column =
    bridge.column(LshProbes(bridge.expression(vec),
      planes.map(_.toVector).toVector, nprobe))

  def vec_dot(a: Column, b: Column): Column =
    bridge.column(VectorDot(bridge.expression(a), bridge.expression(b)))

  def vec_cosine(a: Column, b: Column): Column =
    bridge.column(VectorCosine(bridge.expression(a), bridge.expression(b)))

  /** Register `vec_dot` / `vec_cosine` as SQL functions on a session, so
    * `spark.sql("SELECT vec_cosine(a, b) ...")` works too.
    */
  private[graft] def binaryBuilder(name: String, mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { children =>
    require(children.size == 2,
      s"$name requires exactly 2 arguments, got ${children.size}")
    mk(children(0), children(1))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    bridge.registerFunction(spark, "vec_dot", binaryBuilder("vec_dot", VectorDot))
    bridge.registerFunction(spark, "vec_cosine", binaryBuilder("vec_cosine", VectorCosine))
  }
}
