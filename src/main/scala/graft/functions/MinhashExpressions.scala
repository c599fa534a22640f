package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the MinHash signature hot path.
  *
  * The higher-order-function composition (`aggregate` over `zip_with` of a
  * k-wide literal array) UNROLLS the k hash functions into generated code
  * — ~14s of one-time Janino compilation at k=64 monolithic, still ~4.5s
  * after 8-wide chunking (SCALE.md). This expression keeps the family
  * constants as runtime arrays and loops — the generated method is a
  * single static call, so compile cost is nil and the warm path is a
  * JIT-compiled primitive loop instead of interpreted lambda evaluation.
  *
  * Value parity with the HOF form is exact (MinhashExpressionsSpec): same
  * xxhash64 (seed 42, Spark's own XXH64), same Mersenne-prime linear
  * family ([[hashFamily]] — the single source TextDedup also uses), same
  * null-element semantics (Spark's xxhash64(null) = seed).
  */
object MinhashExpressions {

  /** Mersenne prime 2^31-1: keeping a, b, h below it bounds every product
    * under 2^62 — no overflow.
    */
  val MersenneP = 2147483647L

  /** Spark's xxhash64 default seed. */
  val XxSeed = 42L

  /** Deterministic (a, b) pairs for the universal hash family mod 2^31-1 —
    * THE family: TextDedup's HOF composition derives from the same call.
    */
  def hashFamily(k: Int): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(987654321L)
    Seq.fill(k)((rng.nextInt((MersenneP - 1).toInt).toLong + 1L,
      rng.nextInt(MersenneP.toInt).toLong))
  }

  /** One pass over the shingle array: h = pmod(xxhash64(s), P); each
    * accumulator takes min(acc_j, (h*a_j + b_j) mod P). All operands
    * non-negative after the pmod, so plain % suffices in the loop. A null
    * element hashes to the seed (Spark xxhash64(null) semantics); an empty
    * array yields Long.MaxValue accumulators — both matching the HOF form.
    */
  def compute(arr: ArrayData, a: Array[Long], b: Array[Long]): GenericArrayData = {
    val k = a.length
    val acc = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val raw =
        if (arr.isNullAt(i)) XxSeed
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, XxSeed)
        }
      val h = ((raw % MersenneP) + MersenneP) % MersenneP
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % MersenneP
        if (v < acc(j)) acc(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  /** [[compute]] tracking the second-smallest DISTINCT value per hash
    * function alongside the minimum: one pass, output length 2k — slots
    * 0..k-1 are the signature (bit-identical to [[compute]]), slots
    * k..2k-1 the runner-ups. The runner-up is the multi-probe LSH lever
    * for minhash ([[graft.streaming.LshStream]]'s tag): when a near-dup
    * corpus doc lacks exactly the shingle that won hash j for the query,
    * its own minimum over the intersection is most often the query's
    * second-smallest, so probing the bucket with slot j substituted
    * recovers the single-slot banding misses. Values EQUAL to the current
    * minimum do not advance the runner-up (repeated windows of the same
    * shingle are the common case and probe nothing new); a document with
    * one distinct shingle value keeps Long.MaxValue there — its probe
    * bucket is a miss by construction, never a false pair (the tag
    * verifies with exact Jaccard anyway).
    */
  def compute2(arr: ArrayData, a: Array[Long], b: Array[Long]): GenericArrayData = {
    val k = a.length
    val acc = Array.fill(2 * k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val raw =
        if (arr.isNullAt(i)) XxSeed
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, XxSeed)
        }
      val h = ((raw % MersenneP) + MersenneP) % MersenneP
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % MersenneP
        if (v < acc(j)) { acc(k + j) = acc(j); acc(j) = v }
        else if (v > acc(j) && v < acc(k + j)) acc(k + j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  case class MinhashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression {
    private val fam = hashFamily(numHashes)
    private val aArr: Array[Long] = fam.map(_._1).toArray
    private val bArr: Array[Long] = fam.map(_._2).toArray

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_signature requires array<string> input, got $other")
    }

    override def nullSafeEval(v: Any): Any =
      compute(v.asInstanceOf[ArrayData], aArr, bArr)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
        val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
        s"${ev.value} = graft.functions.MinhashExpressions.compute($c, $aRef, $bRef);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "minhash_signature"
  }

  def minhash_signature(shingles: Column, numHashes: Int): Column =
    bridge.column(MinhashSignature(bridge.expression(shingles), numHashes))

  /** The [[compute2]] form: same family, same loop shape, 2k output. */
  case class MinhashSignature2(child: Expression, numHashes: Int)
      extends UnaryExpression {
    private val fam = hashFamily(numHashes)
    private val aArr: Array[Long] = fam.map(_._1).toArray
    private val bArr: Array[Long] = fam.map(_._2).toArray

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_signature2 requires array<string> input, got $other")
    }

    override def nullSafeEval(v: Any): Any =
      compute2(v.asInstanceOf[ArrayData], aArr, bArr)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val aRef = ctx.addReferenceObj("minhash2A", aArr, "long[]")
        val bRef = ctx.addReferenceObj("minhash2B", bArr, "long[]")
        s"${ev.value} = graft.functions.MinhashExpressions.compute2($c, $aRef, $bRef);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "minhash_signature2"
  }

  def minhash_signature2(shingles: Column, numHashes: Int): Column =
    bridge.column(MinhashSignature2(bridge.expression(shingles), numHashes))
}
