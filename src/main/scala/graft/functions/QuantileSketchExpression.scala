package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Bounded-state quantile summary: a deterministic multi-level compactor
  * in the Munro-Paterson / MRL / KLL family (Manku, Rajagopalan &
  * Lindsay, SIGMOD 1998; Karnin, Lang & Liberty, FOCS 2016 — with KLL's
  * coin flip derandomized to an alternating per-level parity, which
  * keeps the MRL-style deterministic error bound).
  *
  * State is a stack of level buffers, each holding at most `capacity`
  * values; an item in level i represents 2^i input items. A full level
  * sorts, pairs neighbors, and promotes one element of each pair
  * (alternating which side by a per-level parity counter) to the level
  * above — total represented weight is conserved exactly, so ranks are
  * computed against the true count. Per-buffer memory is
  * O(capacity * log(n/capacity)); merge is level-wise concatenation plus
  * the same compaction — a mergeable summary in the Agarwal et al.
  * (PODS 2012) sense, usable identically as a batch aggregate or as
  * streaming-aggregation state.
  *
  * Guarantees: with no compaction (n <= capacity) the summary is the
  * exact sorted sample and every quantile is the true nearest-rank
  * (ceil convention) statistic — the regime the oracle-checked query
  * runs in, independent of partitioning and merge order. Under
  * compaction the rank error of an answer is bounded by the number of
  * compactions weighted by their level (O(log^2(n/capacity)/capacity)
  * relative rank error) — QuantileSketchSpec measures it.
  *
  * Versus the exact profiler ([[graft.ops.Profiler]] rank-select): exact
  * quantiles at 100 TB cost a full shuffle of the column (or
  * driver-coordinated rank probes); this summary ships
  * O(capacity * log n) doubles per partition to one combine — the
  * scale path for "p99 document length per source" questions, with the
  * exact path kept for audits.
  */
object QuantileSketchExpression {

  /** Compactor stack: levels(i) holds weight-2^i values; parity(i) counts
    * compactions at level i (its low bit picks which side of each pair
    * survives). `count` is the exact number of update()s absorbed.
    */
  final class QSketch {
    val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty)
    val parity: ArrayBuffer[Int] = ArrayBuffer(0)
    var count: Long = 0L
  }

  /** `mrl_quantiles(x, capacity, probs)` -> array<double> of nearest-rank
    * (ceil) quantile estimates, one per requested probability.
    */
  case class MrlQuantiles(child: Expression, capacity: Int, probs: Seq[Double],
                          override val mutableAggBufferOffset: Int = 0,
                          override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QSketch] with UnaryLike[Expression] {

    require(capacity >= 8, s"mrl_quantiles capacity must be >= 8, got $capacity")
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
      s"mrl_quantiles probs must lie in (0, 1], got $probs")

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"mrl_quantiles requires a double column (cast upstream), got " +
          child.dataType.catalogString)

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = false

    override def createAggregationBuffer(): QSketch = new QSketch

    private def ensureLevel(s: QSketch, i: Int): Unit =
      while (s.levels.size <= i) { s.levels += ArrayBuffer.empty; s.parity += 0 }

    /** Sort level i, promote one element of each neighbor pair (side picked
      * by the level's alternating parity), keep an odd leftover (the max)
      * in place. Weight is conserved: 2m weight-w items become m
      * weight-2w items (+ leftover).
      */
    private def compact(s: QSketch, i: Int): Unit = {
      val buf = s.levels(i)
      val arr = buf.toArray
      java.util.Arrays.sort(arr)
      val side = s.parity(i) & 1
      s.parity(i) += 1
      ensureLevel(s, i + 1)
      val pairs = arr.length / 2
      val up = s.levels(i + 1)
      var p = 0
      while (p < pairs) { up += arr(2 * p + side); p += 1 }
      buf.clear()
      if (arr.length % 2 == 1) buf += arr(arr.length - 1)
      if (up.length >= capacity) compact(s, i + 1)
    }

    override def update(s: QSketch, input: InternalRow): QSketch = {
      val v = child.eval(input)
      if (v != null) {
        s.count += 1
        s.levels(0) += v.asInstanceOf[Double]
        if (s.levels(0).length >= capacity) compact(s, 0)
      }
      s
    }

    override def merge(a: QSketch, b: QSketch): QSketch = {
      a.count += b.count
      var i = 0
      while (i < b.levels.size) {
        ensureLevel(a, i)
        a.levels(i) ++= b.levels(i)
        a.parity(i) += b.parity(i)
        i += 1
      }
      i = 0
      while (i < a.levels.size) { // cascade bottom-up; compact() may grow the stack
        if (a.levels(i).length >= capacity) compact(a, i)
        i += 1
      }
      a
    }

    override def eval(s: QSketch): Any = {
      if (s.count == 0L) return new GenericArrayData(probs.map(_ => Double.NaN).toArray)
      // weighted nearest-rank select over (value, 2^level) pairs
      val n = s.levels.map(_.length).sum
      val vs = new Array[Double](n)
      val ws = new Array[Long](n)
      var idx = 0
      var lvl = 0
      while (lvl < s.levels.size) {
        val w = 1L << lvl
        val buf = s.levels(lvl)
        var j = 0
        while (j < buf.length) { vs(idx) = buf(j); ws(idx) = w; idx += 1; j += 1 }
        lvl += 1
      }
      val order = Array.range(0, n).sortBy(i => vs(i))
      val total = ws.sum // == s.count by weight conservation
      val out = probs.map { p =>
        val target = math.max(1L, math.ceil(p * total).toLong)
        var cum = 0L
        var k = 0
        var ans = vs(order(n - 1))
        var found = false
        while (k < n && !found) {
          cum += ws(order(k))
          if (cum >= target) { ans = vs(order(k)); found = true }
          k += 1
        }
        ans
      }.toArray
      new GenericArrayData(out)
    }

    override def serialize(s: QSketch): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeLong(s.count)
      out.writeInt(s.levels.size)
      var i = 0
      while (i < s.levels.size) {
        out.writeInt(s.parity(i))
        val buf = s.levels(i)
        out.writeInt(buf.length)
        var j = 0
        while (j < buf.length) { out.writeDouble(buf(j)); j += 1 }
        i += 1
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): QSketch = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val s = new QSketch
      s.count = in.readLong()
      val nLevels = in.readInt()
      ensureLevel(s, nLevels - 1)
      var i = 0
      while (i < nLevels) {
        s.parity(i) = in.readInt()
        val len = in.readInt()
        var j = 0
        while (j < len) { s.levels(i) += in.readDouble(); j += 1 }
        i += 1
      }
      s
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): MrlQuantiles =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MrlQuantiles =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): MrlQuantiles =
      copy(child = newChild)
    override def prettyName: String = "mrl_quantiles"
  }

  /** Column form; casts the input to double (quantiles are rank statistics
    * — exact for integral inputs up to 2^53).
    */
  def mrl_quantiles(c: Column, capacity: Int, probs: Seq[Double]): Column =
    bridge.column(MrlQuantiles(bridge.expression(c.cast("double")), capacity, probs)
      .toAggregateExpression())
}
