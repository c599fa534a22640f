package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Streaming-summary aggregates: bounded-state alternatives to full
  * shuffles for frequency questions.
  *
  * [[MisraGries]] is the classic deterministic heavy-hitters summary
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012): at most `capacity` counters ever exist per
  * aggregation buffer, each update is O(1) amortized, and two summaries
  * merge by counter addition followed by a subtract-the-(capacity+1)th-
  * largest shrink. Guarantees after any partial/merge tree:
  *
  *  - every item with true frequency > n/(capacity+1) is present;
  *  - each reported count is a LOWER bound, short by at most
  *    n/(capacity+1) (n = total items aggregated).
  *
  * When `capacity` >= the number of distinct items, no decrement ever
  * fires and the counts are exact — the regime the oracle-checked query
  * runs in; SketchSpec covers the lossy regime's guarantees.
  *
  * Scale posture: a groupBy-count vocabulary shuffles |distinct| rows per
  * partition; this aggregate ships `capacity` counters per partition to
  * ONE final combine — heavy-hitter questions over 100 TB of tokens move
  * KBs, not the token table. The trade: counts are lower bounds under
  * capacity pressure, and items outside the top-(capacity) band may be
  * absent. Use it for "what dominates this corpus", not exact tf tables.
  */
object SketchExpressions {

  type Summary = mutable.HashMap[String, Long]

  /** Misra-Gries heavy-hitters aggregate over a string column. Result:
    * array<struct<token string, cnt long>> sorted by cnt desc, token asc.
    */
  case class MisraGries(child: Expression, capacity: Int,
                        override val mutableAggBufferOffset: Int = 0,
                        override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SketchExpressions.Summary]
      with UnaryLike[Expression] {

    require(capacity > 0, s"misra_gries capacity must be positive, got $capacity")

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires a string column, got ${child.dataType.catalogString}")

    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("token", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false))),
      containsNull = false)

    override def nullable: Boolean = false

    override def createAggregationBuffer(): Summary = mutable.HashMap.empty

    override def update(buf: Summary, input: InternalRow): Summary = {
      val v = child.eval(input)
      if (v != null) {
        val k = v.asInstanceOf[UTF8String].toString
        buf.get(k) match {
          case Some(c) => buf(k) = c + 1
          case None if buf.size < capacity => buf(k) = 1L
          case None =>
            // classic decrement-all step: every live counter pays 1; the
            // arriving item is absorbed by the decrement, not inserted
            buf.mapValuesInPlace((_, c) => c - 1)
            buf.filterInPlace((_, c) => c > 0)
        }
      }
      buf
    }

    override def merge(a: Summary, b: Summary): Summary = {
      b.foreach { case (k, c) => a(k) = a.getOrElse(k, 0L) + c }
      if (a.size > capacity) {
        // subtract the (capacity+1)-th largest count from everyone; ties at
        // the threshold drop to zero, so at most `capacity` survive
        val thresh = a.values.toArray.sortInPlace()(Ordering[Long].reverse)
          .apply(capacity)
        a.mapValuesInPlace((_, c) => c - thresh)
        a.filterInPlace((_, c) => c > 0)
      }
      a
    }

    override def eval(buf: Summary): Any = {
      val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
      new GenericArrayData(sorted.map { case (t, c) =>
        InternalRow(UTF8String.fromString(t), c)
      })
    }

    override def serialize(buf: Summary): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (k, c) =>
        val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(kb.length); out.write(kb); out.writeLong(c)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Summary = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val kb = new Array[Byte](len)
        in.readFully(kb)
        buf(new String(kb, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): MisraGries =
      copy(child = newChild)
    override def prettyName: String = "misra_gries"
  }

  /** Column form: `misra_gries(col, capacity)` as an aggregate column. */
  def misra_gries(c: Column, capacity: Int): Column =
    bridge.column(MisraGries(bridge.expression(c), capacity)
      .toAggregateExpression())
}
