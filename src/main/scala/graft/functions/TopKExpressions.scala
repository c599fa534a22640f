package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded per-group top-k as a mergeable aggregate.
  *
  * The window form (`row_number() over (partition by g order by ord desc)`)
  * sorts EVERY row of every group and shuffles the whole table; this
  * aggregate keeps a k-element heap per aggregation buffer, so the
  * map-side partial combine reduces each partition to at most k rows per
  * group BEFORE the exchange — the shuffle moves O(groups x k), not the
  * table. At 100 TB ("top 5 documents per language by length") that is the
  * difference between shuffling the corpus and shuffling kilobytes.
  *
  * Semantics: keep the k (ord, payload) pairs with the largest ord;
  * ties on ord keep the SMALLEST payload — a total order, so the result
  * is a pure function of the input set (partitioning- and merge-order-
  * independent), which is what makes the window-SQL oracle exact.
  * Null ord or payload rows are ignored (SQL aggregate convention).
  */
object TopKExpressions {

  /** One kept entry: Catalyst internal values for ord and payload. */
  type Entry = (Any, Any)

  /** `top_k_by(ord, payload, k)` -> array<struct<ord, payload>> sorted by
    * (ord desc, payload asc). Ord and payload accept any atomic type with
    * a defined ordering (numerics, string, date, timestamp).
    */
  case class TopKBy(ord: Expression, payload: Expression, k: Int,
                    override val mutableAggBufferOffset: Int = 0,
                    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[TopKExpressions.Entry]]
      with BinaryLike[Expression] {

    require(k > 0, s"top_k_by k must be positive, got $k")

    override def left: Expression = ord
    override def right: Expression = payload

    private def supported(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | StringType | DateType | TimestampType |
           TimestampNTZType => true
      case _ => false
    }

    override def checkInputDataTypes(): TypeCheckResult =
      if (supported(ord.dataType) && supported(payload.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"top_k_by supports atomic orderable columns, got " +
          s"${ord.dataType.catalogString} / ${payload.dataType.catalogString}")

    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("ord", ord.dataType, nullable = false),
        StructField("payload", payload.dataType, nullable = false))),
      containsNull = false)

    override def nullable: Boolean = false

    @transient private lazy val ordOrd: Ordering[Any] =
      TypeUtils.getInterpretedOrdering(ord.dataType)
    @transient private lazy val payOrd: Ordering[Any] =
      TypeUtils.getInterpretedOrdering(payload.dataType)

    /** Heap ordering: the WORST kept entry (smallest ord; ties largest
      * payload) compares greatest, so `head`/`dequeue` is the eviction
      * candidate.
      */
    @transient private lazy val evictOrd: Ordering[Entry] = new Ordering[Entry] {
      def compare(x: Entry, y: Entry): Int = {
        val c = ordOrd.compare(y._1, x._1) // smaller ord => "greater" (worse)
        if (c != 0) c else payOrd.compare(x._2, y._2) // larger payload worse
      }
    }

    override def createAggregationBuffer(): mutable.PriorityQueue[Entry] =
      mutable.PriorityQueue.empty[Entry](evictOrd)

    private def copyVal(v: Any): Any = v match {
      case s: UTF8String => s.clone() // eval may return a view into a reused row
      case other => other
    }

    private def offer(buf: mutable.PriorityQueue[Entry], e: Entry): Unit = {
      if (buf.size < k) buf.enqueue(e)
      else if (evictOrd.compare(e, buf.head) < 0) { // strictly better than worst
        buf.dequeue(); buf.enqueue(e)
      }
    }

    override def update(buf: mutable.PriorityQueue[Entry],
                        input: InternalRow): mutable.PriorityQueue[Entry] = {
      val o = ord.eval(input)
      val p = payload.eval(input)
      if (o != null && p != null) offer(buf, (copyVal(o), copyVal(p)))
      buf
    }

    override def merge(a: mutable.PriorityQueue[Entry],
                       b: mutable.PriorityQueue[Entry]): mutable.PriorityQueue[Entry] = {
      b.foreach(offer(a, _))
      a
    }

    override def eval(buf: mutable.PriorityQueue[Entry]): Any = {
      // best-first: ord desc, payload asc == reverse of the evict ordering
      val sorted = buf.toArray.sorted(evictOrd)
      new GenericArrayData(sorted.map { case (o, p) => InternalRow(o, p) })
    }

    // ------------------------------------------------------ serialization

    private def writeVal(dt: DataType, v: Any,
                         out: java.io.DataOutputStream): Unit = dt match {
      case ByteType => out.writeByte(v.asInstanceOf[Byte].toInt)
      case ShortType => out.writeShort(v.asInstanceOf[Short].toInt)
      case IntegerType | DateType => out.writeInt(v.asInstanceOf[Int])
      case LongType | TimestampType | TimestampNTZType =>
        out.writeLong(v.asInstanceOf[Long])
      case FloatType => out.writeFloat(v.asInstanceOf[Float])
      case DoubleType => out.writeDouble(v.asInstanceOf[Double])
      case StringType =>
        val b = v.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

    private def readVal(dt: DataType, in: java.io.DataInputStream): Any = dt match {
      case ByteType => in.readByte()
      case ShortType => in.readShort()
      case IntegerType | DateType => in.readInt()
      case LongType | TimestampType | TimestampNTZType => in.readLong()
      case FloatType => in.readFloat()
      case DoubleType => in.readDouble()
      case StringType =>
        val b = new Array[Byte](in.readInt()); in.readFully(b)
        UTF8String.fromBytes(b)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

    override def serialize(buf: mutable.PriorityQueue[Entry]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (o, p) =>
        writeVal(ord.dataType, o, out); writeVal(payload.dataType, p, out)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Entry] = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) {
        buf.enqueue((readVal(ord.dataType, in), readVal(payload.dataType, in)))
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): TopKBy =
      copy(ord = newLeft, payload = newRight)
    override def prettyName: String = "top_k_by"
  }

  /** Column form: `top_k_by(ord, payload, k)` as an aggregate column. */
  def top_k_by(ord: Column, payload: Column, k: Int): Column =
    bridge.column(TopKBy(bridge.expression(ord), bridge.expression(payload), k)
      .toAggregateExpression())
}
