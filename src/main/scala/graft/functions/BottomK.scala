package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k aggregate (`TypedImperativeAggregate`): keeps the k rows with
  * the SMALLEST long key per group in a bounded heap — constant state per
  * group regardless of group size, partial-aggregation friendly
  * (executors pre-reduce, buffers merge).
  *
  * With `key = xxhash64(id)` this is a deterministic uniform sample
  * (bottom-k sketch): mergeable, reproducible, no `rand()` re-execution
  * hazards — the training-data sampling primitive
  * ([[graft.operators.Sampling]]).
  *
  * Output: `array<struct<key: bigint, value: string>>`, ascending by
  * (key, value): the value participates in the ordering, so equal keys
  * (hash collisions) resolve by lexicographic value compare instead of
  * partition arrival order — the result is deterministic even when the
  * key hash collides, and an external oracle reproduces it with
  * `ORDER BY key, CAST(value AS VARCHAR)`.
  */
case class BottomK(
    keyExpr: Expression,
    valueExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, UTF8String)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(keyExpr, valueExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("value", StringType))), containsNull = false)
  override def prettyName: String = "bottom_k"

  // total order on (key, value); null values sort first so they can never
  // displace a real value under an equal key
  private val kvOrdering: Ordering[(Long, UTF8String)] =
    new Ordering[(Long, UTF8String)] {
      override def compare(x: (Long, UTF8String), y: (Long, UTF8String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else if (x._2 eq null) { if (y._2 eq null) 0 else -1 }
        else if (y._2 eq null) 1
        else x._2.compareTo(y._2)
      }
    }

  // max-heap on (key, value): the head is the largest retained entry,
  // evicted first
  private def newHeap() =
    mutable.PriorityQueue.empty[(Long, UTF8String)](kvOrdering)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, UTF8String)] =
    newHeap()

  override def update(
      buf: mutable.PriorityQueue[(Long, UTF8String)],
      input: InternalRow): mutable.PriorityQueue[(Long, UTF8String)] = {
    val keyVal = keyExpr.eval(input)
    if (keyVal != null) {
      val key = keyVal.asInstanceOf[Long]
      // cheap key-only gate first; the value is only evaluated when the
      // key alone cannot reject the row (admissible or tied with head)
      if (buf.size < k || key <= buf.head._1) {
        val v = valueExpr.eval(input)
        val vCopy = if (v == null) null
          else v.asInstanceOf[UTF8String].clone() // unsafe rows are reused
        val kv = (key, vCopy)
        if (buf.size < k || kvOrdering.lt(kv, buf.head)) {
          buf.enqueue(kv)
          if (buf.size > k) buf.dequeue()
        }
      }
    }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Long, UTF8String)],
      b: mutable.PriorityQueue[(Long, UTF8String)]): mutable.PriorityQueue[(Long, UTF8String)] = {
    b.foreach { kv =>
      if (a.size < k || kvOrdering.lt(kv, a.head)) {
        a.enqueue(kv)
        if (a.size > k) a.dequeue()
      }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Long, UTF8String)]): Any = {
    val sorted = buf.toArray.sorted(kvOrdering)
    new GenericArrayData(sorted.map { case (key, v) =>
      InternalRow(key, v): Any
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, UTF8String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, v) =>
      out.writeLong(key)
      if (v == null) out.writeInt(-1)
      else {
        val bytes = v.getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = newHeap()
    (0 until n).foreach { _ =>
      val key = in.readLong()
      val len = in.readInt()
      val v = if (len < 0) null else {
        val b = new Array[Byte](len)
        in.readFully(b)
        UTF8String.fromBytes(b)
      }
      heap.enqueue((key, v))
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomK =
    copy(keyExpr = newChildren(0), valueExpr = newChildren(1))
}

object BottomK {
  /** Column form: `df.groupBy(g).agg(bottom_k(key, value, 100))`. */
  def bottom_k(key: Column, value: Column, k: Int): Column =
    Bridge.column(BottomK(Bridge.expression(key),
      Bridge.expression(value.cast("string")), k)
      .toAggregateExpression())
}
