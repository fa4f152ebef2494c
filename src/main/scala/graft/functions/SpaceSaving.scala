package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters summary as a bounded-state
  * `TypedImperativeAggregate` (Metwally et al. 2005, "Efficient
  * computation of frequent and top-k elements in data streams"; merge
  * rule from Agarwal et al. 2012, "Mergeable summaries"): at most
  * `capacity` (item, count, err) counters per group. An item seen when
  * the table is full evicts the minimum-count counter and inherits its
  * count as `err` (the classic overestimate bound: true count ∈
  * [count − err, count]); merging sums matching counters and keeps the
  * top `capacity` by count. Every item with true frequency >
  * N/capacity is guaranteed present.
  *
  * State is ≤ capacity counters regardless of group size or domain —
  * the 100 TB story: frequent-item discovery over an unbounded token
  * domain costs a constant-size buffer per group instead of a full
  * (group, item) aggregation, and buffers partial-aggregate on the map
  * side like any other agg.
  *
  * Exactness gate: when a group's DISTINCT item count is ≤ capacity no
  * eviction ever fires, every `err` is 0, counts are exact, and the
  * result is a pure function of the input multiset — merge-order
  * independent and therefore engine-reproducible (the q96 oracle runs in
  * this regime; a plain GROUP BY count replicates it). Past capacity the
  * counter SET depends on partition order (inherent to the sketch); the
  * frequency guarantees above still hold and are spec-asserted.
  *
  * Output: `array<struct<item:string, cnt:bigint, err:bigint>>` sorted
  * by (cnt desc, item asc).
  */
case class SpaceSaving(
    itemExpr: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]] {

  require(capacity >= 1, "capacity must be >= 1")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "space_saving"

  override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]]()

  // the minimum counter by (count, then item order — deterministic
  // eviction among ties)
  private def minEntry(buf: java.util.HashMap[String, Array[Long]]): String = {
    var minItem: String = null
    var minCount = Long.MaxValue
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c < minCount || (c == minCount &&
          (minItem == null || e.getKey < minItem))) {
        minCount = c; minItem = e.getKey
      }
    }
    minItem
  }

  override def update(
      buf: java.util.HashMap[String, Array[Long]],
      input: InternalRow): java.util.HashMap[String, Array[Long]] = {
    val v = itemExpr.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(item)
      if (cur != null) cur(0) += 1L
      else if (buf.size < capacity) buf.put(item, Array(1L, 0L))
      else {
        val evict = minEntry(buf)
        val minCount = buf.get(evict)(0)
        buf.remove(evict)
        buf.put(item, Array(minCount + 1L, minCount))
      }
    }
    buf
  }

  override def merge(
      a: java.util.HashMap[String, Array[Long]],
      b: java.util.HashMap[String, Array[Long]]): java.util.HashMap[String, Array[Long]] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
      else a.put(e.getKey, e.getValue().clone())
    }
    if (a.size > capacity) {
      // keep the top `capacity` by (count desc, item asc) — the
      // mergeable-summaries rule
      val keep = sortedEntries(a).take(capacity).map(_._1).toSet
      val rm = new java.util.ArrayList[String]()
      val kit = a.keySet().iterator()
      while (kit.hasNext) { val k = kit.next(); if (!keep(k)) rm.add(k) }
      rm.forEach(k => { a.remove(k); () })
    }
    a
  }

  private def sortedEntries(
      buf: java.util.HashMap[String, Array[Long]]): Seq[(String, Array[Long])] = {
    import scala.jdk.CollectionConverters._
    buf.asScala.toSeq.sortBy { case (item, ce) => (-ce(0), item) }
  }

  override def eval(buf: java.util.HashMap[String, Array[Long]]): Any =
    new GenericArrayData(sortedEntries(buf).map { case (item, ce) =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(item), ce(0), ce(1)))
    }.toArray[Any])

  override def serialize(buf: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue()(0))
      out.writeLong(e.getValue()(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Array[Long]]()
    (0 until n).foreach { _ =>
      val item = in.readUTF()
      buf.put(item, Array(in.readLong(), in.readLong()))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSaving =
    copy(itemExpr = newChildren(0))
}

object SpaceSaving {
  /** Column form: `df.groupBy(g).agg(space_saving(item, 64))`. */
  def space_saving(item: Column, capacity: Int): Column =
    Bridge.column(
      SpaceSaving(Bridge.expression(item), capacity).toAggregateExpression())
}
