package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a bounded-state
  * `TypedImperativeAggregate` (Bar-Yossef et al. 2002, "Counting distinct
  * elements in a data stream"): keep the k smallest DISTINCT hash keys
  * per group. If fewer than k distinct keys exist the sketch IS the exact
  * distinct count; otherwise the k-th smallest key R_k estimates the
  * distinct count as (k-1) / (R_k / 2^60) with relative error
  * ~1/sqrt(k-2).
  *
  * State is a TreeSet of at most k longs — constant per group regardless
  * of group size, partial-aggregation friendly (executors pre-reduce,
  * buffers merge by set union capped at k), and DETERMINISTIC: unlike
  * HLL++ register sketches the result is a pure function of the distinct
  * key set, so with an md5-derived key (see
  * [[graft.operators.Sampling.portableKey]]) any md5-capable engine
  * reproduces the sketch exactly (`ORDER BY hash LIMIT k` over distinct
  * values) — the property that lets the DuckDB oracle hash-verify the
  * estimate, which no engine-internal HLL allows.
  *
  * Output: `array<bigint>`, the ≤k retained keys ascending.
  */
case class KmvSketch(
    keyExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 1, "k must be > 1")

  override def children: Seq[Expression] = Seq(keyExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], key: Long): Unit = {
    if (buf.size < k) { buf.add(key); () }
    else if (key < buf.last()) {
      // only evict when the new key actually entered (duplicates return
      // false and must not shrink the sketch)
      if (buf.add(key)) { buf.remove(buf.last()); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val keyVal = keyExpr.eval(input)
    if (keyVal != null) insert(buf, keyVal.asInstanceOf[Long])
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator() // ascending
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    (0 until n).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(keyExpr = newChildren(0))
}

object KmvSketch {
  /** Column form: `df.groupBy(g).agg(kmv_sketch(hash_key, 64))`. */
  def kmv_sketch(key: Column, k: Int): Column =
    Bridge.column(KmvSketch(Bridge.expression(key), k).toAggregateExpression())
}
