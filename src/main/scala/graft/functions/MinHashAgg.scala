package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregate (`Aggregator[IN, BUF, OUT]`, SURVEY.md §2.9
  * north-star): merge per-document MinHash signatures into a GROUP-level
  * signature by element-wise minimum.
  *
  * Because min() commutes with set union, the aggregated signature equals
  * the signature of the union of all member shingle sets — so two groups'
  * aggregated signatures estimate the Jaccard similarity of their whole
  * corpora. Useful for source-vs-source / shard-vs-shard overlap scans
  * without pairwise document comparison. Partial-aggregation friendly
  * (map-side combine on executors; buffer is a fixed k-long array).
  */
class MinHashAgg(k: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < k && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object MinHashAgg {
  /** Untyped column form for DataFrame.agg:
    * `df.groupBy("src").agg(MinHashAgg.group_minhash(k)(col("sig")))`. */
  def group_minhash(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MinHashAgg(k), ExpressionEncoder[Seq[Long]]())

  /** Estimated Jaccard between two equal-length signature columns:
    * fraction of agreeing components. */
  def estimatedJaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    size(filter(zip_with(a, b, (x, y) => x === y), p => p))
      .cast("double") / size(a)
  }
}
