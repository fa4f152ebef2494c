package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Integer vector arithmetic kernels (r21) — the codegen replacement
  * for the `aggregate(zip_with(a, b, ...))` higher-order-function
  * pattern on the ANN hot paths. Spark's lambda functions (`ZipWith`,
  * `ArrayAggregate`) do not participate in whole-stage codegen: every
  * element pays interpreted lambda-variable binding plus boxing, which
  * made the exact BIGINT distance the dominant per-task cost of the
  * exact-kNN gold pass, NN-Descent scoring, beam search, and the kNN
  * maintenance operators (guide §1.2 step 2 / §4.1: prefer codegen'd
  * kernels over per-element lambdas). One kernel call per row, a tight
  * primitive loop over the unsafe array data inside.
  *
  * Semantics vs the lambda form: identical on every real input (the
  * quantized vectors are same-dimension arrays of non-null longs;
  * overflow wraps exactly like the lambda's long arithmetic). The one
  * deliberate difference: a dimension mismatch or a NULL element —
  * data corruption in these pipelines — FAILS FAST with a clear
  * message instead of `zip_with`'s silent null-padding (which would
  * have surfaced as a null distance swallowed by the downstream
  * bottom-k heap). */
object VecKernel {

  private def checkPair(a: ArrayData, b: ArrayData, op: String): Int = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"$op: vector dimensions differ (${n} vs ${b.numElements()}) " +
          "— quantized vectors must share one dimension")
    n
  }

  /** Σ (a_i − b_i)² over two array<long> vectors — the exact BIGINT
    * squared L2 distance of the quantized-vector convention. */
  def sqL2Long(a: ArrayData, b: ArrayData): Long = {
    val n = checkPair(a, b, "sq_l2_long")
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          "sq_l2_long: NULL vector element — quantized vectors are " +
            "non-null by construction")
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Σ (a_i − b_i)² over two array<double> vectors. The accumulation
    * is LEFT-TO-RIGHT in element order — double addition is not
    * associative, and bit-parity with the `aggregate` sequential fold
    * (and with the DuckDB oracle's replay of it) depends on this
    * order. */
  def sqL2Double(a: ArrayData, b: ArrayData): Double = {
    val n = checkPair(a, b, "sq_l2_double")
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          "sq_l2_double: NULL vector element — vectors are non-null " +
            "by construction")
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Σ a_i · b_i over two array<double> vectors, left-to-right fold
    * order (the [[sqL2Double]] bit-parity argument). */
  def dotDouble(a: ArrayData, b: ArrayData): Double = {
    val n = checkPair(a, b, "dot_double")
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          "dot_double: NULL vector element — vectors are non-null " +
            "by construction")
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Σ a_i · b_i over two array<long> vectors — the exact BIGINT dot
    * product of the quantized-vector convention. */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = checkPair(a, b, "dot_long")
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          "dot_long: NULL vector element — quantized vectors are " +
            "non-null by construction")
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}
