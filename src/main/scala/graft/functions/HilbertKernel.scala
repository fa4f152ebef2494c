package graft.functions

/** Hilbert-curve linearization (Hilbert 1891; the xy2d walk as given in
  * Warren, Hacker's Delight §16 and the classic Wikipedia C form): map a
  * cell of the 2^bits × 2^bits grid to its distance along the
  * space-filling curve. Unlike the Morton/Z-order interleave
  * ([[graft.operators.Layout.zorderKey]]), CONSECUTIVE Hilbert indices
  * are always 4-neighbors on the grid (no Z-shaped jumps), so range
  * buckets of the key hold tighter 2-D rectangles — better min/max
  * pruning for the same bucket count (the reason Hilbert is the
  * higher-end choice in layout engines).
  *
  * A per-level loop carries rotation state, so a builtin-column
  * formulation duplicates the (x, y) expression tree ~3× per level —
  * exponential in `bits` — which is why this is a JVM kernel behind a
  * codegen [[HilbertKey]] expression (the [[AbnKernel]] pattern), not a
  * shift/and column like Z-order. Inputs are masked to the low `bits`
  * bits (callers reduce their dimensions first; the mask makes the
  * kernel total).
  */
object HilbertKernel {
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
