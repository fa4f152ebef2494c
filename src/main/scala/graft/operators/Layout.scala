package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional clustering at write time.
  *
  * A 100 TB table queried on two independent columns can't be
  * range-partitioned on both — the Z-order (Morton) key interleaves the
  * bit patterns so rows close in EITHER dimension land in the same
  * range bucket, and min/max file statistics prune scans on both
  * predicates (the technique behind Delta/Iceberg `ZORDER BY`).
  *
  * The key is a pure integer bit-shuffle built from builtin shift/and
  * expressions — codegen'd, map-only, and reproducible in any engine
  * with `>>` and `&` (the q89 oracle re-derives it in DuckDB from the
  * same bit-count parameter). Production write path:
  * `df.repartitionByRange(n, col("zkey"))` + parquet — range boundaries
  * come from sampling, so THAT step is not byte-deterministic; the
  * oracle-gated query uses an explicit `ntile` window instead (exact,
  * but a global sort — fine at verification scale, replaced by
  * repartitionByRange at production scale). */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: bit i of `a` → bit 2i, bit i of `b` → bit 2i+1.
    * Monotone in each dimension within fixed high bits, so 2-D
    * locality survives the linearization. */
  def zorderKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The SQL twin of [[zorderKey]] over column expressions `a`/`b` —
    * generated from the SAME `bits` parameter so the oracle and the
    * Spark plan can never disagree on the bit layout. */
  def zorderKeySql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i)}) + " +
        s"((($b >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")
}
