package graft.operators
// (rendezvous routing lives here with the layout/placement family)

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Hilbert-curve key of two reduced dimensions — [[zorderKey]]'s
    * higher-locality sibling: consecutive key values are always grid
    * 4-neighbors (no Z-jumps), so a range bucket of the key covers a
    * tighter 2-D rectangle and min/max file stats prune better at the
    * same bucket count. Same write path (`repartitionByRange` on the
    * key); same reduced-dimension contract (values masked to `bits`
    * bits). A codegen JVM kernel ([[graft.functions.HilbertKernel]])
    * because the per-level rotation makes a builtin-column form
    * exponential in `bits`. */
  def hilbertKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    graft.functions.exprs.hilbert_key(a.cast("long"), b.cast("long"), bits)
  }

  /** The SQL twin of [[hilbertKey]] as a CTE CHAIN (one level per CTE,
    * carrying (x, y, d) — linear, where a single expression would
    * duplicate subtrees exponentially). `srcCte` must expose columns
    * `x`, `y` (already reduced to `bits` bits) plus `keep` — the
    * caller's pass-through columns, comma-joined. Returns the CTE body
    * list; the final CTE `h$bits` holds (keep, d). XOR is spelled
    * arithmetically (3rx + ry − 2·(3rx)·ry/3 … simplified to
    * 3*rx + ry - 2*rx*ry, exact on 0/1 bits) so no engine-specific
    * XOR operator is needed. */
  def hilbertCtesSql(srcCte: String, keep: String, bits: Int): String = {
    val n = 1L << bits
    val levels = (0 until bits).map { j =>
      val i = bits - 1 - j
      val s = 1L << i
      val rx = s"((x >> $i) & 1)"
      val ry = s"((y >> $i) & 1)"
      s"""h${j + 1} AS (
      SELECT $keep,
        CASE WHEN $ry = 0 THEN
          CASE WHEN $rx = 1 THEN ${n - 1} - y ELSE y END
        ELSE x END AS x,
        CASE WHEN $ry = 0 THEN
          CASE WHEN $rx = 1 THEN ${n - 1} - x ELSE x END
        ELSE y END AS y,
        d + ${s * s} * (3 * $rx + $ry - 2 * $rx * $ry) AS d
      FROM h$j)"""
    }.mkString(", ")
    s"""h0 AS (SELECT $keep, x, y, CAST(0 AS BIGINT) AS d FROM $srcCte),
    $levels"""
  }

  /** Exact equal-fill range buckets over a TOTAL order — `ntile(n)`
    * semantics (the first `N mod n` buckets take one extra row)
    * WITHOUT the single-partition global window `ntile` plans to: the
    * global 1-based row number comes from
    * [[Ranks.globalRowNumber]] (range exchange + per-partition rank +
    * broadcast one-row-per-partition offsets — the named scale shape),
    * the total count is one bounded aggregate attached by broadcast,
    * and the bucket is pure arithmetic on (rank, N). Bit-exact ntile:
    * with q = N/n and m = N mod n, ranks ≤ m·(q+1) land in bucket
    * ⌈rank/(q+1)⌉ and the rest in m + ⌈(rank − m·(q+1))/q⌉. This is
    * the oracle-checkable layout-bucketing form (q89/q149) — the
    * write path itself would `repartitionByRange(n, key)`, whose
    * sampled boundaries are not byte-deterministic. */
  def rangeBuckets(df: DataFrame, order: Seq[Column], nBuckets: Int,
      out: String): DataFrame =
    rangeBuckets(df, order, nBuckets, out,
      // parameterised scale knob with a local-safe default (guide §2:
      // scale-adaptive, not a constant tuned for either mode): below
      // the threshold the frame provably fits one task
      df.sparkSession.conf.getOption("spark.graft.globalRank.small")
        .map(_.toLong).getOrElse(1L << 17))

  /** Size-adaptive form (r21): `rangeBuckets` needs the exact row
    * count N for the ntile arithmetic anyway, so it is computed FIRST
    * and picks the rank machinery by it — the strategy choice Spark
    * itself makes for broadcast-vs-shuffle joins, applied to global
    * ranking:
    *
    *   - N ≤ `smallThreshold`: ONE packed sorted array (the
    *     [[Ranks]] runningOffsets idiom) — a single bounded task
    *     sorts the (narrow) rows, no range exchange, no sampling
    *     pass, no checkpoint. This is NOT the banned global window:
    *     the input is count-proven to fit one task, the same bound
    *     class as a broadcast relation, and there is a distributed
    *     fallback the moment it doesn't.
    *   - N > threshold: [[Ranks.globalRowNumber]] — the distributed
    *     range-exchange rank (the named scale shape).
    *
    * Both paths implement the same total-order row_number and the
    * same bucket arithmetic, so the output is bit-identical
    * (spec-pinned across the threshold in LayoutSpec). Rows must be
    * sort-comparable (no map columns) on the small path — true of
    * every caller (narrow long/double/string layout frames). */
  def rangeBuckets(df: DataFrame, order: Seq[Column], nBuckets: Int,
      out: String, smallThreshold: Long): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val (ranked, n) = graft.operators.Ranks.globalRowNumberAdaptive(
      df, order, "__gr", Some(smallThreshold))
    val q = n / nBuckets
    val m = n % nBuckets
    // same exact ntile arithmetic as before, with (N, q, m) folded in
    // as driver literals; `div` is BIGINT division. The q = 0 branch
    // guard: with N < nBuckets every rank satisfies the first branch
    // (m = N), so the `div ${max(q,1)}` divisor is never consulted —
    // it exists only to keep the constant expression well-formed.
    ranked
      .withColumn(out,
        when(col("__gr") <= m * (q + 1L),
          expr(s"(__gr - 1) div ${q + 1}L + 1"))
          .otherwise(expr(
            s"${m}L + (__gr - ${m * (q + 1)}L - 1) div ${
              math.max(q, 1L)}L + 1"))
          .cast("long"))
      .drop("__gr")
  }

  /** Rendezvous (highest-random-weight) routing — Thaler & Ravishankar
    * 1998 (IEEE/ACM ToN, "Using name-based mappings to increase hit
    * rates"): a row routes to argmax over workers of
    * md5(id:worker) — no ring, no bucket table, and the DEFINING
    * property: when the worker set changes, ONLY rows whose argmax is
    * the added/removed worker move (expected 1/(n+1) of the corpus on
    * grow-by-one; everything else keeps its old argmax). The placement
    * primitive behind incremental ingest routing, sticky shard
    * assignment, and cache affinity — consistent hashing without the
    * virtual-node machinery.
    *
    * Deterministic md5 keys (ties impossible up to md5 collisions,
    * broken by worker name) make the assignment engine-replayable —
    * q176 hash-verifies the routing AND the resize-movement report.
    * Map-only: workers fold in as literals, cost O(|workers|) per row
    * (fine for catalog-sized worker sets; for thousands of shards use
    * [[zorderKey]]-style range splits instead). */
  def rendezvousAssign(id: Column, workers: Seq[String]): Column = {
    require(workers.nonEmpty && workers.distinct.size == workers.size,
      "workers must be nonempty and distinct")
    array_max(array(workers.map { w =>
      struct(graft.functions.PortableHash.md5Long60(
        concat(id.cast("string"), lit(s":$w"))).as("k"),
        lit(w).as("w"))
    }: _*)).getField("w")
  }
}
