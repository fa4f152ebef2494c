package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge — the warehouse history
  * mechanic the reference's full-refresh sinks (SURVEY §2.9: overwrite
  * per run, no history) deliberately skip, and the first thing a company
  * dimension actually needs once records update in place: every business
  * key keeps a row per version, windowed by (valid_from, valid_to] with
  * exactly one open row. Same semantics as a dbt snapshot in `check`
  * strategy (compare tracked attributes, not a timestamp column).
  *
  * Change detection is an md5 over per-attribute md5 tokens: each
  * tracked column becomes `"N"` (SQL NULL) or `"V" || md5(value)` — a
  * fixed-width, prefix-discriminated token — and the row hash is the md5
  * of their concatenation. Tokens carry no value bytes, so no value can
  * impersonate a separator: `("ab","c")` vs `("a","bc")`, NULL vs the
  * empty string, and values containing any control character all hash
  * distinctly (a separator/sentinel scheme collides when a value
  * contains the separator itself — ADVICE r8).
  *
  * Scale shape: the CLOSED slice of history never moves — it is
  * filtered out before the join and unioned back untouched (at 100 TB
  * history dwarfs the open slice; shuffling it per load would be the
  * bottleneck). The only shuffle is ONE equi-join between the open slice
  * and the incoming snapshot on the business key, executed once: all
  * four outcome classes (unchanged / changed / new / deleted) are emitted
  * from a single generate over that join (a per-row array of 0–2 version
  * rows, exploded) — not three filtered re-joins unioned.
  */
object Scd {

  /** Timestamp-free column contract: `valid_from`/`valid_to` are opaque
    * strings supplied by the caller per load (dates, ISO timestamps,
    * batch ids — anything totally ordered), `valid_to` NULL = open. */
  val metaCols: Seq[String] = Seq("valid_from", "valid_to", "is_current")

  private def attrHash(attrCols: Seq[String]): Column =
    md5(concat(attrCols.map { c =>
      when(col(c).isNull, lit("N"))
        .otherwise(concat(lit("V"), md5(col(c).cast("string"))))
    }: _*))

  /** Merge one incoming full snapshot into an SCD2 history.
    *
    * @param history  existing history: key + attr + [[metaCols]] columns
    * @param incoming new snapshot: key + attr columns (one row per key)
    * @param keyCols  business key (non-null by contract)
    * @param attrCols tracked attributes (change in any ⇒ new version)
    * @param stamp    load stamp written to closed `valid_to` / new
    *                 `valid_from`
    * @return the full updated history (closed slice + merged open slice);
    *         keys absent from `incoming` are closed (hard-delete policy —
    *         pass a superset snapshot to keep them open) */
  def scd2Merge(history: DataFrame, incoming: DataFrame,
      keyCols: Seq[String], attrCols: Seq[String],
      stamp: String): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty)
    val outCols = (keyCols ++ attrCols ++ metaCols).map(col)
    val closed = history.filter(!col("is_current")).select(outCols: _*)
    val open = history.filter(col("is_current"))
      .select((keyCols ++ attrCols :+ "valid_from").map(col): _*)
      .withColumn("__oh", attrHash(attrCols))
    val inc = incoming
      .select((keyCols ++ attrCols).map(col): _*)
      .withColumn("__nh", attrHash(attrCols))
      .select(keyCols.map(col) ++
        attrCols.map(c => col(c).as(s"__n_$c")) :+ col("__nh"): _*)
    // ONE shuffle join, executed once: each joined row emits its 0–2
    // version rows through a single generate (array → filter → explode)
    val j = open.join(inc, keyCols, "full_outer")
    val unchanged = col("__oh") === col("__nh")
    val changedOrDel = col("__oh").isNotNull &&
      (col("__nh").isNull || col("__nh") =!= col("__oh"))
    val changedOrNew = col("__nh").isNotNull &&
      (col("__oh").isNull || col("__nh") =!= col("__oh"))
    def version(attrs: Seq[Column], from: Column, to: Column,
        current: Boolean): Column =
      struct(keyCols.map(col) ++
        attrs.zip(attrCols).map { case (c, n) => c.as(n) } :+
        from.as("valid_from") :+ to.as("valid_to") :+
        lit(current).as("is_current"): _*)
    val openNull = lit(null).cast("string")
    val merged = j.select(explode(filter(array(
        when(unchanged,
          version(attrCols.map(col), col("valid_from"), openNull, true)),
        when(changedOrDel,
          version(attrCols.map(col), col("valid_from"), lit(stamp), false)),
        when(changedOrNew,
          version(attrCols.map(c => col(s"__n_$c")), lit(stamp), openNull,
            true))),
        r => r.isNotNull)).as("__v"))
      .select(col("__v.*"))
    closed.unionByName(merged)
  }

  /** Snapshot diff — the CDC primitive upstream of [[scd2Merge]] and of
    * any incremental refresh: classify every business key across two
    * full snapshots as `added` (key only in `after`), `removed` (only
    * in `before`), `changed` (present in both, some tracked column
    * differs), or `unchanged`. Comparison is NULL-SAFE per column
    * (NULL ≡ NULL; NULL vs value is a change) — the semantics
    * `IS DISTINCT FROM` gives an external engine, so the q136 oracle
    * replays the classification exactly.
    *
    * Scale shape: ONE full-outer hash join on the business key; the
    * classification is a pure map over the joined row. Keys are
    * non-null by contract (the [[scd2Merge]] contract). Output is one
    * row per key in either snapshot: keys + `change_type`.
    *
    * For incremental loads, feed `filter(change_type != 'unchanged')`
    * to the writer — at 100 TB the point is shipping the delta, not
    * the snapshot. */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty)
    val b = before.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"__b_$c")) :+
      lit(1).as("__in_b"): _*)
    val a = after.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"__a_$c")) :+
      lit(1).as("__in_a"): _*)
    val differs = compareCols
      .map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduce(_ || _)
    b.join(a, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__in_b").isNull, lit("added"))
          .when(col("__in_a").isNull, lit("removed"))
          .when(differs, lit("changed"))
          .otherwise(lit("unchanged")).as("change_type"): _*)
  }

  /** Upsert-restricted [[snapshotDiff]] — classify ONLY the keys present
    * in `after` (`added` / `changed` / `unchanged`): the per-micro-batch
    * body of the streaming CDC twin
    * ([[graft.streaming.EventStreams.cdcIngest]]), where each batch
    * carries after-image rows for the keys it touched and `removed` is
    * undecidable batch-locally (a key absent from THIS batch may still
    * arrive in the next). Same null-safe per-column comparison as
    * [[snapshotDiff]], so the union of per-batch classifications over
    * key-disjoint batches plus [[removedKeys]] over the full after-side
    * reproduces [[snapshotDiff]] exactly (spec-pinned).
    *
    * Scale shape: one left-outer hash join from the batch to the before
    * snapshot on the business key — a micro-batch is normally tiny next
    * to the snapshot, so AQE broadcasts the batch side and the static
    * before frame is only scanned, never shuffled. */
  def upsertDiff(before: DataFrame, after: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty)
    val b = before.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"__b_$c")) :+
      lit(1).as("__in_b"): _*)
    val a = after.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"__a_$c")): _*)
    val differs = compareCols
      .map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduce(_ || _)
    a.join(b, keyCols, "left_outer")
      .select(keyCols.map(col) :+
        when(col("__in_b").isNull, lit("added"))
          .when(differs, lit("changed"))
          .otherwise(lit("unchanged")).as("change_type"): _*)
  }

  /** The `removed` complement of [[upsertDiff]] once the after-side key
    * universe is known — the end-of-stream (or end-of-day) sweep: every
    * `before` key never seen in `after`, classified `removed`. One
    * left-anti hash join on the business key. */
  def removedKeys(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame =
    before.select(keyCols.map(col): _*).distinct()
      .join(after.select(keyCols.map(col): _*), keyCols, "left_anti")
      .withColumn("change_type", lit("removed"))
}
