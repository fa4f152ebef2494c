package graft.model

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** One persistence convention for every multi-frame index artifact the
  * engine ships (the LSH corpus index, the IVF/embedding indexes, the
  * suffix-array tables): a generation-stamped directory layout with a
  * crash-atomic commit marker.
  *
  * Layout: `root/g<N>/<frame>` parquet directories plus
  * `root/g<N>/params` — a ONE-ROW table carrying the index's scalar
  * parameters. The params table is written LAST, INSIDE the generation
  * directory, and is the commit marker: a generation without a readable
  * one-row params table does not exist as far as [[load]] is concerned.
  *
  * Why params-inside-the-generation (the r19 ADVICE fix): the previous
  * convention kept one flat `root/params` pointer and flipped it with
  * `mode("overwrite")` — but overwrite DELETES the old pointer before
  * the new file lands, so a crash inside that small window stranded a
  * fully intact previous generation unreachable. With the marker inside
  * `g<N>/`, nothing about generation N−1 is ever touched until
  * generation N is complete, and [[load]] walks generations newest-first
  * to the most recent COMPLETE one — a torn save is invisible.
  *
  * Generation numbering comes from the directory listing, never from
  * reading any params file — a corrupt params table can hide its own
  * generation from [[load]] but can never brick future [[save]]s (the
  * second r19 ADVICE finding).
  *
  * Superseded generations (and any pre-generation flat-layout files)
  * are garbage-collected best-effort AFTER the commit; a GC failure
  * leaves dead weight, never a correctness hazard. Callers holding lazy
  * scans over a previously-loaded artifact must checkpoint before
  * saving over it (the `curationIngest` rehydrate convention). */
object IndexStore {

  private def fsOf(spark: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Generation numbers present as `g<N>` directories under `root`
    * (committed or torn), descending; empty when the root is absent. */
  private def genDirs(spark: SparkSession, path: String): Seq[Int] =
    try {
      val (fs, root) = fsOf(spark, path)
      fs.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.matches("g\\d+"))
        .map(_.getPath.getName.drop(1).toInt)
        .sorted(Ordering[Int].reverse)
    } catch { case _: java.io.IOException => Seq.empty }

  /** Persist `frames` plus the one-row `params` table as the next
    * generation of the artifact at `root`; returns the committed
    * generation number. `params` must be a single row; a `gen` column
    * is appended for observability (the directory is authoritative). */
  def save(root: String, frames: Seq[(String, DataFrame)],
      params: DataFrame): Int = {
    require(frames.nonEmpty, "IndexStore.save: no frames")
    require(!frames.exists(_._1 == "params"),
      "IndexStore.save: 'params' is a reserved frame name")
    val spark = params.sparkSession
    val gen = genDirs(spark, root).headOption.getOrElse(0) + 1
    frames.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$root/g$gen/$name") }
    // commit point: the marker lands only after every frame of the new
    // generation is fully on disk, and touches nothing outside g<gen>/
    params.withColumn("gen", lit(gen))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g$gen/params")
    try {
      val (fs, rootP) = fsOf(spark, root)
      fs.listStatus(rootP).foreach { st =>
        if (st.getPath.getName != s"g$gen") fs.delete(st.getPath, true) }
    } catch { case _: java.io.IOException => }
    gen
  }

  /** The newest complete generation: its one-row params and the
    * directory its frames live in. Generations whose params table is
    * missing, unreadable, or not exactly one row are skipped (torn or
    * corrupt saves); when no generation qualifies, falls back to the
    * pre-generation flat layout (`root/params` + frames at `root`, or —
    * for artifacts written by the r18 pointer protocol — a flat params
    * carrying a `gen` column that addresses `root/g<N>`). A genuinely
    * absent artifact surfaces as `AnalysisException`, the loud
    * fall-back-to-seed signal every caller already handles. */
  def load(spark: SparkSession, root: String): (Row, String) = {
    genDirs(spark, root).foreach { g =>
      try {
        val rows = spark.read.parquet(s"$root/g$g/params").collect()
        if (rows.length == 1) return (rows(0), s"$root/g$g")
      } catch { case scala.util.control.NonFatal(_) => }
    }
    val rows = spark.read.parquet(s"$root/params").collect()
    require(rows.length == 1,
      s"IndexStore.load: params table at $root/params must hold exactly " +
        s"one row, found ${rows.length} — artifact corrupt or not an " +
        "IndexStore output")
    val r = rows(0)
    val dir =
      if (r.schema.fieldNames.contains("gen") &&
          !r.isNullAt(r.fieldIndex("gen")))
        s"$root/g${r.getAs[Int]("gen")}" // r18 pointer protocol
      else root // pre-generation flat layout
    (r, dir)
  }
}
