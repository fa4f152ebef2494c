package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch r21 breakdown of q224's stages (dev-only). */
object DevQ224Breakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bd] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    // warm the shared memos the bench would have warm by q224's slot
    time("q191 (warms q191Parts)")(
      SparkEntry.queries("q191_hybrid_retrieval")(spark, sfDir).count())
    time("q157 (warms q157OldGraph)")(
      SparkEntry.queries("q157_knn_probe")(spark, sfDir).count())
    (1 to 3).foreach { i =>
      time(s"q224 full run $i")(
        SparkEntry.queries("q224_trained_reranker")(spark, sfDir).count())
    }
    // piecewise: replicate the internals
    val p152 = SketchParams.q152
    val p = SketchParams.q157
    val pr = SketchParams.q224
    val emb = Tables.load(spark, sfDir, "embeddings")
    val old = emb.filter(col("vec_id") % p.batchMod =!= 0)
    val batch = emb.filter(col("vec_id") % p.batchMod === 0)
    time("gold exactTopKPortable")(
      operators.Ann.exactTopKPortable(old, batch, "embedding", "vec_id",
        "vec_id", pr.gold, p152.scale).count())
    spark.stop()
  }
}
