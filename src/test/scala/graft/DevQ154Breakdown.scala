package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only q154 stage breakdown (`Test/runMain graft.DevQ154Breakdown
  * <sfDir>`): times the descent build, edge prep, MSF, and CC+join
  * stages separately (memo warm, the bench steady state). */
object DevQ154Breakdown {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm the knn memo (q152 pays this in the bench)
    tm("q152 build (memo cold)")(
      SparkEntry.queries("q152_knn_graph")(spark, dir).count())
    // full q154, twice (bench best-of-2 view)
    tm("q154 full #1")(
      SparkEntry.queries("q154_semantic_linkage")(spark, dir).count())
    tm("q154 full #2")(
      SparkEntry.queries("q154_semantic_linkage")(spark, dir).count())

    // stage-by-stage on the warm memo
    val p = SketchParams.q154.cutWeight
    val knn = SparkEntry.q152KnnGraph(spark, dir)
    val edges = knn.select(
        least(col("id"), col("neighbor_id")).as("a"),
        greatest(col("id"), col("neighbor_id")).as("b"), col("d"))
      .groupBy(col("a"), col("b")).agg(min(col("d")).as("w"))
    tm("edges prep (noop)")(noop(edges))
    val forest = tm("MSF")(
      operators.Components.minimumSpanningForest(edges, "a", "b", "w"))
    tm("forest noop")(noop(forest))
    val cut = forest.filter(col("weight") <= p)
    val cc = tm("star CC")(operators.Components
      .connectedComponentsStar(cut, "id_a", "id_b"))
    tm("cc noop")(noop(cc))
    spark.stop()
  }
}
