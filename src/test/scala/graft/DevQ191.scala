package graft
import org.apache.spark.sql.functions._
import graft.operators.{Ann, TextAnalysis}
object DevQ191 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.session
    val dir = "/root/testdata/sf0.01"
    val p152 = SketchParams.q152; val p = SketchParams.q157
    val ph = SketchParams.q191
    val docs = Tables.load(spark, dir, "documents")
    val emb = Tables.load(spark, dir, "embeddings")
    val old = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 10 === 0)
    val corpusDocs = docs.join(old.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_semi")
    val qt = docs.join(batch.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("query_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("query_id"), col("term")).agg(count(lit(1)).as("__tf"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("__tf").desc, col("term").asc)))
      .filter(col("__rn") <= 8).select("query_id", "term")
    val bm = TextAnalysis.bm25FixedPointTopK(corpusDocs, "text", "doc_id", qt, 8)
    bm.filter(col("query_id") === 0).orderBy(col("score_q").desc)
      .collect().foreach(r => println(s"[bm] ${r.mkString(",")}"))
    println(s"[cnt] corpusDocs=${corpusDocs.count()} batch=${batch.count()} qt=${qt.count()}")
    spark.stop()
  }
}
