package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: custom expressions reach pure-SQL users via
  * SparkSessionExtensions (shares the existing SparkContext). */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions registers the engine functions for SQL") {
    TestSpark.session // ensure context exists
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT token_sort_ratio('a b', 'b a') AS ts, " +
          "indel_ratio('kitten', 'sitting') AS ir, " +
          "abn_valid('51824753556') AS ok, " +
          "simhash64(array('x', 'y')) AS sh, " +
          "wratio('NSW AUSTRALIA', 'NSW') AS wr, " +
          "word_ngrams('a b c d', 3) AS wn, " +
          "size(word_ngram_hashes('a b c d', 3)) AS nh").head()
      assert(r.getDouble(0) == 100.0)
      assert(math.abs(r.getDouble(1) - 61.5385) < 5e-4)
      assert(r.getBoolean(2))
      assert(r.getLong(3) != 0L)
      assert(math.abs(r.getDouble(4) - 90.0) < 1e-9)
      assert(r.getSeq[String](5) == Seq("a b c", "b c d"))
      assert(r.getInt(6) == 2)
      // r14 kernels: tf_expand, sorted_jaccard, ahash64/dhash64
      val r2 = s2.sql(
        "SELECT tf_expand('a a a b', 2) AS tf, " +
          "sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS sj, " +
          "ahash64(cast('P5\n2 2\n255\nZZZZ' AS BINARY)) AS ah, " +
          "dhash64(cast('nope' AS BINARY)) AS dh").head()
      assert(r2.getSeq[String](0).sorted == Seq("a#1", "a#2", "b#1"))
      assert(math.abs(r2.getDouble(1) - 0.5) < 1e-12)
      assert(!r2.isNullAt(2), "valid 2x2 PGM must hash")
      assert(r2.isNullAt(3), "malformed payload must hash to null")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
