package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** Quantizer persistence (VERDICT r8 #5): a trained IVF/SemDeDup coarse
  * quantizer saved to parquet and loaded back must be indistinguishable
  * from the in-memory model — bit-exact coordinates in both domains, and
  * identical downstream query results when injected. */
class CentroidPersistenceSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.session
  private val dir = "/root/testdata/sf0.01"

  private def tmp(name: String): String =
    Files.createTempDirectory(s"centroids-$name").resolve("model").toString

  test("integer-domain model round-trips parquet bit-exactly") {
    implicit val s: SparkSession = spark
    val emb = Tables.embeddings(spark, dir)
    val trained = Ann.kmeansCentroidsPortable(
      emb, "embedding", "vec_id", nlist = 8, iters = 2, scale = 1000)
    val path = tmp("long")
    Ann.saveCentroids(trained, path)
    val loaded = Ann.loadCentroids(path)
    assert(loaded == trained) // Seq[Seq[Long]] equality: every bit, in order
  }

  test("double-domain model round-trips parquet bit-exactly") {
    implicit val s: SparkSession = spark
    val emb = Tables.embeddings(spark, dir)
    val trained = Ann.kmeansCentroids(
      emb, "embedding", "vec_id", nlist = 8, iters = 2, seed = 42)
    val path = tmp("double")
    Ann.saveCentroidsD(trained, path)
    val loaded = Ann.loadCentroidsD(path)
    // IEEE doubles round-trip parquet exactly: compare raw bits, not ==
    assert(loaded.size == trained.size)
    for ((l, t) <- loaded.zip(trained)) {
      assert(l.map(java.lang.Double.doubleToRawLongBits) ==
        t.map(java.lang.Double.doubleToRawLongBits))
    }
  }

  test("ivfTopKPortable with a loaded model equals the retrained run") {
    implicit val s: SparkSession = spark
    val emb = Tables.embeddings(spark, dir)
    val trained = Ann.kmeansCentroidsPortable(
      emb, "embedding", "vec_id", nlist = 8, iters = 2, scale = 1000)
    val path = tmp("serve")
    Ann.saveCentroids(trained, path)
    val loaded = Ann.loadCentroids(path)
    val q = emb.filter(col("vec_id") < 8)
    def run(c: Seq[Seq[Long]]) = Ann.ivfTopKPortable(
        emb, q, "embedding", "vec_id", "vec_id",
        k = 10, nlist = 8, nprobe = 3, centroids = Some(c))
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(run(loaded) == run(trained))
  }

  test("trainOrLoadCentroids trains once, then serves from the artifact") {
    implicit val s: SparkSession = spark
    val emb = Tables.embeddings(spark, dir)
    val path = tmp("once")
    var trainings = 0
    def train(): Seq[Seq[Long]] = {
      trainings += 1
      Ann.kmeansCentroidsPortable(
        emb, "embedding", "vec_id", nlist = 4, iters = 1, scale = 1000)
    }
    val first = Ann.trainOrLoadCentroids(path)(train())
    val second = Ann.trainOrLoadCentroids(path)(train())
    assert(trainings == 1, "second call must load, not retrain")
    assert(second == first)
  }

  test("minhash corpus index round-trips: loaded index screens a batch " +
      "identically to the fresh one (r11)") {
    import spark.implicits._
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the red barn"),
      (2L, "sparkling rivers wind through ancient valleys carrying cold " +
        "mountain water to the sea"),
      (3L, "a completely different document about compilers and type " +
        "systems and register allocation"))
      .toDF("doc_id", "text")
    val prepared = Dedup.prepareCorpus(corpus, "text", "doc_id")
    val path = Files.createTempDirectory("lsh-index").resolve("ix").toString
    Dedup.saveCorpusIndex(prepared, path)
    val loaded = Dedup.loadCorpusIndex(spark, path)
    assert((loaded.ngram, loaded.numHashes, loaded.bands) ==
      ((prepared.ngram, prepared.numHashes, prepared.bands)))
    // batch: one exact copy, one near-dup (tail tweak), one novel
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the red barn"),
      (102L, "sparkling rivers wind through ancient valleys carrying cold " +
        "mountain water to the coast"),
      (103L, "entirely novel text regarding submarine cable maintenance " +
        "schedules and repair ships at port today"))
      .toDF("doc_id", "text")
    def screen(ix: Dedup.PreparedCorpus) = Dedup
      .incrementalDedupPrepared(batch, ix, "text", "doc_id",
        jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val fresh = screen(prepared)
    val warm = screen(loaded)
    assert(fresh == warm, s"fresh $fresh vs loaded $warm")
    assert(!fresh.contains(101L), "exact copy must be screened out")
    assert(fresh.contains(103L), "novel doc must survive")
  }

  test("corpus-index save is crash-atomic: a torn next-generation save " +
      "never mixes frames — the loader keeps the last committed " +
      "generation (ADVICE r18)") {
    import spark.implicits._
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"))
      .toDF("doc_id", "text")
    val prepared = Dedup.prepareCorpus(corpus, "text", "doc_id")
    val path = Files.createTempDirectory("lsh-torn").resolve("ix").toString
    Dedup.saveCorpusIndex(prepared, path)
    val committedFps = Dedup.loadCorpusIndex(spark, path)
      .fingerprints.collect().map(_.getString(0)).toSet
    // simulate a crash MID-save of generation 2: frame directories land
    // (with different content) but the params pointer never flips
    val bigger = Dedup.prepareCorpus(corpus.unionByName(
      Seq((3L, "totally new words appended after the crash began here"))
        .toDF("doc_id", "text")), "text", "doc_id")
    bigger.fingerprints.write.mode("overwrite")
      .parquet(s"$path/g2/fingerprints")
    bigger.banded.write.mode("overwrite").parquet(s"$path/g2/banded")
    // (crash: shingles and params never written)
    val reloaded = Dedup.loadCorpusIndex(spark, path)
    assert(reloaded.fingerprints.collect().map(_.getString(0)).toSet ==
      committedFps,
      "loader must keep the committed generation, not the torn one")
    assert(reloaded.banded.count() == prepared.banded.count())
    // a completed save then commits gen 2+ and the stale torn dir is GC'd
    Dedup.saveCorpusIndex(bigger, path)
    val after = Dedup.loadCorpusIndex(spark, path)
    assert(after.fingerprints.count() == 3L,
      "a completed save must supersede the committed generation")
  }

  test("PQ sub-codebooks round-trip parquet bit-exactly and a loaded " +
      "model reproduces the retrained pqTopK run") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val emb = Tables.load(spark, dir, "embeddings")
    val books = graft.operators.Ann.pqCodebooksPortable(
      emb, "embedding", "vec_id", m = 2, ks = 4, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("pqbooks").toString + "/m"
    graft.operators.Ann.savePqCodebooks(books, path)
    val loaded = graft.operators.Ann.loadPqCodebooks(path)
    assert(loaded == books, "codebooks changed across the round trip")
    def run(b: Seq[Seq[Seq[Long]]]) = graft.operators.Ann.pqTopK(
        emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 4),
        "embedding", "vec_id", "vec_id", k = 5, m = 2, ks = 4,
        iters = 2, codebooks = Some(b))
      .collect().map(_.toSeq).toSet
    assert(run(loaded) == run(books))
    // trainOrLoad: second call must not retrain (identity via artifact)
    var trained = 0
    def trainer = { trained += 1; books }
    val p2 = java.nio.file.Files
      .createTempDirectory("pqbooks2").toString + "/m"
    graft.operators.Ann.trainOrLoadPqCodebooks(p2)(trainer)
    val again = graft.operators.Ann.trainOrLoadPqCodebooks(p2)(trainer)
    assert(trained == 1 && again == books)
  }
}
