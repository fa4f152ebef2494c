package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-deduplication operators for large-scale training-data
  * pipelines. All are pure DataFrame programs: shuffles only on
  * hash/bucket keys, no driver-side loops, so they scale horizontally
  * (the LSH variants exist precisely so the 100 TB path never computes
  * an O(N²) pairwise product — candidate generation is an equi-join on
  * (band, signature) buckets).
  */
object Dedup {

  /** Exact dedup: group identical normalized texts, keep the minimum id.
    * One hash-partitioned aggregation; at scale, group on a 128-bit digest
    * of the text (not the text itself) to keep shuffle rows narrow. */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingle set (distinct) of a text column — pure built-ins:
    * `slice` over the token array via `transform(sequence(...))`. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** MinHash signature: k independent hash functions, each the min over the
    * shingle set of a seeded 64-bit hash. Seeding = mixing a per-function
    * constant into `xxhash64`, all inside codegen'd higher-order funcs. */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(transform(shingleSet, s => xxhash64(s, lit(j))))
    }: _*)

  /** MinHash + LSH banding: returns candidate near-duplicate pairs
    * (id_a < id_b) with their estimated and exact n-gram Jaccard.
    *
    * Pipeline: shingle → k-minhash → b bands of r rows → explode bands →
    * self-equi-join on (band, band_signature) → distinct pairs → verify
    * with exact Jaccard over the shingle sets. The bucket join is the only
    * shuffle that grows with corpus size.
    */
  def minhashLsh(
      docs: DataFrame, textCol: String, idCol: String,
      ngram: Int = 3, numHashes: Int = 16, bands: Int = 4,
      jaccardThreshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = docs
      .select(col(idCol).as("doc"), shingles(col(textCol), ngram).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = sig.select(
      col("doc"), col("sh"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          (0 until rows).map(r => col("sig").getItem(b * rows + r)): _*))
      }: _*)).as(Seq("band", "band_sig")))
    val a = banded.select(col("band"), col("band_sig"),
      col("doc").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("band_sig"),
      col("doc").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .groupBy("id_a", "id_b").agg(first("jaccard").as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
  }

  /** Exact n-gram Jaccard similarity join over a blocked candidate set:
    * every pair sharing at least one shingle (inverted-index join on the
    * shingle itself — the classic "prefix/posting" candidate generator).
    * Use only with a length/frequency filter at real scale; MinHash-LSH is
    * the scale path. */
  def ngramJaccardJoin(
      docs: DataFrame, textCol: String, idCol: String,
      ngram: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = docs.select(col(idCol).as("doc"),
      shingles(col(textCol), ngram).as("sh"))
    val posting = sh.select(col("doc"), col("sh"), explode(col("sh")).as("g"))
    val pairs = posting.select(col("g"), col("doc").as("id_a"), col("sh").as("sh_a"))
      .join(posting.select(col("g"), col("doc").as("id_b"), col("sh").as("sh_b")),
        Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").dropDuplicates("id_a", "id_b")
    pairs.select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup: 64-bit simhash over tokens (custom codegen'd
    * expression), banded into 16-bit chunks for LSH bucketing; candidates
    * sharing a chunk are verified by Hamming distance. */
  def simhashNearDup(
      docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 8): DataFrame = {
    import graft.functions.exprs
    val h = docs.select(col(idCol).as("doc"),
      exprs.simhash64(split(trim(col(textCol)), "\\s+")).as("sim"))
    val banded = h.select(col("doc"), col("sim"),
      posexplode(array((0 until 4).map { b =>
        shiftrightunsigned(col("sim"), b * 16).bitwiseAND(lit(0xffffL))
      }: _*)).as(Seq("band", "chunk")))
    val a = banded.select(col("band"), col("chunk"),
      col("doc").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("band"), col("chunk"),
      col("doc").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-duplicate pairs via brute force within LSH
    * buckets — see [[Ann.cosine]] for the kernel and [[Ann]] for the
    * hyperplane bucketing. */
  def embeddingNearDup(
      embs: DataFrame, vecCol: String, idCol: String,
      cosineThreshold: Double = 0.95, planes: Int = 8,
      seed: Long = 42L): DataFrame = {
    val dim = Ann.dimOf(embs, vecCol)
    val sigExpr = Ann.hyperplaneSignature(col(vecCol), dim, planes, seed)
    val sig = embs.select(col(idCol).as("vid"),
      transform(col(vecCol), _.cast("double")).as("v"), sigExpr.as("bucket"))
    val a = sig.select(col("bucket"), col("vid").as("id_a"), col("v").as("v_a"))
    val b = sig.select(col("bucket"), col("vid").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Ann.cosine(col("v_a"), col("v_b")).as("cosine"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("cosine") >= cosineThreshold)
  }
}
