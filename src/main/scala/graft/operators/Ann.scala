package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Four strategies:
  *   - [[bruteForceTopK]]: exact — broadcast the (small) query set against
  *     the corpus, score every pair, per-query top-k window. The baseline
  *     and the verifier for the approximate paths. Scales in the corpus
  *     dimension (corpus stays partitioned; only queries are broadcast).
  *   - [[lshTopK]]: random-hyperplane LSH — bucket corpus and queries by
  *     sign-bit signatures, score only within shared buckets. The 100 TB
  *     path: candidate generation is an equi-join on the signature, so no
  *     full cross product ever materializes.
  *   - [[ivfTopK]]: IVF (inverted-file) — a k-means coarse quantizer
  *     partitions the corpus into `nlist` inverted lists; each query
  *     probes only its `nprobe` nearest lists. Recall/cost is tunable at
  *     query time, and `nprobe = nlist` degrades gracefully to the exact
  *     result — the standard serving trade-off (FAISS-style), expressed
  *     relationally.
  *   - [[lshTopKPortable]]: single-table hyperplane LSH whose planes are
  *     ±1 signs derived from md5 and whose projections are computed in
  *     exact integer arithmetic over floor-quantized coordinates — any
  *     md5-capable engine reproduces the bucketing bit-for-bit, which is
  *     what lets the DuckDB oracle verify the whole ANN pipeline.
  *
  * All arithmetic is done in double (floats are widened first) with
  * sequential fold order, so results are bit-deterministic.
  */
object Ann {

  /** Cosine similarity of two array<double> columns — the dot products
    * are the r21 codegen kernel (the zip_with/aggregate lambda form ran
    * interpreted per element), same left-to-right fold order, so the
    * doubles are bit-identical. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      graft.functions.exprs.dot_double(x, y)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Dimensionality of the embedding column (reads one row). */
  def dimOf(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  /** Deterministic random hyperplanes: `planes` rows of `dim` doubles. */
  private def planesFor(dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit signature of a vector against the seeded hyperplanes,
    * packed into a long: bit j = (v · plane_j) > 0. The planes enter the
    * plan as single array LITERALS (`typedlit`), not per-row CreateArray
    * nodes — constant-folded once, not rebuilt for every row. */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int, seed: Long): Column = {
    val ps = planesFor(dim, planes, seed)
    val v = transform(vec, _.cast("double"))
    val bits = ps.zipWithIndex.map { case (p, j) =>
      val planeLit = typedlit(p.toSeq)
      val d = graft.functions.exprs.dot_double(v, planeLit) // codegen (r21)
      when(d > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** Exact top-k neighbors for each query vector. `queries` must be small
    * enough to broadcast (the usual ANN-serving shape). Ties broken by
    * corpus id ascending for determinism. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), _.cast("double")).as("__cv"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("__qv"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** LSH-bucketed approximate top-k: score only pairs sharing a signature
    * under at least one of `tables` independent hyperplane sets. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int, planes: Int = 8, tables: Int = 4, seed: Long = 42L,
      excludeSelf: Boolean = true): DataFrame = {
    val dim = dimOf(corpus, vecCol)
    // signatures-only exploded view: the vector array is NOT duplicated
    // across the `tables` rows of the bucket-join shuffle
    def withSigs(df: DataFrame, id: String, out: String): DataFrame =
      df.select(col(id).as(out),
          posexplode(array((0 until tables).map(t =>
            hyperplaneSignature(col(vecCol), dim, planes, seed + t)): _*))
            .as(Seq("table", "sig")))
    val c = withSigs(corpus, idCol, "neighbor_id")
    val q = withSigs(queries, queryIdCol, "query_id")
    val cand = c.join(q, Seq("table", "sig"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select("query_id", "neighbor_id").distinct()
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), _.cast("double")).as("__v_neighbor_id"))
    val qv = queries.select(col(queryIdCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("__v_query_id"))
    val scored = cand
      .join(broadcast(qv), Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .withColumn("cosine",
        cosine(col("__v_query_id"), col("__v_neighbor_id")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  // ------------------------------------------------------------------- IVF

  /** Squared L2 distance between an array<double> column and a literal
    * centroid (sequential fold — deterministic). */
  private def sqDistToLit(v: Column, centroid: Seq[Double]): Column =
    // codegen kernel (r21), same left-to-right fold order as the old
    // aggregate(zip_with(...)) — bit-identical doubles
    graft.functions.exprs.sq_l2_double(v, typedlit(centroid))

  /** (distance, index) struct array sorted ascending — distances ties
    * break to the lower index by the struct field order. Each distance
    * expression is evaluated exactly ONCE (an argmin via least()+when()
    * chains would re-evaluate every distance several times). */
  private def sortedCentroidDists(v: Column, centroids: Seq[Seq[Double]]): Column =
    array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(sqDistToLit(v, c).as("d"), lit(i).as("i")) }: _*))

  /** Index of the nearest centroid (argmin of squared L2, ties to the
    * lower index). */
  private def nearestCentroid(v: Column, centroids: Seq[Seq[Double]]): Column =
    element_at(sortedCentroidDists(v, centroids), 1).getField("i")

  // ------------------------ centroid assignment: literal vs table path

  /** Above this many centroids, assignment switches from the literal
    * expression chain to the broadcast-table path. The literal chain
    * embeds nlist separate fold expressions (one `typedlit` + aggregate
    * per centroid) in the plan — past a few hundred centroids that is a
    * plan-size and codegen wall (Janino's 64 KB method limit forces
    * interpreted fallback long before SemDeDup's production
    * nlist ≈ √N ~ 10⁴). The table path ships the matrix ONCE per
    * executor as a broadcast single-row relation and evaluates ONE fold
    * over the array column — O(1) plan nodes at any nlist, no extra
    * shuffle (a min_by groupBy join would re-shuffle on the row id).
    * Both paths share arithmetic and fold order, so they are
    * bit-identical (`CentroidTableSpec`); the knob is var-scoped so the
    * spec can force the table path on small matrices. */
  @volatile private[graft] var centroidTableThreshold: Int = 256

  /** (squared-L2 distance, index) structs over a centroid ARRAY COLUMN
    * (`array<struct<i:int, c:array<_>>>`) — the table-path core. `zero`
    * picks the domain (`lit(0L)` integer / `lit(0.0)` double); the
    * (x−y)² fold is the same expression shape and sequential fold order
    * as the literal-path chains, so distances match bit-for-bit. */
  private def distStructs(cents: Column, v: Column,
      integerDomain: Boolean): Column =
    // codegen kernels (r21): same element order and arithmetic as the
    // old aggregate(zip_with(...)) sequential fold — bit-identical in
    // both domains
    transform(cents, e => struct(
      (if (integerDomain)
        graft.functions.exprs.sq_l2_long(v, e.getField("c"))
      else
        graft.functions.exprs.sq_l2_double(v, e.getField("c"))).as("d"),
      e.getField("i").as("i")))

  /** One-row frame holding a whole `(list_id, centroid)` matrix as a
    * single index-sorted `array<struct<i,c>>` value —
    * `crossJoin(broadcast(…))` attaches it to every row without the
    * matrix ever entering the expression tree. Accepts any centroid
    * DataFrame (e.g. a [[saveCentroids]] parquet model read back
    * WITHOUT collecting to the driver). */
  def centroidRowOf(centroidsDf: DataFrame): DataFrame =
    centroidsDf.agg(array_sort(collect_list(
      struct(col("list_id").cast("int").as("i"), col("centroid").as("c"))))
      .as("__cents"))

  private def centroidRowL(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[Seq[Long]]): DataFrame = {
    import spark.implicits._
    centroidRowOf(cents.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("list_id", "centroid"))
  }

  private def centroidRowD(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[Seq[Double]]): DataFrame = {
    import spark.implicits._
    centroidRowOf(cents.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("list_id", "centroid"))
  }

  /** Table-path column append: nearest index (`array_min` over the
    * (d, i) structs — same lexicographic order, NaN-last, as the literal
    * path's `array_sort` head) or the full sorted distance array. */
  private def withDistColViaTable(df: DataFrame, centsRow: DataFrame,
      v: Column, out: String, integerDomain: Boolean,
      sortedAll: Boolean): DataFrame = {
    val ds = distStructs(col("__cents"), v, integerDomain)
    val c = if (sortedAll) array_sort(ds)
            else array_min(ds).getField("i")
    df.crossJoin(broadcast(centsRow)).withColumn(out, c).drop("__cents")
  }

  /** Append `out` = nearest-centroid index (integer domain), choosing
    * the literal chain below [[centroidTableThreshold]] and the
    * broadcast-table path above it. */
  def withNearestCentroidL(df: DataFrame, cents: Seq[Seq[Long]],
      v: Column, out: String): DataFrame =
    if (cents.size <= centroidTableThreshold)
      df.withColumn(out,
        element_at(centroidSortedDists(cents, v), 1).getField("i"))
    else withDistColViaTable(df, centroidRowL(df.sparkSession, cents),
      v, out, integerDomain = true, sortedAll = false)

  /** Append `out` = full ascending (d, i) distance array (integer
    * domain) — the probe-selection shape. Path chosen as in
    * [[withNearestCentroidL]]. */
  def withSortedCentroidDistsL(df: DataFrame, cents: Seq[Seq[Long]],
      v: Column, out: String): DataFrame =
    if (cents.size <= centroidTableThreshold)
      df.withColumn(out, centroidSortedDists(cents, v))
    else withDistColViaTable(df, centroidRowL(df.sparkSession, cents),
      v, out, integerDomain = true, sortedAll = true)

  /** Double-domain twin of [[withNearestCentroidL]]. */
  def withNearestCentroidD(df: DataFrame, cents: Seq[Seq[Double]],
      v: Column, out: String): DataFrame =
    if (cents.size <= centroidTableThreshold)
      df.withColumn(out, nearestCentroid(v, cents))
    else withDistColViaTable(df, centroidRowD(df.sparkSession, cents),
      v, out, integerDomain = false, sortedAll = false)

  /** Double-domain twin of [[withSortedCentroidDistsL]]. */
  def withSortedCentroidDistsD(df: DataFrame, cents: Seq[Seq[Double]],
      v: Column, out: String): DataFrame =
    if (cents.size <= centroidTableThreshold)
      df.withColumn(out, sortedCentroidDists(v, cents))
    else withDistColViaTable(df, centroidRowD(df.sparkSession, cents),
      v, out, integerDomain = false, sortedAll = true)

  /** K-means coarse quantizer: `iters` Lloyd iterations over the corpus,
    * initialized from a DETERMINISTIC hash-sample (the `nlist` vectors
    * with the smallest `xxhash64(id, seed)` — reproducible, no `rand()`).
    * Assignment runs distributed; only the nlist×dim centroid matrix ever
    * reaches the driver (the same model-state boundary MLlib's KMeans
    * uses), so the corpus can be arbitrarily large. */
  def kmeansCentroids(
      corpus: DataFrame, vecCol: String, idCol: String,
      nlist: Int, iters: Int = 2, seed: Int = 42): Seq[Seq[Double]] = {
    val vecs = corpus.select(col(idCol).as("__id"),
      transform(col(vecCol), _.cast("double")).as("__v"))
    var centroids: Seq[Seq[Double]] =
      vecs.withColumn("__h", xxhash64(col("__id"), lit(seed)))
        .orderBy(col("__h"), col("__id"))
        .limit(nlist)
        .select(col("__v")).collect()
        .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
    (0 until iters).foreach { _ =>
      // mean per (cluster, dimension): one narrow shuffle of
      // (cluster, dim_index, value) triples — scales with corpus size.
      // The assignment is computed in its OWN projection before the
      // generator — inlined into the posexplode select it would be
      // re-evaluated once per exploded dimension (dim× the work)
      val updated = withNearestCentroidD(
          vecs.select(col("__v")), centroids, col("__v"), "__c")
        .select(col("__c"), posexplode(col("__v")).as(Seq("__d", "__x")))
        .groupBy(col("__c"), col("__d"))
        .agg(avg(col("__x")).as("__m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toIndexedSeq }
      // empty clusters keep their previous centroid
      centroids = centroids.indices
        .map(i => updated.getOrElse(i, centroids(i))).toIndexedSeq
    }
    centroids
  }

  /** IVF top-k: assign the corpus to inverted lists once (nearest
    * centroid), probe the `nprobe` nearest lists per query, exact cosine
    * within the probed lists, per-query top-k. The candidate join is an
    * equi-join on the list id — per-query work is proportional to the
    * probed fraction (nprobe/nlist) of the corpus, and `nprobe = nlist`
    * recovers the exact [[bruteForceTopK]] result. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int, nlist: Int = 8, nprobe: Int = 2, kmeansIters: Int = 2,
      seed: Int = 42, excludeSelf: Boolean = true,
      centroids: Option[Seq[Seq[Double]]] = None): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, "1 <= nprobe <= nlist")
    val cents = centroids.getOrElse(
      kmeansCentroids(corpus, vecCol, idCol, nlist, kmeansIters, seed))
    val lists = withNearestCentroidD(
      corpus.select(col(idCol).as("neighbor_id"),
        transform(col(vecCol), _.cast("double")).as("__cv")),
      cents, col("__cv"), "__list")
    // nprobe nearest lists per query: distances to the nlist centroids,
    // sorted as a (dist, index) struct array — per-row, no shuffle, no
    // UDF (literal chain at small nlist, broadcast table above the cap)
    val qv = queries.select(col(queryIdCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("__qv"))
    val probed = withSortedCentroidDistsD(qv, cents, col("__qv"), "__pd")
      .withColumn("__probe",
        slice(transform(col("__pd"), p => p.getField("i")), 1, nprobe))
      .select(col("query_id"), col("__qv"),
        explode(col("__probe")).as("__list"))
    val scored = lists.join(broadcast(probed), Seq("__list"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id")
        else lit(true))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  // ------------------------------------------------- portable LSH (oracle)

  /** ±1 hyperplane sign for (plane j, 1-based dimension i): +1 iff the
    * first hex digit of `md5("<j>:<i>")` is in 0–7. Pure public md5 — any
    * engine derives the identical sign matrix. */
  def portableSign(j: Int, i: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$i".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) < 8) 1L else -1L
  }

  /** Floor quantization of a float/double vector to longs at `scale` —
    * the integer domain every portable kernel scores in (exact double
    * widen → ·scale → floor; zero float-rounding risk across engines). */
  def quantizeVec(v: Column, scale: Int): Column =
    transform(v, x => floor(x.cast("double") * scale).cast("long"))

  /** Exact integer dot product of two quantized vectors — both engines
    * compute the identical BIGINT. Codegen kernel (r21): the
    * zip_with/aggregate lambda form ran interpreted per element. */
  private[operators] def idot(a: Column, b: Column): Column =
    graft.functions.exprs.dot_long(a, b)

  /** Deterministic coarse quantizer shared by the portable IVF / semantic
    * dedup paths: the `nlist` quantized corpus vectors with the smallest
    * (60-bit md5("<id>:ivf") prefix, id) — a hash-sample an external
    * engine can re-derive; only nlist×dim longs reach the driver. */
  private[operators] def portableCentroids(
      corpus: DataFrame, vecCol: String, idCol: String,
      nlist: Int, scale: Int): Seq[Seq[Long]] = corpus
    .select(col(idCol).as("__id"), quantizeVec(col(vecCol), scale).as("__q"))
    .withColumn("__key",
      graft.functions.PortableHash.md5Long60(
        concat(col("__id").cast("string"), lit(":ivf"))))
    .orderBy(col("__key"), col("__id"))
    .limit(nlist)
    .select(col("__q")).collect()
    .map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq

  /** Engine-portable Lloyd refinement of [[portableCentroids]] — a
    * LEARNED coarse quantizer whose every step stays in exact integer
    * arithmetic so an external engine replays it bit-for-bit:
    * assignment is integer squared-L2 (ties to the lower index) and the
    * centroid update is the per-dimension FLOOR-DIVIDED mean
    * `floorDiv(Σ coord, |cluster|)` — mathematical floor division of
    * exact integers, identical in any engine with `%` and integer
    * division (the q92 oracle unrolls the same iterations in SQL).
    * Empty clusters keep their previous centroid.
    *
    * Distribution boundary is the same as [[kmeansCentroids]]: the
    * per-(cluster, dimension) sums are one narrow shuffle of exploded
    * coordinates; only nlist×dim subtotal rows reach the driver per
    * iteration. Floor-rounding costs at most 1/scale per coordinate per
    * iteration — noise relative to quantization, while buying exact
    * cross-engine reproducibility a float mean can never provide. */
  def kmeansCentroidsPortable(
      corpus: DataFrame, vecCol: String, idCol: String,
      nlist: Int, iters: Int = 2, scale: Int = 1000): Seq[Seq[Long]] = {
    val qvecs = corpus.select(col(idCol).as("__id"),
      quantizeVec(col(vecCol), scale).as("__q"))
    var centroids = portableCentroids(corpus, vecCol, idCol, nlist, scale)
    (0 until iters).foreach { _ =>
      // assignment in its OWN projection: inlined into the posexplode
      // select it would be re-evaluated once per exploded dimension
      val updated = withNearestCentroidL(
          qvecs.select(col("__q")), centroids, col("__q"), "__c")
        .select(col("__c"), posexplode(col("__q")).as(Seq("__d", "__x")))
        .groupBy(col("__c"), col("__d"))
        .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__n"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(_.getInt(1))
            .map(r => Math.floorDiv(r.getLong(2), r.getLong(3)))
            .toIndexedSeq }
      centroids = centroids.indices
        .map(i => updated.getOrElse(i, centroids(i))).toIndexedSeq
    }
    centroids
  }

  /** (integer squared-L2 distance, centroid index) structs sorted
    * ascending — ties to the lower index. Exact, engine-agnostic. */
  def centroidSortedDists(
      centroids: Seq[Seq[Long]], v: Column): Column = {
    def sqDist(c: Seq[Long]): Column =
      graft.functions.exprs.sq_l2_long(v, typedlit(c)) // codegen (r21)
    array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(sqDist(c).as("d"), lit(i).as("i")) }: _*))
  }

  /** Packed sign-bit signature over floor-quantized coordinates: bit j =
    * (Σ_i floor(v_i·scale)·sign(j,i)) > 0. Quantization (exact double
    * widen → ·scale → floor) and the ±1 dot product are INTEGER
    * arithmetic, so the bucketing has zero float-rounding risk across
    * engines. */
  def portableSignature(vec: Column, dim: Int, planes: Int,
      scale: Int = 1000): Column = {
    val q = transform(vec, x => floor(x.cast("double") * scale).cast("long"))
    val bits = (0 until planes).map { j =>
      val signs = typedlit((1 to dim).map(i => portableSign(j, i)))
      val proj = graft.functions.exprs.dot_long(q, signs) // codegen (r21)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Signed (±1) random projection — Achlioptas 2003 (JCSS,
    * "Database-friendly random projections"): Johnson–Lindenstrauss
    * dimensionality reduction with a Rademacher matrix, which preserves
    * pairwise distances in expectation (E‖Px‖² = outDims·‖x‖²) while
    * replacing every Gaussian multiply with an add/subtract. The sign
    * matrix is the SAME md5 derivation as [[portableSignature]]
    * ([[portableSign]]), and inputs floor-quantize to the shared integer
    * domain, so projected coordinates are exact BIGINTs any engine
    * re-derives — the q163 oracle embeds the sign matrix as literals.
    *
    * The scale lever: every downstream distance computation (kNN, LSH,
    * k-means, dedup) costs ∝ dim; projecting 64→16 cuts that 4× with
    * JL-bounded distortion — project once at ingest, index the
    * projection. Map-only, fused with the scan. */
  def signedProjection(vec: Column, dim: Int, outDims: Int,
      scale: Int = 1000): Column = {
    val q = quantizeVec(vec, scale)
    array((0 until outDims).map { j =>
      val signs = typedlit((1 to dim).map(i => portableSign(j, i)))
      graft.functions.exprs.dot_long(q, signs) // codegen (r21)
    }: _*)
  }

  /** Exact top-k in the PROJECTED space — the brute-force scan after the
    * [[signedProjection]] 4× (or more) per-distance cost cut, ranked by
    * exact integer squared L2 over projected coordinates with the
    * [[graft.functions.BottomK]] total order (q163). The queries side
    * (projected) broadcasts; the corpus-side work is one map + the heap
    * merge — the [[pqTopK]] scan shape at a fraction of the per-pair
    * arithmetic. */
  def projectedTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int, outDims: Int, scale: Int = 1000,
      excludeSelf: Boolean = true): DataFrame = {
    require(k > 0 && outDims >= 1, "bad k/outDims")
    val dim = dimOf(corpus, vecCol)
    val idType = corpus.select(col(idCol)).schema.head.dataType
    val c = corpus.select(col(idCol).as("neighbor_id"),
      signedProjection(col(vecCol), dim, outDims, scale).as("__cp"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      signedProjection(col(vecCol), dim, outDims, scale).as("__qp"))
    c.join(broadcast(q),
        if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("pd",
        graft.functions.exprs.sq_l2_long(col("__qp"), col("__cp")))
      .groupBy(col("query_id"))
      .agg(graft.functions.BottomK.bottom_k(col("pd"),
        col("neighbor_id").cast("string"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.value").cast(idType).as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.key").as("pd"))
  }

  /** Engine-portable IVF top-k — the oracled twin of [[ivfTopK]]: the
    * coarse quantizer is the `nlist` corpus vectors with the smallest
    * (md5-derived key, id) — a deterministic hash-sample instead of
    * Lloyd-refined k-means, which an external engine can re-derive — and
    * assignment/probing run in EXACT INTEGER arithmetic over
    * floor-quantized coordinates (squared L2 of longs), so the list
    * partition and the probe sets can never diverge on float rounding.
    * In-list ranking is cosine over the QUANTIZED vectors — integer dot
    * and norms, then one shape-identical double multiply/sqrt/divide on
    * both engines, so the ordering key (not just the tie-break) is
    * bit-reproducible; only (query_id, neighbor_id, rank) are
    * projected. Structure (assign once / probe
    * nprobe lists / equi-join on list id) is identical to the fast path,
    * so the oracle verifies the IVF pipeline shape end-to-end.
    * Pass `centroids` to swap in a refined quantizer — float-domain
    * [[kmeansCentroids]] (via [[quantizeCentroids]]) when only the Spark
    * side must reproduce, or [[kmeansCentroidsPortable]] when the
    * oracle replays the training too (q92). */
  def ivfTopKPortable(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int, nlist: Int = 8, nprobe: Int = 3, scale: Int = 1000,
      excludeSelf: Boolean = true,
      centroids: Option[Seq[Seq[Long]]] = None): DataFrame = {
    val cents = centroids.getOrElse(
      portableCentroids(corpus, vecCol, idCol, nlist, scale))
    val lists = withNearestCentroidL(
      corpus.select(col(idCol).as("neighbor_id"),
        quantizeVec(col(vecCol), scale).as("__cq")),
      cents, col("__cq"), "__list")
    ivfServe(lists, cents, queries, vecCol, queryIdCol, k, nlist,
      nprobe, scale, excludeSelf)
  }

  /** The IVF serving tail shared by [[ivfTopKPortable]] and
    * [[ivfTopKFromIndex]]: probe-list selection for the (tiny) query
    * side, the pruned posting join, the bit-portable quantized-cosine
    * ranking. `lists` is (neighbor_id, __cq, __list). */
  private def ivfServe(lists: DataFrame, cents: Seq[Seq[Long]],
      queries: DataFrame, vecCol: String, queryIdCol: String, k: Int,
      nlist: Int, nprobe: Int, scale: Int,
      excludeSelf: Boolean): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, "1 <= nprobe <= nlist")
    def quantize(v: Column): Column = quantizeVec(v, scale)
    val probed = withSortedCentroidDistsL(
        queries.select(col(queryIdCol).as("query_id"),
          quantize(col(vecCol)).as("__qq")),
        cents, col("__qq"), "__sd")
      .withColumn("__probe",
        slice(transform(col("__sd"), p => p.getField("i")), 1, nprobe))
      .select(col("query_id"), col("__qq"),
        explode(col("__probe")).as("__list"))
    val scored = lists.join(broadcast(probed), Seq("__list"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id")
        else lit(true))
      // in-list ranking cosine over the QUANTIZED vectors: the dot and the
      // two norms are exact integers in both engines, and the final
      // double expression (one multiply, one sqrt, one divide — written
      // with the same shape in the q68 oracle SQL) is a chain of
      // correctly-rounded IEEE ops, so the ordering key is bit-identical
      // across engines — no last-ulp rank flip (round-4 advice, Ann:312)
      .withColumn("cosine",
        idot(col("__qq"), col("__cq")).cast("double") /
          sqrt(idot(col("__qq"), col("__qq")).cast("double") *
            idot(col("__cq"), col("__cq")).cast("double")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** An IVF index snapshot — the serving artifact [[ivfTopKPortable]]
    * derives per run: the trained quantizer plus the corpus's posting
    * lists (`neighbor_id`, quantized vector, list id). All BIGINT →
    * parquet round-trips bit-exactly; index-served rankings equal
    * recomputed ones (spec'd in `AnnIvfSpec`). */
  final case class IvfIndex(centroids: Seq[Seq[Long]], lists: DataFrame,
      nlist: Int, scale: Int)

  /** Build the [[IvfIndex]] over a corpus — quantize + assign once
    * (the index-time pass); serving then pays only the probe joins. */
  def ivfIndex(corpus: DataFrame, vecCol: String, idCol: String,
      nlist: Int = 8, scale: Int = 1000,
      centroids: Option[Seq[Seq[Long]]] = None): IvfIndex = {
    val cents = centroids.getOrElse(
      portableCentroids(corpus, vecCol, idCol, nlist, scale))
    val lists = withNearestCentroidL(
      corpus.select(col(idCol).as("neighbor_id"),
        quantizeVec(col(vecCol), scale).as("__cq")),
      cents, col("__cq"), "__list")
    IvfIndex(cents, lists, nlist, scale)
  }

  /** [[ivfTopKPortable]] served from a persisted/memoized
    * [[IvfIndex]] — identical ranking integers, but the corpus is
    * never re-quantized or re-assigned. */
  def ivfTopKFromIndex(index: IvfIndex, queries: DataFrame,
      vecCol: String, queryIdCol: String, k: Int, nprobe: Int = 3,
      excludeSelf: Boolean = true): DataFrame =
    ivfServe(index.lists, index.centroids, queries, vecCol, queryIdCol,
      k, index.nlist, nprobe, index.scale, excludeSelf)

  /** Persist an [[IvfIndex]] — posting lists + centroids + a one-row
    * params table under one root, on the
    * [[graft.model.IndexStore]] crash-atomic generation protocol
    * shared with [[graft.operators.Dedup.saveCorpusIndex]]. */
  def saveIvfIndex(index: IvfIndex, root: String)(
      implicit spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    graft.model.IndexStore.save(root,
      Seq(
        "lists" -> index.lists
          .select(col("neighbor_id"), col("__cq").as("qvec"),
            col("__list").as("list_id")),
        "centroids" -> index.centroids.zipWithIndex
          .map { case (c, i) => (i, c) }.toDF("list_id", "centroid")
          .coalesce(1)),
      Seq((index.nlist, index.scale)).toDF("nlist", "scale"))
    ()
  }

  /** Bit-exact inverse of [[saveIvfIndex]] (newest complete
    * generation, via [[graft.model.IndexStore.load]]). */
  def loadIvfIndex(root: String)(
      implicit spark: org.apache.spark.sql.SparkSession): IvfIndex = {
    val (p, dir) = graft.model.IndexStore.load(spark, root)
    val (nlist, scale) = (p.getAs[Int]("nlist"), p.getAs[Int]("scale"))
    require(nlist >= 1 && scale >= 1,
      s"loadIvfIndex: bad params nlist=$nlist scale=$scale")
    IvfIndex(
      loadCentroids(s"$dir/centroids"),
      spark.read.parquet(s"$dir/lists")
        .select(col("neighbor_id"), col("qvec").as("__cq"),
          col("list_id").as("__list")),
      nlist, scale)
  }

  /** Train-once-reuse for IVF indexes (the [[trainOrLoadCentroids]]
    * contract): serving lineage is two parquet scans, never the
    * quantize-and-assign pass. */
  def trainOrLoadIvfIndex(root: String)(build: => IvfIndex)(
      implicit spark: org.apache.spark.sql.SparkSession): IvfIndex =
    try {
      val ix = loadIvfIndex(root)
      ix.lists.queryExecution.analyzed
      ix
    } catch { case _: org.apache.spark.sql.AnalysisException =>
      saveIvfIndex(build, root); loadIvfIndex(root) }

  /** Single-table portable-LSH top-k: bucket by [[portableSignature]],
    * exact cosine within shared buckets, per-query top-k. The DuckDB twin
    * reproduces the bucket partition exactly (integer arithmetic + md5
    * signs) and the ranking to the same tie-break, so the whole ANN
    * pipeline is hash-verifiable ([[graft.OracleSql]] q51). */
  def lshTopKPortable(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int, planes: Int = 4, scale: Int = 1000,
      excludeSelf: Boolean = true): DataFrame = {
    val dim = dimOf(corpus, vecCol)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), _.cast("double")).as("__cv"),
      portableSignature(col(vecCol), dim, planes, scale).as("__sig"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("__qv"),
      portableSignature(col(vecCol), dim, planes, scale).as("__sig"))
    val scored = c.join(broadcast(q), Seq("__sig"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id")
        else lit(true))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Multi-probe portable-LSH top-k (Lv et al. 2007, "Multi-Probe LSH:
    * Efficient Indexing for High-Dimensional Similarity Search" — the
    * standard fix for single-probe recall cliffs): each query probes its
    * own [[portableSignature]] bucket PLUS `nprobes - 1` buckets at
    * Hamming distance 1, flipping one sign bit per probe in plane order
    * (deterministic, so the oracle re-derives the identical probe set;
    * the paper's quality-ordered flips need per-query margins a portable
    * twin can't replay bit-for-bit). Probed buckets are distinct, so a
    * corpus row matches at most one probe — no candidate dedup needed.
    * Candidates are a strict superset of [[lshTopKPortable]]'s, so
    * recall can only improve; cost grows by ≤ nprobes× the probed
    * corpus fraction, still an equi-join on the signature. In-bucket
    * ranking is the q68 integer-exact cosine chain, output
    * (query_id, neighbor_id, rank). */
  def lshTopKMultiProbe(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int, planes: Int = 4, scale: Int = 1000, nprobes: Int = 3,
      excludeSelf: Boolean = true): DataFrame = {
    require(nprobes >= 1 && nprobes <= planes + 1,
      "1 <= nprobes <= planes + 1 (exact bucket + one flip per plane)")
    val dim = dimOf(corpus, vecCol)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      quantizeVec(col(vecCol), scale).as("__cq"),
      portableSignature(col(vecCol), dim, planes, scale).as("__sig"))
    val probeArr = array((0 until nprobes).map {
      case 0 => col("__sig")
      case j => col("__sig").bitwiseXOR(lit(1L << (j - 1)))
    }: _*)
    val q = queries.select(col(queryIdCol).as("query_id"),
        quantizeVec(col(vecCol), scale).as("__qq"),
        portableSignature(col(vecCol), dim, planes, scale).as("__sig"))
      .select(col("query_id"), col("__qq"),
        explode(probeArr).as("__probe"))
    val scored = c.join(broadcast(q), c("__sig") === q("__probe"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id")
        else lit(true))
      .withColumn("cosine",
        idot(col("__qq"), col("__cq")).cast("double") /
          sqrt(idot(col("__qq"), col("__qq")).cast("double") *
            idot(col("__cq"), col("__cq")).cast("double")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Floor-quantize a double centroid matrix (e.g. from
    * [[kmeansCentroids]]) into the integer domain the portable kernels
    * score in — the bridge that lets a Lloyd-refined quantizer drive
    * [[graft.operators.Dedup.semanticDedup]] and the portable IVF
    * assignment at production scale. */
  def quantizeCentroids(cs: Seq[Seq[Double]], scale: Int): Seq[Seq[Long]] =
    cs.map(_.map(x => math.floor(x * scale).toLong))

  /** Scalar-quantized (int8-style) exact top-k: every coordinate is floor
    * quantized to `levels` (default 127 → values fit a signed byte), and
    * ALL scoring runs in the integer domain — the memory/bandwidth story
    * at 100 TB is 4× fewer bytes per vector in the scored corpus (1 byte
    * vs float4 per dim; here carried as longs because Spark arrays are
    * boxed either way, but a columnar store would pack bytes), with
    * ranking by cosine over the quantized values. Engine-portable by the
    * same argument as [[ivfTopKPortable]]: exact integer dot/norms, one
    * identical-shape double chain for the ordering key. Output includes
    * the exact integer dot (`qdot`) so the oracle verifies the integer
    * kernel itself, not only the rank. */
  def quantizedTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int, levels: Int = 127, excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
        quantizeVec(col(vecCol), levels).as("__cq"))
      .withColumn("__cn", idot(col("__cq"), col("__cq")))
    val q = queries.select(col(queryIdCol).as("query_id"),
        quantizeVec(col(vecCol), levels).as("__qq"))
      .withColumn("__qn", idot(col("__qq"), col("__qq")))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("qdot", idot(col("__qq"), col("__cq")))
      .withColumn("cosine",
        col("qdot").cast("double") /
          sqrt(col("__qn").cast("double") * col("__cn").cast("double")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "qdot")
  }

  /** Product-quantization sub-codebooks (Jégou, Douze & Schmid 2011,
    * TPAMI, "Product quantization for nearest neighbor search"): the
    * vector space is split into `m` contiguous subspaces of dim/m
    * coordinates and an INDEPENDENT `ks`-centroid quantizer is trained
    * per subspace — reproduction values for the full space are the
    * cartesian product (ks^m cells) at the training cost of m small
    * codebooks. Training reuses [[kmeansCentroidsPortable]] verbatim on
    * the sliced sub-vectors (md5-sampled init on the SAME sampled rows
    * in every subspace — classic PQ trains all sub-quantizers on one
    * sample — then integer-domain Lloyd refinement), so every codebook
    * is engine-replayable and the q158 oracle unrolls all m trainings
    * as CTE chains. Returns `m` codebooks of `ks` centroids each, in
    * the quantized (×scale, floored) BIGINT domain. */
  def pqCodebooksPortable(
      corpus: DataFrame, vecCol: String, idCol: String,
      m: Int, ks: Int, iters: Int = 2, scale: Int = 1000): Seq[Seq[Seq[Long]]] = {
    val dim = dimOf(corpus, vecCol)
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val d = dim / m
    (0 until m).map { j =>
      kmeansCentroidsPortable(
        corpus.select(col(idCol).as("__id"),
          slice(col(vecCol), j * d + 1, d).as("__sub")),
        "__sub", "__id", ks, iters, scale)
    }
  }

  /** PQ-ADC top-k — the compressed-domain linear scan of Jégou et al.
    * 2011 §IV (asymmetric distance computation), the memory/bandwidth
    * backbone of billion-scale ANN (FAISS `IndexPQ`): every corpus
    * vector is stored as `m` sub-centroid CODES (m small ints ≈ m bytes
    * instead of 4·dim float bytes — 32× compression at m=8/dim=64), a
    * query precomputes one m×ks lookup table of exact integer squared-L2
    * distances to every sub-centroid, and the approximate distance to a
    * database vector is m TABLE LOOKUPS summed — no per-pair arithmetic
    * over coordinates at all.
    *
    * Every step is exact BIGINT over floor-quantized coordinates
    * (the [[ivfTopKPortable]] argument): sub-assignment ties go to the
    * lower centroid index via the (distance, index) struct min, and the
    * final ranking (approx_d ASC, neighbor-id-as-string ASC) is the
    * [[graft.functions.BottomK]] total order the DuckDB twin replays —
    * the codebooks, the codes, the LUT and the scan are ALL
    * hash-verified (q158).
    *
    * Scale shape: codebooks are driver literals (m·ks·dim/m longs —
    * KBs); encoding is one map over the corpus; the query side (LUTs
    * included) is `broadcast()`; scoring is a map-only broadcast
    * nested-loop scan of the CODES (never the raw vectors) with fan-out
    * |queries|; top-k is the bounded BottomK heap with map-side partial
    * aggregation, NOT a window sort — no shuffle anywhere scales with
    * corpus × queries beyond the heap merge. Compose with the IVF list
    * pruning of [[ivfTopKPortable]] (assign + probe on the coarse
    * quantizer, then ADC-score only probed lists) when a linear code
    * scan per query is still too much — the operators share the same
    * integer domain by construction. */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int, m: Int = 2, ks: Int = 4, iters: Int = 2, scale: Int = 1000,
      excludeSelf: Boolean = true,
      codebooks: Option[Seq[Seq[Seq[Long]]]] = None): DataFrame = {
    require(k > 0, "k must be positive")
    val dim = dimOf(corpus, vecCol)
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val d = dim / m
    val books = codebooks.getOrElse(
      pqCodebooksPortable(corpus, vecCol, idCol, m, ks, iters, scale))
    require(books.length == m && books.forall(_.length == ks),
      "codebooks must be m × ks")
    val idType = corpus.select(col(idCol)).schema.head.dataType
    def sqDistLit(sub: Column, c: Seq[Long]): Column =
      graft.functions.exprs.sq_l2_long(sub, typedlit(c)) // codegen (r21)
    def subOf(v: Column, j: Int): Column = slice(v, j * d + 1, d)
    // encode: nearest sub-centroid per subspace, ties to the lower index
    def codeOf(v: Column, j: Int): Column =
      array_min(array(books(j).zipWithIndex.map { case (c, i) =>
        struct(sqDistLit(subOf(v, j), c).as("d"), lit(i).as("i")) }: _*))
        .getField("i")
    val coded = corpus
      .select(col(idCol).as("neighbor_id"),
        quantizeVec(col(vecCol), scale).as("__q"))
      .select(col("neighbor_id"),
        array((0 until m).map(j => codeOf(col("__q"), j)): _*).as("codes"))
    // one LUT per query: m×ks exact sub-distances, flattened j-major
    val lut = array((for (j <- 0 until m; c <- 0 until ks)
      yield sqDistLit(subOf(col("__qq"), j), books(j)(c))): _*)
    val q = queries
      .select(col(queryIdCol).as("query_id"),
        quantizeVec(col(vecCol), scale).as("__qq"))
      .select(col("query_id"), lut.as("__lut"))
    coded.join(broadcast(q),
        if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("approx_d",
        aggregate(zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
            (c, j) => element_at(col("__lut"), (j * ks + c + 1).cast("int"))),
          lit(0L), (acc, e) => acc + e))
      .groupBy(col("query_id"))
      .agg(graft.functions.BottomK.bottom_k(col("approx_d"),
        col("neighbor_id").cast("string"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.value").cast(idType).as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.key").as("approx_d"))
  }

  /** IVF-PQ — the IVFADC index of Jégou et al. 2011 §V, the structure
    * billion-scale ANN deployments actually serve from (FAISS
    * `IndexIVFPQ`): the coarse quantizer PARTITIONS the corpus into
    * inverted lists (so a query scans only `nprobe` lists, not the
    * corpus), and within lists every vector is stored as the PQ codes
    * of its RESIDUAL v − centroid(list) — residuals concentrate around
    * zero, so the same ks^m cells resolve far finer than PQ on raw
    * vectors. A query probes its `nprobe` nearest lists, computes one
    * per-(query, list) LUT over the query's OWN residual against that
    * list's centroid, and ADC-scores candidates with m lookups each.
    *
    * Everything stays in the exact BIGINT domain: coarse assignment is
    * integer squared-L2 (ties to the lower index), residuals are exact
    * integer differences, the sub-quantizers train on residuals via
    * [[kmeansCentroidsPortable]] at scale 1 (residuals are already
    * quantized — floor(x·1) is the identity on integral doubles), and
    * ranking replays the [[graft.functions.BottomK]] total order — the
    * q162 oracle unrolls coarse training, assignment, residuals, all m
    * sub-quantizer trainings, encoding, probing, LUTs and the scan.
    *
    * Scale shape: [[ivfTopKPortable]]'s probe topology (lists
    * equi-join the broadcast probe set — a query touches nprobe/nlist
    * of the corpus) × [[pqTopK]]'s memory story (codes, not vectors,
    * in the scored stream; LUTs per (query, probe) instead of per
    * pair). Top-k is the bounded heap, map-side combined. */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int, nlist: Int = 8, nprobe: Int = 3, m: Int = 2, ks: Int = 4,
      iters: Int = 1, scale: Int = 1000,
      excludeSelf: Boolean = true): DataFrame = {
    require(k > 0 && nprobe >= 1 && nprobe <= nlist, "bad k/nprobe/nlist")
    val dim = dimOf(corpus, vecCol)
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val d = dim / m
    val cents = portableCentroids(corpus, vecCol, idCol, nlist, scale)
    val centsLit = typedlit(cents.map(_.toIndexedSeq).toIndexedSeq)
    // coarse assignment + exact integer residuals
    val listed = withNearestCentroidL(
        corpus.select(col(idCol).as("neighbor_id"),
          quantizeVec(col(vecCol), scale).as("__q")),
        cents, col("__q"), "__list")
      .withColumn("__rv", zip_with(col("__q"),
        element_at(centsLit, col("__list") + 1), (x, c) => x - c))
    // sub-quantizers train on the residuals (already integer: scale 1)
    val books = pqCodebooksPortable(
      listed.select(col("neighbor_id"),
        transform(col("__rv"), _.cast("double")).as("__rvd")),
      "__rvd", "neighbor_id", m, ks, iters, scale = 1)
    def sqDistLit(sub: Column, c: Seq[Long]): Column =
      graft.functions.exprs.sq_l2_long(sub, typedlit(c)) // codegen (r21)
    def subOf(v: Column, j: Int): Column = slice(v, j * d + 1, d)
    def codeOf(v: Column, j: Int): Column =
      array_min(array(books(j).zipWithIndex.map { case (c, i) =>
        struct(sqDistLit(subOf(v, j), c).as("d"), lit(i).as("i")) }: _*))
        .getField("i")
    val coded = listed.select(col("neighbor_id"), col("__list"),
      array((0 until m).map(j => codeOf(col("__rv"), j)): _*).as("codes"))
    // probe side: nprobe nearest lists per query, one LUT per (query, list)
    // over the query's residual against THAT list's centroid
    val probed = withSortedCentroidDistsL(
        queries.select(col(queryIdCol).as("query_id"),
          quantizeVec(col(vecCol), scale).as("__qq")),
        cents, col("__qq"), "__sd")
      .withColumn("__probe",
        slice(transform(col("__sd"), p => p.getField("i")), 1, nprobe))
      .select(col("query_id"), col("__qq"),
        explode(col("__probe")).as("__list"))
      .withColumn("__qr", zip_with(col("__qq"),
        element_at(centsLit, col("__list") + 1), (x, c) => x - c))
      .select(col("query_id"), col("__list"),
        array((for (j <- 0 until m; c <- 0 until ks)
          yield sqDistLit(subOf(col("__qr"), j), books(j)(c))): _*)
          .as("__lut"))
    val idType = corpus.select(col(idCol)).schema.head.dataType
    coded.join(broadcast(probed), Seq("__list"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id")
        else lit(true))
      .withColumn("approx_d",
        aggregate(zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
            (c, j) => element_at(col("__lut"), (j * ks + c + 1).cast("int"))),
          lit(0L), (acc, e) => acc + e))
      .groupBy(col("query_id"))
      .agg(graft.functions.BottomK.bottom_k(col("approx_d"),
        col("neighbor_id").cast("string"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.value").cast(idType).as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.key").as("approx_d"))
  }

  /** Two-stage IVF-PQ serving — [[ivfPqTopK]]'s ADC scan widened to
    * top-`r` candidates, then those r re-scored with EXACT integer
    * squared-L2 and re-ranked to top-k: the standard refinement stage
    * (FAISS `IndexRefineFlat`; Jégou et al. 2011 §V.C's re-ranking)
    * production IVF-PQ serving ships. ADC error now only has to keep
    * the true neighbors inside the top r — a far weaker ask than
    * ordering them — and the refine cost is r·dim integer ops per
    * query, paid on the candidate set only, never the corpus.
    * Refined recall ≥ the ADC-only recall at the same r (spec-gated).
    * Output: (query_id, neighbor_id, rank, d, approx_d) — both the
    * exact and the ADC distance, so the gap is observable. */
  def ivfPqRefineTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int, r: Int, nlist: Int = 8, nprobe: Int = 3, m: Int = 2,
      ks: Int = 4, iters: Int = 1, scale: Int = 1000,
      excludeSelf: Boolean = true): DataFrame = {
    require(r >= k, s"refine depth r=$r must be >= k=$k")
    val cands = ivfPqTopK(corpus, queries, vecCol, idCol, queryIdCol,
        r, nlist, nprobe, m, ks, iters, scale, excludeSelf)
      .select(col("query_id"), col("neighbor_id"), col("approx_d"))
    val idType = corpus.select(col(idCol)).schema.head.dataType
    val cq = corpus.select(col(idCol).as("neighbor_id"),
      quantizeVec(col(vecCol), scale).as("__cq"))
    val qq = queries.select(col(queryIdCol).as("query_id"),
      quantizeVec(col(vecCol), scale).as("__qq"))
    val rescored = cands
      .join(cq, Seq("neighbor_id"))
      .join(broadcast(qq), Seq("query_id"))
      .withColumn("d",
        graft.functions.exprs.sq_l2_long(col("__qq"), col("__cq")))
      .select(col("query_id"), col("neighbor_id"), col("d"),
        col("approx_d"))
      .localCheckpoint(false)
    rescored
      .groupBy(col("query_id"))
      .agg(graft.functions.BottomK.bottom_k(col("d"),
        col("neighbor_id").cast("string"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"),
        col("col.value").cast(idType).as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"), col("col.key").as("d"))
      .join(rescored.select(col("query_id"), col("neighbor_id"),
        col("approx_d")), Seq("query_id", "neighbor_id"))
  }

  /** Exact top-k under the portable integer metric (squared L2 over
    * floor-quantized vectors, ties (d, id-as-string)) — the ground
    * truth every approximate index in this family is graded against.
    * Brute force by design: broadcast queries, one map + the BottomK
    * heap merge. Use it on a QUERY SAMPLE (recall audits, q168), not
    * as a serving path. */
  def exactTopKPortable(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, queryIdCol: String,
      k: Int, scale: Int = 1000, excludeSelf: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    val idType = corpus.select(col(idCol)).schema.head.dataType
    val c = corpus.select(col(idCol).as("neighbor_id"),
      quantizeVec(col(vecCol), scale).as("__cq"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      quantizeVec(col(vecCol), scale).as("__qq"))
    c.join(broadcast(q),
        if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("d",
        graft.functions.exprs.sq_l2_long(col("__qq"), col("__cq")))
      .groupBy(col("query_id"))
      .agg(graft.functions.BottomK.bottom_k(col("d"),
        col("neighbor_id").cast("string"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.value").cast(idType).as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"), col("col.key").as("d"))
  }

  /** ANN recall audit — the tune→measure closer for the vector-index
    * family (the [[graft.operators.Dedup.lshFidelity]] convention
    * applied to ANN): run the approximate index and [[exactTopKPortable]]
    * over the same query sample and report per-query recall@k. An index
    * whose measured recall hasn't been looked at is a guess — at 100 TB
    * the sample is small (queries are the tiny side by construction)
    * while the audit exercises the full index build, so this is cheap
    * insurance before a trillion-row backfill. Output:
    * (query_id, n_exact, n_hits, recall). */
  def annRecallAudit(
      exact: DataFrame, approx: DataFrame): DataFrame =
    exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id"),
        lit(1L).as("__hit")), Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"), count(col("__hit")).as("n_hits"))
      .select(col("query_id"), col("n_exact"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_exact").cast("double"))
          .as("recall"))

  /** Late-interaction (MaxSim) retrieval over chunked documents —
    * ColBERT's scoring rule (Khattab & Zaharia 2020, SIGIR, "ColBERT:
    * Efficient and Effective Passage Search via Contextualized Late
    * Interaction") re-expressed relationally: a document is a BAG OF
    * CHUNK VECTORS (passage/token embeddings), a query is a bag of
    * token vectors, and
    *
    *   score(q, d) = Σ_{t ∈ q} max_{c ∈ d} ⟨t, c⟩
    *
    * — each query token finds its best-matching chunk independently,
    * so multi-topic documents aren't penalized the way single-vector
    * cosine penalizes them. Vectors quantize to the shared integer
    * domain ([[quantizeVec]]) and every dot product / max / sum is
    * exact BIGINT — both engines land on the identical score (the
    * q83/q122 convention; callers pre-normalize embeddings as ColBERT
    * does, making dot ≡ cosine). Chunks with no query interaction and
    * (query, doc) groups are never materialized beyond the aggregates.
    *
    * Scale shape: the query-token table broadcasts (queries are the
    * small serving side), the chunk-sized stage is ONE map (idot per
    * chunk×token, fan-out = |query tokens|), then two partial-friendly
    * hash aggregations — max over (query, token, doc), sum over
    * (query, doc) — and per-query top-k via the bounded
    * [[graft.functions.BottomK]] heap, NOT a window sort (the q100
    * argument: constant state per group, map-side pre-reduce). Ties
    * break (score DESC, doc-id-as-string ASC) — BottomK's total order,
    * which the q143 DuckDB twin replays verbatim.
    *
    * @param chunks one row per chunk: (docCol, vecCol)
    * @param queryTokens one row per query token: (queryIdCol,
    *        tokenIdCol, qVecCol); token ids make repeated identical
    *        tokens score independently, as MaxSim prescribes
    * @return (query_id, doc_id, rank, score) — `score` the exact
    *         BIGINT quantized MaxSim sum, rank 1..k per query */
  def maxSimTopK(
      chunks: DataFrame, docCol: String, vecCol: String,
      queryTokens: DataFrame, queryIdCol: String, tokenIdCol: String,
      qVecCol: String, k: Int, levels: Int = 127): DataFrame = {
    require(k > 0, "k must be positive")
    val idType = chunks.select(col(docCol)).schema.head.dataType
    val c = chunks.select(col(docCol).as("doc_id"),
      quantizeVec(col(vecCol), levels).as("__cq"))
    val q = queryTokens.select(col(queryIdCol).as("query_id"),
      col(tokenIdCol).as("__tok"), quantizeVec(col(qVecCol), levels).as("__tq"))
    c.join(broadcast(q))
      .groupBy(col("query_id"), col("__tok"), col("doc_id"))
      .agg(max(idot(col("__tq"), col("__cq"))).as("__best"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__best")).as("__score"))
      .groupBy(col("query_id"))
      .agg(graft.functions.BottomK.bottom_k(-col("__score"),
        col("doc_id").cast("string"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.value").cast(idType).as("doc_id"),
        (col("pos") + 1).cast("long").as("rank"),
        (-col("col.key")).as("score"))
  }

  /** Stateless per-row MaxSim scoring — the SERVING shape of
    * [[maxSimTopK]] (the [[graft.operators.TextAnalysis.bm25ScorePerRow]]
    * convention): the query token vectors are resolved DRIVER-side,
    * quantized once, and folded into the projection as array literals,
    * so scoring a document is a pure map over its own chunk-vector
    * array — zero shuffles, zero state — and the SAME code scores a
    * batch backfill or a `readStream` of incoming documents.
    *
    * Semantics match [[maxSimTopK]] exactly on the integer scores
    * (spec-gated bit equality): per token, MAX dot over the row's
    * chunks; per query, the sum over tokens in FIXED query order.
    * Chunk-less documents (empty array) are dropped up front,
    * mirroring the grouped form where a doc with no chunks simply has
    * no rows (the empty-max sentinel never reaches a score).
    *
    * @param docs one row per document: (docCol,
    *        chunksCol: array&lt;array&lt;float|double&gt;&gt;)
    * @param queries (query_id, token vectors) resolved driver-side —
    *        the serving-side model state, O(queries·tokens·dim)
    * @return (query_id, doc_id, score) — every (query, doc) pair with
    *         ≥ 1 chunk; rank/cut downstream */
  def maxSimScorePerRow(docs: DataFrame, docCol: String,
      chunksCol: String, queries: Seq[(Long, Seq[Seq[Double]])],
      levels: Int = 127): DataFrame = {
    require(queries.nonEmpty, "give the scorer at least one query")
    val qchunks = transform(col(chunksCol),
      c => transform(c, x => floor(x.cast("double") * levels).cast("long")))
    def tokenBest(tok: Seq[Long]): Column = {
      val tokLit = typedlit(tok)
      aggregate(col("__qc"),
        lit(Long.MinValue),
        (best, c) => greatest(best, idot(c, tokLit)))
    }
    val perQuery = queries.map { case (qid, toks) =>
      val qtoks = toks.map(t =>
        t.map(x => math.floor(x * levels).toLong))
      struct(lit(qid).as("query_id"),
        qtoks.map(tokenBest).reduce(_ + _).as("score"))
    }
    docs.select(col(docCol).as("doc_id"), qchunks.as("__qc"))
      .filter(size(col("__qc")) > 0)
      .select(col("doc_id"), explode(array(perQuery: _*)).as("q"))
      .select(col("q.query_id").as("query_id"), col("doc_id"),
        col("q.score").as("score"))
  }

  // ------------------------------------------------- quantizer persistence

  /** Persist a trained coarse quantizer (integer domain —
    * [[portableCentroids]] / [[kmeansCentroidsPortable]]) as a tiny
    * parquet model: one row per inverted list, `(list_id, centroid)`.
    * BIGINT coordinates round-trip parquet bit-exactly, so a loaded model
    * is indistinguishable from the trained one — a production pipeline
    * trains once and serves many runs from the artifact instead of
    * re-running Lloyd inside every query (the model is nlist×dim longs;
    * `coalesce(1)` keeps it a single file). */
  def saveCentroids(centroids: Seq[Seq[Long]], path: String)(
      implicit spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("list_id", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a quantizer saved by [[saveCentroids]], ordered by list id —
    * bit-exact inverse (spec-gated in `CentroidPersistenceSpec`). */
  def loadCentroids(path: String)(
      implicit spark: org.apache.spark.sql.SparkSession): Seq[Seq[Long]] =
    spark.read.parquet(path)
      .select(col("list_id"), col("centroid"))
      .orderBy(col("list_id"))
      .collect()
      .map(_.getSeq[Long](1).toIndexedSeq).toIndexedSeq

  /** Double-domain variants for [[kmeansCentroids]] models (used by
    * [[ivfTopK]]): IEEE doubles also round-trip parquet bit-exactly. */
  def saveCentroidsD(centroids: Seq[Seq[Double]], path: String)(
      implicit spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("list_id", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadCentroidsD(path: String)(
      implicit spark: org.apache.spark.sql.SparkSession): Seq[Seq[Double]] =
    spark.read.parquet(path)
      .select(col("list_id"), col("centroid"))
      .orderBy(col("list_id"))
      .collect()
      .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq

  /** Train-once-reuse: load the model at `path` if present, else train
    * via `train` and persist the result. The load path never touches the
    * corpus — at serving time only the probe joins run. */
  def trainOrLoadCentroids(path: String)(train: => Seq[Seq[Long]])(
      implicit spark: org.apache.spark.sql.SparkSession): Seq[Seq[Long]] =
    try loadCentroids(path)
    catch { case _: org.apache.spark.sql.AnalysisException =>
      val c = train; saveCentroids(c, path); c }

  /** Persist PQ sub-codebooks ([[pqCodebooksPortable]]) as one parquet
    * model: a row per (subspace, code) with its BIGINT sub-centroid —
    * bit-exact round trip, the [[saveCentroids]] convention for the PQ
    * family. A production IVF-PQ deployment persists the coarse
    * quantizer AND the sub-codebooks together; encoding new vectors and
    * serving queries then never re-touch the training corpus. */
  def savePqCodebooks(books: Seq[Seq[Seq[Long]]], path: String)(
      implicit spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    (for ((book, j) <- books.zipWithIndex; (c, i) <- book.zipWithIndex)
      yield (j, i, c))
      .toDF("subspace", "code", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Bit-exact inverse of [[savePqCodebooks]]. */
  def loadPqCodebooks(path: String)(
      implicit spark: org.apache.spark.sql.SparkSession): Seq[Seq[Seq[Long]]] =
    spark.read.parquet(path)
      .select(col("subspace"), col("code"), col("centroid"))
      .orderBy(col("subspace"), col("code"))
      .collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.map(_.getSeq[Long](2).toIndexedSeq).toIndexedSeq)

  /** Train-once-reuse for PQ models (the [[trainOrLoadCentroids]]
    * contract). */
  def trainOrLoadPqCodebooks(path: String)(train: => Seq[Seq[Seq[Long]]])(
      implicit spark: org.apache.spark.sql.SparkSession): Seq[Seq[Seq[Long]]] =
    try loadPqCodebooks(path)
    catch { case _: org.apache.spark.sql.AnalysisException =>
      val b = train; savePqCodebooks(b, path); b }

  // ------------------------------------------------------------ kNN graph

  /** k-nearest-neighbor GRAPH construction via NN-Descent (Dong,
    * Moses & Li, WWW 2011, "Efficient k-nearest neighbor graph
    * construction for generic similarity measures") — the backbone
    * the per-query strategies above don't give: EVERY node's k nearest
    * neighbors at once, the input single-linkage clustering
    * ([[Components.minimumSpanningForest]]), SemDeDup-style semantic
    * dedup, and graph-based ANN serving indexes are built from.
    *
    * The principle is "a neighbor of a neighbor is likely a
    * neighbor": start from an arbitrary k-neighbor graph and
    * iteratively offer every pair of co-neighbors (u, w ∈ B[v]) to
    * each other, keeping each node's k best — converging in a handful
    * of rounds regardless of metric. Expressed relationally, one
    * round is: symmetrize the current graph (forward ∪ reverse
    * edges, the reverse side CAPPED at k per node — Dong's reverse
    * sampling, which is what bounds a hub node's quadratic candidate
    * fan-out), self-join the capped adjacency on the pivot to emit
    * co-neighbor pairs, score each DISTINCT new pair once, pool with
    * the current edges, and take each node's bottom-k. No stage is
    * ever all-pairs: per round the candidate join emits ≤ C(2k,2)
    * pairs per (pivot, membership) — O(n·k²) scored pairs total —
    * and the per-node heap is the bounded [[graft.functions.BottomK]]
    * aggregate (constant state, partial-aggregation friendly), never
    * a window sort. Each round's graph is an eager tracked
    * checkpoint; previous generations are freed (the LPA/Borůvka
    * hygiene), so lineage stays one round deep at any scale.
    *
    * Everything is ENGINE-PORTABLE in the q92 convention: vectors
    * floor-quantize to BIGINT ([[quantizeVec]]), the metric is exact
    * integer squared L2, heap order is (distance, neighbor-id AS
    * STRING) — [[graft.functions.BottomK]]'s total order, which the
    * q152 DuckDB twin replays with `ORDER BY d, CAST(nb AS VARCHAR)`
    * round for round.
    *
    * Init: by default a deterministic md5-keyed ring — nodes are
    * ranked by (md5Long60(id·":nnd"), id) and node r's initial
    * neighbors are ranks r+1..r+k (mod n) — a portable stand-in for
    * random init that guarantees every node k distinct neighbors and
    * a connected start. The ranking is [[Ranks.globalRowNumber]] —
    * range-partitioned, distributed, never a single-task global
    * window (r21; the old Window.orderBy form was the library's last
    * single-task sort on a production path). A caller can still pass
    * `init` (e.g. pairs from [[lshTopKPortable]] buckets or an IVF
    * list self-join) to skip the ring entirely: NN-Descent's
    * convergence does not depend on the init's quality, only its
    * degree.
    *
    * @param vecs   one row per vector: (idCol, vecCol); NULL vectors
    *               are dropped
    * @param k      neighbors per node (the graph degree)
    * @param rounds NN-Descent iterations (2–4 converge in practice;
    *               the operator is deterministic, so a fixed budget
    *               is reproducible — there is no early-exit action
    *               per round to pay)
    * @param init   optional (id, nb) candidate edges replacing the
    *               ring init; scored and capped to k like any round.
    *               The init graph must CONNECT the corpus (or nearly):
    *               co-neighbor candidates can never cross a connected
    *               component, so a single-table LSH init — 16 disjoint
    *               bucket cliques — traps the descent inside each
    *               bucket forever (spec-demonstrated). Use TWO-plus
    *               independent LSH tables unioned (different plane
    *               sets overlap buckets into one component w.h.p.),
    *               or union any sparse connected graph into the seed;
    *               random init's real job in Dong et al. is exactly
    *               this connectivity
    * @return (id, neighbor_id, rank, d): rank 1..k ascending by
    *         (d, neighbor-id-as-string), d the exact integer squared
    *         L2 distance of the quantized vectors */
  def nnDescentPortable(
      vecs: DataFrame, vecCol: String, idCol: String,
      k: Int, rounds: Int, scale: Int = 1000,
      init: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 0, "rounds must be >= 0")
    val idType = vecs.select(col(idCol)).schema.head.dataType
    val (qvecs, qvCkpt) = CheckpointHygiene.checkpointTracked(
      vecs.filter(col(vecCol).isNotNull)
        .select(col(idCol).as("__vid"),
          quantizeVec(col(vecCol), scale).as("__q")),
      eager = true)
    def sq(a: Column, b: Column): Column =
      graft.functions.exprs.sq_l2_long(a, b) // codegen (r21)
    // score a distinct (id, nb) edge list: two equi-joins onto the
    // quantized vectors, one exact BIGINT distance per edge
    def score(edges: DataFrame): DataFrame = edges
      .join(qvecs.select(col("__vid").as("id"), col("__q").as("__qa")),
        Seq("id"))
      .join(qvecs.select(col("__vid").as("nb"), col("__q").as("__qb")),
        Seq("nb"))
      .select(col("id"), col("nb"), sq(col("__qa"), col("__qb")).as("d"))
    // per-node bottom-k of a (id, nb, d) pool by (d, nb-as-string) —
    // the bounded heap, exploded back to edge rows. The (id, nb) dedup
    // pre-pass exists because duplicate pairs would occupy two heap
    // slots; callers whose pool is already pair-unique (the reverse
    // cap: reversing unique forward edges keeps them unique) skip that
    // shuffle
    def topK(pool: DataFrame, preDeduped: Boolean = false): DataFrame = {
      val uniq =
        if (preDeduped) pool
        else pool.groupBy(col("id"), col("nb")).agg(min(col("d")).as("d"))
      uniq.groupBy(col("id"))
        .agg(graft.functions.BottomK.bottom_k(col("d"),
          col("nb").cast("string"), k).as("__top"))
        .select(col("id"), posexplode(col("__top")))
        .select(col("id"), col("col.value").cast(idType).as("nb"),
          (col("pos") + 1).cast("long").as("rank"), col("col.key").as("d"))
    }
    val init0 = init.getOrElse {
      // md5 ring: rank by (portable hash, id), neighbor j = rank+j mod n.
      // The rank is Ranks.globalRowNumber — distributed range-partitioned
      // ranking, NOT a global Window.orderBy, which would collapse the
      // whole vector set into one task (VERDICT r20 item 1: this was the
      // library's last single-task sort on a production path). (__key,
      // __vid) is a total order (__vid unique), so the ranks — and every
      // downstream hash — are identical to the window form's.
      val (ranked0, n) = Ranks.globalRowNumberAdaptive(
        qvecs.select(col("__vid"))
          .withColumn("__key", graft.functions.PortableHash.md5Long60(
            concat(col("__vid").cast("string"), lit(":nnd")))),
        Seq(col("__key"), col("__vid")), "__rn")
      val ranked = ranked0.select(col("__vid"), col("__rn"))
      require(n > k,
        s"nnDescentPortable: need more than k=$k vectors, got $n")
      ranked
        .select(col("__vid").as("id"), col("__rn"),
          explode(sequence(lit(1L), lit(k.toLong))).as("__j"))
        .select(col("id"),
          ((col("__rn") - 1L + col("__j")) % n + 1L).as("__rn2"))
        .join(ranked.select(col("__vid").as("nb"),
          col("__rn").as("__rn2")), Seq("__rn2"))
        .select(col("id"), col("nb"))
    }
    var (nbrs, nbrsCkpt) = CheckpointHygiene.checkpointTracked(
      topK(score(init0.filter(col("id") =!= col("nb")))), eager = true)
    (0 until rounds).foreach { _ =>
      val fwd = nbrs.select(col("id"), col("nb"))
      // Dong's reverse sampling: at most k reverse edges per node, the
      // best by the SAME total order — bounds hub fan-out at 2k
      val rev = topK(nbrs.select(col("nb").as("id"), col("id").as("nb"),
        col("d")), preDeduped = true).select(col("id"), col("nb"))
      val adj = fwd.unionByName(rev).distinct()
      val cand = adj.as("x").join(adj.as("y"),
          col("x.id") === col("y.id") && col("x.nb") < col("y.nb"))
        .select(col("x.nb").as("id"), col("y.nb").as("nb"))
        .distinct()
      // score each distinct pair ONCE; both orientations share the row
      val scored = score(cand)
      val pool = nbrs.select(col("id"), col("nb"), col("d"))
        .unionByName(scored)
        .unionByName(scored.select(col("nb").as("id"),
          col("id").as("nb"), col("d")))
      val (next, nc) = CheckpointHygiene.checkpointTracked(
        topK(pool), eager = true)
      CheckpointHygiene.free(nbrsCkpt)
      nbrs = next; nbrsCkpt = nc
    }
    CheckpointHygiene.free(qvCkpt)
    nbrs.select(col("id"), col("nb").as("neighbor_id"), col("rank"),
      col("d"))
  }

  /** Incremental kNN for NEW vectors by PROBING an existing
    * [[nnDescentPortable]] graph — the serving/ingest path that keeps
    * the kNN backbone maintainable at 100 TB: a batch of arrivals gets
    * its approximate neighbors WITHOUT re-running the descent over the
    * corpus. Cost shape is the [[graft.operators.Dedup
    * .incrementalDedup]] contract: the corpus VECTOR table is only
    * ever the probe side of broadcast joins (batch signatures, batch
    * vectors, and the batch-scale pair frames are the broadcast
    * sides), so corpus vectors never shuffle; the one corpus-shaped
    * shuffle is the NARROW edge-list symmetrization (3 longs per
    * edge). All iteration is batch-proportional.
    *
    * Two stages:
    *   1. SEED — two independent hyperplane-LSH tables (low/high
    *      nibble of one `2·tablePlanes`-plane [[portableSignature]];
    *      two tables, because the q152 spec's connectivity lesson
    *      applies to seeding coverage too) equi-join batch to corpus;
    *      co-bucket pairs are scored exactly (integer squared L2) and
    *      each batch node keeps its bottom-k. Each table's CORPUS side
    *      is capped at `seedCap` members per bucket (deterministic
    *      md5-rank — the IVF posting-cap convention), so the seed pair
    *      frame is ≤ 2·|batch|·seedCap REGARDLESS of how corpus mass
    *      piles into buckets: with 2^tablePlanes buckets fixed, an
    *      uncapped fat bucket makes seeding |batch|·|corpus|-shaped
    *      (the r15 soak found exactly this at 30× — replicated vectors
    *      collapse into few buckets and the probe OOMs). The cap is
    *      replayed in the DuckDB oracle, so the hash gate holds at any
    *      scale, active or not.
    *   2. EXPAND — `expandRounds` rounds of neighbor-of-neighbor
    *      candidates against the EXISTING graph (both orientations),
    *      scored once per distinct pair, pooled, re-heaped — the
    *      NN-Descent step restricted to the batch side, so each round
    *      costs O(|batch|·k·deg) scored pairs, never corpus². A batch
    *      node seeded into the wrong neighborhood walks toward the
    *      right one along graph edges.
    *
    * Heap order is the [[nnDescentPortable]] total order, so the q157
    * DuckDB twin replays seeding, the expansion round, and every heap
    * bit-for-bit.
    *
    * @param graph  existing kNN edges over `corpus`:
    *               (id, neighbor_id, d) — [[nnDescentPortable]] output
    * @return (id, neighbor_id, rank, d) for BATCH ids only; merge
    *         with `graph` (and optionally re-heap affected corpus
    *         nodes against the same scored pairs) to persist */
  /** Two-table hyperplane-LSH seed pairs (`id` = small side, `nb` =
    * corpus side) shared by the probe and beam seeding paths. The
    * CORPUS side of each table is capped at `seedCap` members per
    * bucket by a deterministic md5-':seedcap' rank (the IVF
    * posting-cap convention; the q157 oracle CTEs replay it), keeping
    * the pair frame ≤ 2·|small|·seedCap even when corpus mass piles
    * into few of the 2^tablePlanes buckets. The rank is a
    * bucket-partitioned window over NARROW rows (id, bucket, key) —
    * no global sort; with very fat buckets the per-bucket sort is the
    * cost, which is the signal to raise `tablePlanes` (more, smaller
    * buckets), exactly as with IVF list counts. */
  private def lshSeedPairs(
      small: DataFrame, cPrep: DataFrame, tablePlanes: Int,
      seedCap: Int): DataFrame = {
    val mask = (1L << tablePlanes) - 1L
    def table(df: DataFrame, t: Int): DataFrame = df.select(
      col("__vid"),
      (if (t == 0) col("__sig").bitwiseAND(mask)
       else shiftright(col("__sig"), tablePlanes)).as("__b"))
    def capped(df: DataFrame): DataFrame = df
      .withColumn("__sk", graft.functions.PortableHash.md5Long60(
        concat(col("__vid").cast("string"), lit(":seedcap"))))
      .withColumn("__srn", row_number().over(
        Window.partitionBy(col("__b"))
          .orderBy(col("__sk"), col("__vid"))))
      .filter(col("__srn") <= seedCap)
      .select(col("__vid"), col("__b"))
    (0 to 1).map { t =>
      broadcast(table(small, t).select(col("__vid").as("id"), col("__b")))
        .join(capped(table(cPrep, t)).select(col("__vid").as("nb"),
          col("__b")), Seq("__b"))
        .select(col("id"), col("nb"))
    }.reduce(_.unionByName(_)).distinct()
  }

  /** Exact integer squared-L2 scoring of a slim (id, nb) pair list
    * against quantized vector tables, arranged so NOTHING fat is ever
    * broadcast OR shuffled: the corpus table is the probe side of a
    * broadcast join on the SLIM pair list, then the small side's
    * vectors (batch/query-scale) attach via a second broadcast —
    * map-only end to end. The r15 soak's OOM was the previous
    * arrangement (pairs ⋈ small-side vectors, broadcast as one frame):
    * a pair frame that carries a 64-int vector per row stops being
    * broadcastable the moment seeding is not batch-proportional. */
  private def scorePairsSlim(
      pairs: DataFrame, smallPrep: DataFrame,
      cPrep: DataFrame): DataFrame = {
    def sq(a: Column, b: Column): Column =
      graft.functions.exprs.sq_l2_long(a, b) // codegen (r21)
    cPrep.select(col("__vid").as("nb"), col("__q").as("__qb"))
      .join(broadcast(pairs), Seq("nb"))
      .join(broadcast(smallPrep.select(col("__vid").as("id"),
        col("__q").as("__qa"))), Seq("id"))
      .select(col("id"), col("nb"), sq(col("__qa"), col("__qb")).as("d"))
  }

  def knnGraphProbePortable(
      graph: DataFrame, corpus: DataFrame, batch: DataFrame,
      vecCol: String, idCol: String, k: Int, expandRounds: Int = 1,
      scale: Int = 1000, tablePlanes: Int = 4,
      seedCap: Int = 256): DataFrame = {
    require(k >= 1 && expandRounds >= 0 && tablePlanes >= 1 &&
      seedCap >= 1)
    val idType = corpus.select(col(idCol)).schema.head.dataType
    def prep(df: DataFrame): DataFrame = {
      val dim = dimOf(df, vecCol)
      df.filter(col(vecCol).isNotNull)
        .select(col(idCol).as("__vid"),
          quantizeVec(col(vecCol), scale).as("__q"),
          portableSignature(col(vecCol), dim, 2 * tablePlanes, scale)
            .as("__sig"))
    }
    val cPrep = prep(corpus)
    val (bPrep, bCkpt) = CheckpointHygiene.checkpointTracked(
      prep(batch), eager = true)
    val seeds = lshSeedPairs(bPrep, cPrep, tablePlanes, seedCap)
    def score(pairs: DataFrame): DataFrame =
      scorePairsSlim(pairs, bPrep, cPrep)
    def topK(pool: DataFrame): DataFrame = pool
      .groupBy(col("id"), col("nb")).agg(min(col("d")).as("d"))
      .groupBy(col("id"))
      .agg(graft.functions.BottomK.bottom_k(col("d"),
        col("nb").cast("string"), k).as("__top"))
      .select(col("id"), posexplode(col("__top")))
      .select(col("id"), col("col.value").cast(idType).as("nb"),
        (col("pos") + 1).cast("long").as("rank"), col("col.key").as("d"))
    val und = graph.select(col("id").as("c"), col("neighbor_id").as("c2"))
      .unionByName(graph.select(col("neighbor_id").as("c"),
        col("id").as("c2")))
      .distinct()
    var (nbrs, nbrsCkpt) = CheckpointHygiene.checkpointTracked(
      topK(score(seeds)), eager = true)
    (0 until expandRounds).foreach { _ =>
      val cand = nbrs.select(col("id"), col("nb").as("c"))
        .join(und, Seq("c"))
        .select(col("id"), col("c2").as("nb"))
        .distinct()
      val pool = nbrs.select(col("id"), col("nb"), col("d"))
        .unionByName(score(cand))
      val (next, nc) = CheckpointHygiene.checkpointTracked(
        topK(pool), eager = true)
      CheckpointHygiene.free(nbrsCkpt)
      nbrs = next; nbrsCkpt = nc
    }
    CheckpointHygiene.free(bCkpt)
    nbrs.select(col("id"), col("nb").as("neighbor_id"), col("rank"),
      col("d"))
  }

  /** Greedy BEAM SEARCH over an existing [[nnDescentPortable]] kNN
    * graph — q157's single expansion formalized into the query-time
    * serving loop (HNSW's search layer without the hierarchy, Malkov &
    * Yashunin 2018): seed each query from two LSH tables, keep a beam
    * of the `ef` best scored corpus nodes, expand the beam along graph
    * edges, score only UNSEEN (query, node) pairs, and stop when a
    * round leaves every beam unchanged. `ef` is the quality dial:
    * recall@k grows monotonically with it (spec-measured) at linear
    * scored-pairs cost, and the visited-set dedup means budget is spent
    * only on NEW information — at equal scored-pairs budget this beats
    * re-scoring sweeps (the q157 probe rescans overlapping
    * neighborhoods every round).
    *
    * [[knnGraphProbePortable]] is EXACTLY this loop with `ef = k`, no
    * dedup, and no stop (bottom-k of a union telescopes through
    * intermediate heaps, so the iterated-heap and accumulated-pool
    * forms agree — spec-asserted row-for-row), which is what makes the
    * two honestly comparable.
    *
    * Scale shape: the q157 contract — corpus vectors only ever the
    * probe side of equi-joins, per-round frames query-proportional
    * (≤ |queries|·ef·deg), graph symmetrization the one corpus-shaped
    * narrow shuffle, per-round eager checkpoints with freed
    * predecessors. Early-stop reads ONE scalar per round.
    *
    * @param ef    beam width (≥ k); the returned heaps are the top-k
    *              of the final beam
    * @return ((id, neighbor_id, rank, d) for query ids, distinct
    *         scored-pairs budget actually spent) */
  def beamSearchStats(
      graph: DataFrame, corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, ef: Int, maxRounds: Int,
      stopOnNoImprove: Boolean = true, dedupVisited: Boolean = true,
      scale: Int = 1000, tablePlanes: Int = 4,
      seedCap: Int = 256): (DataFrame, Long) =
    beamSearchImpl(graph, corpus, queries, vecCol, idCol, k, ef,
      maxRounds, stopOnNoImprove, dedupVisited, scale, tablePlanes,
      seedCap, trackBudget = true)

  /** Shared loop behind [[beamSearchStats]]/[[beamSearchPortable]].
    * `trackBudget = false` (the serving path) skips the per-round
    * `count` actions entirely — the budget statistic costs one extra
    * job per round and serving callers discard it. Either way the
    * candidate frame is eagerly checkpointed once per round, so the
    * expansion/anti-join is never computed twice (once for the count,
    * once for scoring). */
  private def beamSearchImpl(
      graph: DataFrame, corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, ef: Int, maxRounds: Int,
      stopOnNoImprove: Boolean, dedupVisited: Boolean,
      scale: Int, tablePlanes: Int, seedCap: Int,
      trackBudget: Boolean,
      seedsOverride: Option[DataFrame] = None)
      : (DataFrame, Long) = {
    require(k >= 1 && ef >= k && maxRounds >= 0 && tablePlanes >= 1 &&
      seedCap >= 1)
    val idType = corpus.select(col(idCol)).schema.head.dataType
    def prep(df: DataFrame): DataFrame = {
      val dim = dimOf(df, vecCol)
      df.filter(col(vecCol).isNotNull)
        .select(col(idCol).as("__vid"),
          quantizeVec(col(vecCol), scale).as("__q"),
          portableSignature(col(vecCol), dim, 2 * tablePlanes, scale)
            .as("__sig"))
    }
    val cPrep = prep(corpus)
    val (qPrep, qCkpt) = CheckpointHygiene.checkpointTracked(
      prep(queries), eager = true)
    // caller-supplied seeds (the hierarchical layer path) replace the
    // LSH tables; everything downstream — scoring, the visited set,
    // the beam loop — is seed-source-oblivious
    val seeds = seedsOverride
      .map(_.select(col("id"), col("nb")))
      .getOrElse(lshSeedPairs(qPrep, cPrep, tablePlanes, seedCap))
    def score(pairs: DataFrame): DataFrame =
      scorePairsSlim(pairs, qPrep, cPrep)
    def heap(pool: DataFrame, width: Int): DataFrame = pool
      .groupBy(col("id"), col("nb")).agg(min(col("d")).as("d"))
      .groupBy(col("id"))
      .agg(graft.functions.BottomK.bottom_k(col("d"),
        col("nb").cast("string"), width).as("__top"))
      .select(col("id"), posexplode(col("__top")))
      .select(col("id"), col("col.value").cast(idType).as("nb"),
        (col("pos") + 1).cast("long").as("rank"), col("col.key").as("d"))
    val und = graph.select(col("id").as("c"), col("neighbor_id").as("c2"))
      .unionByName(graph.select(col("neighbor_id").as("c"),
        col("id").as("c2")))
      .distinct()
    val (seedsCk, seedsCkpt) = CheckpointHygiene.checkpointTracked(
      seeds, eager = true)
    var budget = if (trackBudget) seedsCk.count() else 0L
    var (beam, beamCkpt) = CheckpointHygiene.checkpointTracked(
      heap(score(seedsCk), ef), eager = true)
    // visited keys (id, nb): only tracked when dedup is on
    var (visited, visCkpt) =
      if (dedupVisited)
        CheckpointHygiene.checkpointTracked(
          seedsCk.select(col("id"), col("nb")), eager = true)
      else (null: DataFrame, Seq.empty[org.apache.spark.rdd.RDD[_]])
    CheckpointHygiene.free(seedsCkpt)
    var r = 0
    var converged = false
    while (r < maxRounds && !converged) {
      val cand0 = beam.select(col("id"), col("nb").as("c"))
        .join(und, Seq("c"))
        .select(col("id"), col("c2").as("nb"))
        .distinct()
      val (cand, candCkpt) = CheckpointHygiene.checkpointTracked(
        if (dedupVisited)
          cand0.join(visited, Seq("id", "nb"), "left_anti") else cand0,
        eager = true)
      if (trackBudget) budget += cand.count()
      val (next, nc) = CheckpointHygiene.checkpointTracked(
        heap(beam.select(col("id"), col("nb"), col("d"))
          .unionByName(score(cand)), ef), eager = true)
      if (dedupVisited) {
        val (nv, nvc) = CheckpointHygiene.checkpointTracked(
          visited.unionByName(cand.select(col("id"), col("nb"))),
          eager = true)
        CheckpointHygiene.free(visCkpt)
        visited = nv; visCkpt = nvc
      }
      CheckpointHygiene.free(candCkpt)
      if (stopOnNoImprove) {
        // beams are exactly-ef heaps under one total order: set equality
        // ⟺ the anti-join is empty (one scalar per round)
        converged = next.select(col("id"), col("nb"))
          .join(beam.select(col("id"), col("nb")), Seq("id", "nb"),
            "left_anti").isEmpty
      }
      CheckpointHygiene.free(beamCkpt)
      beam = next; beamCkpt = nc
      r += 1
    }
    if (visCkpt.nonEmpty) CheckpointHygiene.free(visCkpt)
    CheckpointHygiene.free(qCkpt)
    val out = beam.filter(col("rank") <= k)
      .select(col("id"), col("nb").as("neighbor_id"), col("rank"),
        col("d"))
    (out, budget)
  }

  /** [[beamSearchStats]] without the budget — the serving entry point. */
  def beamSearchPortable(
      graph: DataFrame, corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, ef: Int, maxRounds: Int,
      stopOnNoImprove: Boolean = true, scale: Int = 1000,
      tablePlanes: Int = 4, seedCap: Int = 256): DataFrame =
    beamSearchImpl(graph, corpus, queries, vecCol, idCol, k, ef,
      maxRounds, stopOnNoImprove, dedupVisited = true, scale,
      tablePlanes, seedCap, trackBudget = false)._1

  /** Two-layer HNSW-style serving — [[beamSearchPortable]] with the
    * LSH seed tables replaced by a NAVIGABLE TOP LAYER (Malkov &
    * Yashunin 2018, reduced to the two layers that matter at
    * data-pipeline scale): queries first beam over a small sampled
    * sub-corpus's own kNN graph (`layerGraph` over `layerCorpus`,
    * typically 1-in-layerMod nodes — built once, persistable via
    * [[trainOrLoadKnnGraph]] like the base backbone), and each query's
    * layer-1 heap BECOMES its layer-0 seed set. Geometry does the
    * seeding instead of hash buckets: a layer-1 beam lands next to the
    * query's true neighborhood by construction, where LSH seeding
    * depends on bucket geometry and needs the per-bucket cap to stay
    * batch-proportional.
    *
    * Both stages are the SAME portable beam loop (layer-1 is
    * [[beamSearchStats]] with k = ef = `efL1`; layer-0 is the loop with
    * `seedsOverride`), so the q189 oracle replays hierarchy, heaps,
    * visited-set accounting, and budget bit-for-bit. The layer-0
    * visited set initializes to the layer-1 seeds — seed pairs are
    * never re-scored by the expansion rounds, same as the LSH path.
    *
    * Scale shape: layer-1 costs |queries|·efL1·deg-ish scored pairs
    * over a corpus/layerMod-sized table; layer-0 inherits the q183
    * contract (corpus vectors only ever probe sides, per-round frames
    * query-proportional). The returned budget is the TOTAL distinct
    * scored-pairs spend across both layers — the honest number to
    * compare against flat [[beamSearchStats]] (spec-measured:
    * near-parity recall with flat seeding at a bounded combined
    * budget on the sf0.01 corpus, and recall monotone in `efL1`).
    *
    * @param layerGraph kNN edges over `layerCorpus`
    *                   ([[nnDescentPortable]] output)
    * @param efL1  layer-1 beam width = number of seeds handed down
    * @return ((id, neighbor_id, rank, d) for query ids, total scored
    *         budget) */
  def hierarchicalBeamSearchStats(
      graph: DataFrame, corpus: DataFrame, layerGraph: DataFrame,
      layerCorpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, ef: Int, maxRounds: Int,
      efL1: Int, maxRoundsL1: Int = 1,
      stopOnNoImprove: Boolean = true, scale: Int = 1000,
      tablePlanes: Int = 4, seedCap: Int = 256): (DataFrame, Long) = {
    require(efL1 >= 1, "efL1 must be >= 1")
    val (l1, budgetL1) = beamSearchImpl(layerGraph, layerCorpus,
      queries, vecCol, idCol, efL1, efL1, maxRoundsL1,
      stopOnNoImprove, dedupVisited = true, scale, tablePlanes,
      seedCap, trackBudget = true)
    val seeds = l1.select(col("id"), col("neighbor_id").as("nb"))
    val (out, budgetL0) = beamSearchImpl(graph, corpus, queries,
      vecCol, idCol, k, ef, maxRounds, stopOnNoImprove,
      dedupVisited = true, scale, tablePlanes, seedCap,
      trackBudget = true, seedsOverride = Some(seeds))
    (out, budgetL1 + budgetL0)
  }

  /** [[hierarchicalBeamSearchStats]] without the budget — the serving
    * entry point (budget counting costs one extra job per round). */
  def hierarchicalBeamSearch(
      graph: DataFrame, corpus: DataFrame, layerGraph: DataFrame,
      layerCorpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, ef: Int, maxRounds: Int,
      efL1: Int, maxRoundsL1: Int = 1,
      stopOnNoImprove: Boolean = true, scale: Int = 1000,
      tablePlanes: Int = 4, seedCap: Int = 256): DataFrame = {
    require(efL1 >= 1, "efL1 must be >= 1")
    val l1 = beamSearchImpl(layerGraph, layerCorpus, queries, vecCol,
      idCol, efL1, efL1, maxRoundsL1, stopOnNoImprove,
      dedupVisited = true, scale, tablePlanes, seedCap,
      trackBudget = false)._1
    val seeds = l1.select(col("id"), col("neighbor_id").as("nb"))
    beamSearchImpl(graph, corpus, queries, vecCol, idCol, k, ef,
      maxRounds, stopOnNoImprove, dedupVisited = true, scale,
      tablePlanes, seedCap, trackBudget = false,
      seedsOverride = Some(seeds))._1
  }

  /** MERGE a batch into an existing [[nnDescentPortable]] kNN graph —
    * the maintenance path [[knnGraphProbePortable]] deliberately leaves
    * open (its contract: batch heaps only, graph unchanged). A
    * production index must ABSORB arrivals without re-descending the
    * corpus (VERDICT r13 item 2); this is Dong et al.'s incremental
    * insight applied once: after an insert, the only information that
    * changed is batch-incident, so one NEW-edge-restricted descent
    * round reconciles the neighborhood.
    *
    * Three stages, all batch-proportional beyond narrow edge-list
    * shuffles (3-long rows):
    *   1. PROBE — [[knnGraphProbePortable]] gives each batch node its
    *      bottom-k heap (seed tables + expansion; corpus vectors never
    *      shuffle).
    *   2. REVERSE UPDATE — every probed edge (b → o) is offered back
    *      to its corpus endpoint: affected old nodes (those appearing
    *      in a batch heap) re-heap over {their existing edges} ∪
    *      {reversed probed edges}; unaffected nodes' rows pass through
    *      untouched (left_anti — no recompute).
    *   3. LOCAL ROUND — one NN-Descent round restricted to NEW
    *      information: since every edge the merge added touches a batch
    *      node, a co-neighbor offer (u, w) from pivot v can only have
    *      changed when v, u, or w is a batch node. Candidates are
    *      generated ONLY under that predicate (batch-pivot cliques +
    *      batch-endpoint edges joined against the pivot's adjacency —
    *      O(|batch|·k·deg) scored pairs, never corpus²), scored once
    *      per distinct normalized pair, and ONLY nodes that received a
    *      candidate re-heap; everyone else's rows pass through.
    *
    * Heap order, quantization, metric, and the reverse cap are all the
    * [[nnDescentPortable]] total order, so a DuckDB twin replays the
    * whole merge round for round (q180); re-heaping an unchanged heap
    * is the identity, which is why the twin may re-heap uniformly while
    * this side re-heaps selectively — same rows either way.
    *
    * @param graph existing kNN edges over `corpus`: (id, neighbor_id,
    *              rank, d) — [[nnDescentPortable]] output
    * @return the merged graph (id, neighbor_id, rank, d) over
    *         corpus ∪ batch ids — same shape as [[nnDescentPortable]],
    *         so consumers (MSF linkage, serving probes) are oblivious */
  def knnGraphMerge(
      graph: DataFrame, corpus: DataFrame, batch: DataFrame,
      vecCol: String, idCol: String, k: Int, expandRounds: Int = 1,
      scale: Int = 1000, tablePlanes: Int = 4,
      seedCap: Int = 256): DataFrame = {
    require(k >= 1 && expandRounds >= 0 && tablePlanes >= 1)
    val idType = corpus.select(col(idCol)).schema.head.dataType
    val (probed, probedCkpt) = CheckpointHygiene.checkpointTracked(
      knnGraphProbePortable(graph, corpus, batch, vecCol, idCol, k,
        expandRounds, scale, tablePlanes, seedCap), eager = true)
    val batchIds = batch.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__bid"))
    def quant(df: DataFrame): DataFrame = df
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__vid"), quantizeVec(col(vecCol), scale).as("__q"))
    // batch ∪ corpus vectors: the local round's pairs may be
    // corpus–corpus (batch pivot), so scoring needs both sides
    val allVecs = quant(corpus).unionByName(quant(batch))
    def sq(a: Column, b: Column): Column =
      graft.functions.exprs.sq_l2_long(a, b) // codegen (r21)
    // edge lists here are batch-proportional; the vector table is the
    // big probe side of both equi-joins (the knnGraphProbePortable shape)
    def score(edges: DataFrame): DataFrame = broadcast(edges)
      .join(allVecs.select(col("__vid").as("id"), col("__q").as("__qa")),
        Seq("id"))
      .join(allVecs.select(col("__vid").as("nb"), col("__q").as("__qb")),
        Seq("nb"))
      .select(col("id"), col("nb"), sq(col("__qa"), col("__qb")).as("d"))
    def topK(pool: DataFrame): DataFrame = pool
      .groupBy(col("id"), col("nb")).agg(min(col("d")).as("d"))
      .groupBy(col("id"))
      .agg(graft.functions.BottomK.bottom_k(col("d"),
        col("nb").cast("string"), k).as("__top"))
      .select(col("id"), posexplode(col("__top")))
      .select(col("id"), col("col.value").cast(idType).as("nb"),
        (col("pos") + 1).cast("long").as("rank"), col("col.key").as("d"))
    val gEdges = graph.select(col("id"), col("neighbor_id").as("nb"),
      col("rank"), col("d"))
    val pEdges = probed.select(col("id"), col("neighbor_id").as("nb"),
      col("rank"), col("d"))
    // 2. reverse update: affected old nodes re-heap, others pass through
    val revProbe = pEdges.select(col("nb").as("id"), col("id").as("nb"),
      col("d"))
    val affected = revProbe.select(col("id")).distinct()
    val affectedHeap = topK(
      gEdges.join(broadcast(affected), Seq("id"), "left_semi")
        .select(col("id"), col("nb"), col("d"))
        .unionByName(revProbe))
    val (merged0, m0Ckpt) = CheckpointHygiene.checkpointTracked(
      gEdges.join(broadcast(affected), Seq("id"), "left_anti")
        .unionByName(affectedHeap)
        .unionByName(pEdges), eager = true)
    // 3. one local descent round over NEW information only
    val fwd = merged0.select(col("id"), col("nb"))
    val rev = topK(merged0.select(col("nb").as("id"), col("id").as("nb"),
        col("d"))).select(col("id"), col("nb"))
    val adj = fwd.unionByName(rev).distinct()
    val adjB = adj.join(broadcast(batchIds.select(col("__bid").as("id"))),
      Seq("id"), "left_semi")
    // batch-pivot cliques: both offers come from a batch node's adjacency
    val candPivot = adjB.as("x").join(adjB.as("y"),
        col("x.id") === col("y.id") && col("x.nb") < col("y.nb"))
      .select(col("x.nb").as("id"), col("y.nb").as("nb"))
    // batch-endpoint offers: a NEW edge (v → b∈batch) meets every other
    // edge of pivot v; normalized so each unordered pair scores once
    val newAdj = adj.join(broadcast(batchIds.select(col("__bid").as("nb"))),
      Seq("nb"), "left_semi")
    val candNew = newAdj.as("x").join(adj.as("y"),
        col("x.id") === col("y.id") && col("x.nb") =!= col("y.nb"))
      .select(least(col("x.nb"), col("y.nb")).as("id"),
        greatest(col("x.nb"), col("y.nb")).as("nb"))
    val cand = candPivot.unionByName(candNew).distinct()
    val (scored, scCkpt) = CheckpointHygiene.checkpointTracked(
      score(cand), eager = true)
    // only nodes that received a candidate re-heap (both orientations
    // pool); everyone else's merged0 rows are already their heap
    val touched = scored.select(col("id"))
      .unionByName(scored.select(col("nb").as("id"))).distinct()
    val touchedHeap = topK(
      merged0.join(touched, Seq("id"), "left_semi")
        .select(col("id"), col("nb"), col("d"))
        .unionByName(scored)
        .unionByName(scored.select(col("nb").as("id"), col("id").as("nb"),
          col("d"))))
    val (out, _) = CheckpointHygiene.checkpointTracked(
      merged0.join(touched, Seq("id"), "left_anti")
        .unionByName(touchedHeap)
        .select(col("id"), col("nb").as("neighbor_id"), col("rank"),
          col("d")), eager = true)
    // out is materialized; every intermediate generation can go (the
    // nnDescentPortable hygiene — lineage never deeper than one stage)
    CheckpointHygiene.free(probedCkpt)
    CheckpointHygiene.free(m0Ckpt)
    CheckpointHygiene.free(scCkpt)
    out
  }

  /** Persist a kNN graph ([[nnDescentPortable]] /[[knnGraphMerge]]
    * output) as a parquet model — the [[saveCentroids]]/
    * [[savePqCodebooks]] convention extended to the descent backbone
    * (VERDICT r14 item 5): q157 probes, q180 merges, and q183 beam
    * serving can then load the index across sessions instead of
    * re-descending or relying on a session memo. Bit-exact round trip
    * (integer distances, long ranks). */
  def saveKnnGraph(graph: DataFrame, path: String): Unit =
    graph.select(col("id"), col("neighbor_id"), col("rank"), col("d"))
      .write.mode("overwrite").parquet(path)

  /** Bit-exact inverse of [[saveKnnGraph]]. */
  def loadKnnGraph(path: String)(
      implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read.parquet(path)
      .select(col("id"), col("neighbor_id"), col("rank"), col("d"))

  /** Train-once-reuse for the descent backbone (the
    * [[trainOrLoadCentroids]] contract): load the graph at `path` if
    * present, else build it via `build`, persist, and serve from the
    * PERSISTED copy — the load path's lineage is the parquet scan, so
    * serving queries never re-touch the corpus or the build plan. */
  def trainOrLoadKnnGraph(path: String)(build: => DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
    try { val g = loadKnnGraph(path); g.queryExecution.analyzed; g }
    catch { case _: org.apache.spark.sql.AnalysisException =>
      saveKnnGraph(build, path); loadKnnGraph(path) }

  /** Contrastive TRIPLET MINING from the kNN backbone — the
    * training-data op that closes the embedding loop: the pipeline
    * builds a kNN graph for dedup/serving anyway, and the same graph
    * is exactly where contrastive training pairs come from (the
    * in-batch/ANN-negatives recipe of Karpukhin et al. 2020 (DPR) and
    * the hard-negative literature). Per anchor: its top `perTriplet`
    * graph neighbors are the POSITIVES; NEGATIVES are drawn
    * deterministically from the md5 ring (the [[nnDescentPortable]]
    * init convention — ring order is md5-random, so ring successors
    * are a uniform sample), skipping ring hits that are the anchor
    * itself or among its graph neighbors. Triplet i pairs positive
    * rank i with the i-th surviving ring negative; both sides carry
    * their EXACT integer distance so a consumer can filter semi-hard
    * negatives (`neg_d > pos_d`) or margin-violating ones without
    * re-scoring.
    *
    * Every choice is portable: ring rank, successor walk, skip rule,
    * and distances all replay in the q192 oracle. Determinism is the
    * point — a re-mined dataset is bit-identical, so training corpora
    * built from it are reproducible artifacts.
    *
    * Scale shape: one distributed md5-rank of ids
    * ([[Ranks.globalRowNumber]] — the [[nnDescentPortable]] init
    * convention, never a single-task window), a sequence-explode of
    * `perTriplet + k + 1` ring successors per anchor (bounded
    * fan-out), one anti-join against the graph's edge list, and two
    * narrow vector joins for the exact distances — output-proportional
    * like the mining itself; corpus vectors never broadcast.
    *
    * @param perTriplet triplets per anchor (requires the corpus to
    *                   have more than perTriplet + k + 1 nodes)
    * @return (id, pos_id, neg_id, rank, pos_d, neg_d) — `rank` is the
    *         1-based triplet index per anchor */
  def tripletMining(graph: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int, perTriplet: Int = 2,
      scale: Int = 1000): DataFrame = {
    require(perTriplet >= 1, "need at least one triplet per anchor")
    val idType = corpus.select(col(idCol)).schema.head.dataType
    val qvecs = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__vid"),
        quantizeVec(col(vecCol), scale).as("__q"))
    def sq(a: Column, b: Column): Column =
      graft.functions.exprs.sq_l2_long(a, b) // codegen (r21)
    // the nnDescent md5 ring, keyed ':trip' so the walk is independent
    // of the descent's own init ring. Ranked via Ranks.globalRowNumber
    // (distributed range-partitioned ranking) — the global
    // Window.orderBy form collapsed the whole corpus into one task
    // (VERDICT r20 item 1); (__key, __vid) is total, ranks identical.
    val (ranked0, n) = Ranks.globalRowNumberAdaptive(
      qvecs.select(col("__vid"))
        .withColumn("__key", graft.functions.PortableHash.md5Long60(
          concat(col("__vid").cast("string"), lit(":trip")))),
      Seq(col("__key"), col("__vid")), "__rn")
    val ranked = ranked0.select(col("__vid"), col("__rn"))
    val walk = perTriplet + k + 1
    require(n > walk,
      s"tripletMining: need more than perTriplet+k+1=$walk nodes, got $n")
    val edges = graph.select(col("id"), col("neighbor_id").as("nb"))
    // ring successors, skipping self (j >= 1) and graph neighbors
    val negs = ranked
      .select(col("__vid").as("id"), col("__rn"),
        explode(sequence(lit(1L), lit(walk.toLong))).as("__j"))
      .select(col("id"), col("__j"),
        ((col("__rn") - 1L + col("__j")) % n + 1L).as("__rn2"))
      .join(ranked.select(col("__vid").as("nb"),
        col("__rn").as("__rn2")), Seq("__rn2"))
      .join(edges, Seq("id", "nb"), "left_anti")
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("__j"))).cast("long"))
      .filter(col("rank") <= perTriplet)
      .select(col("id"), col("rank"), col("nb").as("neg_id"))
    val pos = graph.filter(col("rank") <= perTriplet)
      .select(col("id"), col("rank"), col("neighbor_id").as("pos_id"),
        col("d").as("pos_d"))
    pos.join(negs, Seq("id", "rank"))
      .join(qvecs.select(col("__vid").as("id"), col("__q").as("__qa")),
        Seq("id"))
      .join(qvecs.select(col("__vid").as("neg_id"),
        col("__q").as("__qb")), Seq("neg_id"))
      .select(col("id"), col("pos_id"), col("neg_id"), col("rank"),
        col("pos_d"), sq(col("__qa"), col("__qb")).as("neg_d"))
  }

  /** DELETE maintenance — the inverse of [[knnGraphMerge]] (VERDICT
    * r14 item 5): remove `deleteIds` from a kNN graph and repair the
    * survivors WITHOUT re-descending the corpus. A curation pipeline
    * deletes constantly (dedup drops, takedowns, retention); rebuilding
    * an O(n·k²)-scored-pairs index per batch is not an option.
    *
    * Three stages, all deletion-proportional beyond one narrow
    * corpus-shaped shuffle:
    *   1. DROP — deleted nodes' rows vanish; surviving rows that point
    *      AT a deleted node are removed from their owner's heap. Both
    *      are broadcast anti-joins against the (batch-sized) delete
    *      list.
    *   2. AFFECTED — exactly the surviving nodes that lost ≥1 neighbor
    *      (the reverse edges of the delete set). Everyone else's heap
    *      is untouched and passes through, ranks intact.
    *   3. BACKFILL — affected nodes refill from neighbors-of-neighbors
    *      over the SURVIVING adjacency (forward ∪ k-capped reverse,
    *      the descent convention): candidates (a, w) with a affected,
    *      w two hops away, scored once, pooled with a's remaining
    *      edges, re-heaped bottom-k. O(|affected|·k·deg) scored pairs.
    *      The one corpus-shaped step is the reverse cap over surviving
    *      edges (narrow 3-column rows — the q180 acknowledgement).
    *
    * Heap order/quantization are the [[nnDescentPortable]] total
    * order, so the q187 DuckDB twin replays drop, backfill, and every
    * heap bit-for-bit (uniform rank recompute ≡ selective re-heap: an
    * unchanged heap re-ranks to itself). An affected node may end with
    * fewer than k neighbors when its two-hop pool is thin; a second
    * backfill round (or a probe against the LSH tables) widens it —
    * measure with [[annRecallAudit]] before relying on it.
    *
    * @param graph existing kNN edges: (id, neighbor_id, rank, d)
    * @return the repaired graph over surviving ids, same shape */
  def knnGraphDelete(
      graph: DataFrame, corpus: DataFrame, deleteIds: DataFrame,
      vecCol: String, idCol: String, k: Int,
      scale: Int = 1000): DataFrame = {
    require(k >= 1)
    val idType = corpus.select(col(idCol)).schema.head.dataType
    val del = deleteIds.select(col(idCol).as("__del")).distinct()
      .localCheckpoint(false)
    val edges = graph.select(col("id"), col("neighbor_id").as("nb"),
      col("rank"), col("d"))
    // survivors' edge lists (owner not deleted)...
    val sEdges = edges.join(broadcast(del.select(col("__del").as("id"))),
      Seq("id"), "left_anti")
    // ...minus edges INTO deleted nodes; owners of removed edges are
    // the affected set
    val (kept, keptCkpt) = CheckpointHygiene.checkpointTracked(
      sEdges.join(broadcast(del.select(col("__del").as("nb"))),
        Seq("nb"), "left_anti"), eager = true)
    val affected = sEdges.join(broadcast(del.select(col("__del").as("nb"))),
      Seq("nb"), "left_semi").select(col("id")).distinct()
    def topK(pool: DataFrame): DataFrame = pool
      .groupBy(col("id"), col("nb")).agg(min(col("d")).as("d"))
      .groupBy(col("id"))
      .agg(graft.functions.BottomK.bottom_k(col("d"),
        col("nb").cast("string"), k).as("__top"))
      .select(col("id"), posexplode(col("__top")))
      .select(col("id"), col("col.value").cast(idType).as("nb"),
        (col("pos") + 1).cast("long").as("rank"), col("col.key").as("d"))
    // surviving adjacency: forward ∪ reverse-capped-at-k (descent's
    // reverse sampling — bounds hub fan-out in the two-hop walk)
    val rev = topK(kept.select(col("nb").as("id"), col("id").as("nb"),
      col("d"))).select(col("id"), col("nb"))
    val adj = kept.select(col("id"), col("nb")).unionByName(rev)
      .distinct()
    val aAdj = adj.join(broadcast(affected), Seq("id"), "left_semi")
    val cand = aAdj.as("x")
      .join(adj.as("y"), col("x.nb") === col("y.id"))
      .select(col("x.id").as("id"), col("y.nb").as("nb"))
      .filter(col("id") =!= col("nb"))
      .distinct()
    def quant(df: DataFrame): DataFrame = df
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__vid"), quantizeVec(col(vecCol), scale).as("__q"))
    val vecs = quant(corpus)
    def sq(a: Column, b: Column): Column =
      graft.functions.exprs.sq_l2_long(a, b) // codegen (r21)
    val scored = broadcast(cand)
      .join(vecs.select(col("__vid").as("id"), col("__q").as("__qa")),
        Seq("id"))
      .join(vecs.select(col("__vid").as("nb"), col("__q").as("__qb")),
        Seq("nb"))
      .select(col("id"), col("nb"), sq(col("__qa"), col("__qb")).as("d"))
    val affectedHeap = topK(
      kept.join(broadcast(affected), Seq("id"), "left_semi")
        .select(col("id"), col("nb"), col("d"))
        .unionByName(scored))
    val (out, _) = CheckpointHygiene.checkpointTracked(
      kept.join(broadcast(affected), Seq("id"), "left_anti")
        .select(col("id"), col("nb"), col("rank"), col("d"))
        .unionByName(affectedHeap)
        .select(col("id"), col("nb").as("neighbor_id"), col("rank"),
          col("d")), eager = true)
    CheckpointHygiene.free(keptCkpt)
    out
  }
}
