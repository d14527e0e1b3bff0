package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline; the LSH-bucketed
  * variant is the 100 TB path (candidates from sign-hyperplane buckets,
  * exact re-rank inside buckets only).
  *
  * All arithmetic is double-precision sequential fold in index order —
  * deterministic and bit-identical to a C++ `for` loop over the same
  * values (DuckDB parity: `dot/(sqrt(na)*sqrt(nb))`).
  */
object Similarity {

  /** float[] → double[] (exact widening). */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity, DuckDB-formula-exact: dot/(sqrt(na)*sqrt(nb)).
    * Native expression ([[graft.functions.GraftFunctions.CosineSim]]) —
    * one primitive loop per row; accepts float or double arrays.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine(a, b)

  /** Exact top-k neighbors for each query row, brute force.
    * `queries` must be small (it is broadcast); cost is |queries|×|corpus|
    * map work + one per-query top-k — the correct baseline and the
    * fallback when recall must be 1.0.
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val joined = corpus.join(broadcast(queries))
      .withColumn("sim", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(desc("sim"), col(corpusId))
    joined
      .where(col(queryId) =!= col(corpusId)) // skip self-match
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("sim"), col("rank"))
  }

  /** Metadata-filtered exact kNN (hybrid search): [[bruteForceTopK]]
    * with a predicate riding the join — each query scores ONLY corpus
    * rows whose `filterCol` equals its `queryFilter` (tenant, language,
    * label). The equi key turns the broadcast cross into a hash-
    * partitioned candidate set, so a selective filter makes this
    * CHEAPER than unfiltered brute force, not a post-filter that
    * starves k.
    */
  def filteredBruteTopK(corpus: DataFrame, corpusId: String,
      corpusVec: String, filterCol: String, queries: DataFrame,
      queryId: String, queryVec: String, queryFilter: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val joined = corpus.join(broadcast(queries),
        col(filterCol) === col(queryFilter))
      .withColumn("sim", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId))
      .orderBy(desc("sim"), col(corpusId))
    joined
      .where(col(queryId) =!= col(corpusId))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId), col(filterCol), col("sim"),
        col("rank"))
  }

  // single shared mixer — see GraftFunctions.splitmix64
  private def splitmix64(x0: Long): Long =
    graft.functions.GraftFunctions.splitmix64(x0)

  /** Sign-LSH bucket id: `bits` hyperplanes with deterministic ±1
    * (Rademacher) components; bit j = sign of ⟨v, h_j⟩. Same-bucket
    * vectors are likely cosine-close.
    */
  def lshBucket(vec: Column, dim: Int, bits: Int): Column = {
    val planes = (0 until bits).map { j =>
      (0 until dim).map(i =>
        if (splitmix64(j.toLong * dim + i) < 0) -1.0 else 1.0)
    }
    val bitCols = planes.zipWithIndex.map { case (h, j) =>
      val proj = dot(vec, array(h.map(lit): _*))
      when(proj >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    // A vector whose length != dim would silently null out the zip_with
    // dot and zero every signature bit — fail loudly instead of bucketing
    // every misconfigured vector together. NULL vectors pass through as
    // null (no bucket — the row drops out of the candidate join) rather
    // than killing the job.
    when(vec.isNull, lit(null).cast(LongType))
      .when(size(vec) === dim, bitCols.reduce((a, b) => a.bitwiseOR(b)))
      .otherwise(raise_error(concat(
        lit(s"graft lshBucket: expected dim $dim, got "),
        size(vec).cast("string"))))
  }

  /** Approximate top-k: candidates share the query's LSH bucket, exact
    * cosine re-rank inside. At scale: one shuffle on bucket id; recall
    * tuned by `bits` (fewer bits → bigger buckets → higher recall+cost)
    * and `probes` (Hamming-ball multi-probe over the query's bucket —
    * each probe scans ~1/2^bits more of the corpus for the
    * next-most-probable bucket; 2^bits probes = provably brute force).
    */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, dim: Int, bits: Int = 8, probes: Int = 1): DataFrame = {
    require(probes >= 1 && probes <= (1 << bits),
      s"probes must be 1..${1 << bits} (2^bits probes every bucket — " +
        "exhaustive, provably equal to brute force)")
    val c = corpus.withColumn("__bucket",
      lshBucket(asDouble(col(corpusVec)), dim, bits))
    // Multi-probe (Hamming-ball): each query probes the `probes` buckets
    // whose signatures are NEAREST its own — XOR masks ordered by
    // popcount then value, so the base bucket comes first, then every
    // one-bit flip (near-boundary neighbors land there), then two-bit
    // flips, and so on. Recall rises without touching the corpus-side
    // layout, and each added probe buys the most-probable bucket next
    // (a sign flip needs the query near that hyperplane; two flips need
    // two near-boundary projections — geometrically rarer).
    // probes == 2^bits XORs every mask — a bijection, so EVERY bucket is
    // probed: each corpus row (living in exactly one bucket) meets each
    // query exactly once and the result equals brute-force top-k — the
    // oracle-checkable calibration point for the same pipeline the
    // partial-probe path runs.
    val probeMasks = (0 until (1 << bits))
      .sortBy(m => (java.lang.Integer.bitCount(m), m))
      .take(probes).map(_.toLong)
    val q = queries.withColumn("__q_bucket",
        lshBucket(asDouble(col(queryVec)), dim, bits))
      .withColumn("__bucket", explode(array(
        probeMasks.map(m => col("__q_bucket").bitwiseXOR(lit(m))): _*)))
      .drop("__q_bucket")
    val joined = c.join(broadcast(q), "__bucket")
      .where(col(queryId) =!= col(corpusId))
      .withColumn("sim", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(desc("sim"), col(corpusId))
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("sim"), col("rank"))
  }

  // ---------- IVF (inverted-file) ANN ----------

  /** Train an IVF coarse quantizer: Lloyd's k-means (cosine assignment,
    * mean update) on a DETERMINISTIC hash-ordered sample collected to the
    * driver. The sample is tiny (`sampleSize` vectors) and the result is
    * nlist × dim doubles — broadcast into the plan as literals, so corpus
    * assignment is pure map-side work. Determinism: sample order and
    * initial centroids come from xxhash64(id), never from RNG state.
    */
  def trainIvfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 5, sampleSize: Int = 4096): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = corpus
      .select(asDouble(col(vecCol)).as("v"))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(math.max(sampleSize, nlist)) // k-means needs >= nlist seeds
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train IVF on an empty corpus")
    val k = math.min(nlist, sample.length)
    var centroids = sample.take(k).map(_.clone())

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) -2.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def nearest(v: Array[Double]): Int = {
      var best = 0; var bestS = Double.NegativeInfinity; var c = 0
      while (c < centroids.length) {
        val s = cos(v, centroids(c))
        if (s > bestS) { bestS = s; best = c }
        c += 1
      }
      best
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](sample.head.length))
      val counts = new Array[Long](k)
      for (v <- sample) {
        val c = nearest(v)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old // empty cell keeps its centroid
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  /** DISTRIBUTED Lloyd's k-means over the FULL corpus — the scale path
    * when the driver-sample trainer ([[trainIvfCentroids]], the default:
    * sample-based coarse quantizers are standard practice and its cost
    * is bounded by the sample) is not enough: very large nlist, or a
    * corpus whose distribution a 4k-row sample misrepresents.
    *
    * Per iteration: one map-side assignment pass (centroids via
    * [[topCellsAuto]] — broadcast past the size threshold) and one
    * partial-aggregated groupBy((cell, dim)) for the mean update. The
    * shuffle carries only partitions × nlist × dim pre-combined rows,
    * never raw vectors; the model (nlist × dim doubles) is the only
    * driver-side state. Cost is iters full scans of the corpus — that is
    * inherent to full-corpus Lloyd's, and each scan is embarrassingly
    * parallel.
    *
    * DETERMINISM, the property that makes this production-usable: mean
    * numerators accumulate as exact DECIMAL(38,18) sums, which are
    * order- and partition-independent, so training is bit-identical
    * under any repartitioning of the corpus (spec-pinned) — a re-run on
    * a differently-laid-out cluster yields the same index. Plain double
    * sums would make the centroids (and thus every downstream
    * assignment) partition-dependent. Initialization is the same
    * deterministic hash-ordered first-k as the driver trainer; empty
    * cells keep their previous centroid.
    */
  def trainIvfCentroidsDistributed(corpus: DataFrame, idCol: String,
      vecCol: String, nlist: Int, iters: Int = 5): Array[Array[Double]] = {
    require(nlist >= 1, s"nlist must be >= 1, got $nlist")
    val vecs = corpus.select(asDouble(col(vecCol)).as("__v"),
      xxhash64(col(idCol)).as("__h"), col(idCol).as("__id"))
    var centroids: Array[Array[Double]] = vecs
      .orderBy(col("__h"), col("__id"))
      .limit(nlist)
      .select("__v")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(centroids.nonEmpty, "cannot train IVF on an empty corpus")

    for (_ <- 0 until iters) {
      val ref = centroidRef(centroids) // one ship per iteration
      try {
      val assigned = vecs.select(
        element_at(topCellsRef(col("__v"), ref, 1), 1).as("__cell"),
        col("__v"))
      // exact decimal numerators: order/partition-independent means
      val byDim = assigned
        .select(col("__cell"), posexplode(col("__v")).as(Seq("__d", "__x")))
        .groupBy(col("__cell"), col("__d"))
        .agg(sum(col("__x").cast(DecimalType(38, 18))).as("__s"),
          count(lit(1)).as("__n"))
      // reassemble per-cell mean vectors distributedly (array_sort on
      // (__d, mean) structs restores dimension order), then collect the
      // nlist rows — the model, not the data
      val updated = byDim
        .select(col("__cell"), struct(col("__d"),
          (col("__s") / col("__n")).cast(DoubleType).as("__m")).as("__dm"))
        .groupBy(col("__cell"))
        .agg(transform(array_sort(collect_list(col("__dm"))),
          _.getField("__m")).as("__mean"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .toMap
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        updated.getOrElse(c, old) // empty cell keeps its centroid
      }
      } finally destroyRef(ref) // release blocks even on a failed action
    }
    centroids
  }

  /** Past this many doubles (~1 MB), the centroid table moves off the
    * serialized expression (one copy per TASK) onto a broadcast variable
    * (one fetch per EXECUTOR) — what lets nlist reach 4096+ cells at
    * 1k dims without per-task serialization cost.
    */
  private[graft] val BroadcastCentroidDoubles: Long = 128L * 1024

  /** A centroid table, either riding expression objects (small) or a
    * shared broadcast variable (large). Callers that use the SAME
    * centroids in several places (corpus assign + query probe; one
    * trainer iteration) create ONE ref and reuse it, so the table ships
    * once; trainers destroy the broadcast when their iteration's action
    * completes.
    */
  private[graft] type CentroidRef = Either[Array[Array[Double]],
    org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]]

  private[graft] def centroidRef(
      centroids: Array[Array[Double]]): CentroidRef = {
    val doubles =
      centroids.length.toLong * centroids.headOption.map(_.length).getOrElse(0)
    if (doubles >= BroadcastCentroidDoubles)
      Right(org.apache.spark.sql.SparkSession.active
        .sparkContext.broadcast(centroids))
    else Left(centroids)
  }

  private[graft] def destroyRef(ref: CentroidRef): Unit = ref match {
    case Right(bc) => bc.destroy()
    case Left(_) => ()
  }

  private[graft] def topCellsRef(vec: Column, ref: CentroidRef, n: Int,
      l2: Boolean = false): Column = ref match {
    case Left(a) => graft.functions.GraftFunctions.topCells(vec, a, n, l2)
    case Right(bc) => graft.functions.GraftFunctions.topCellsBc(vec, bc, n, l2)
  }

  /** Top-n-cell column with automatic small/large routing: small codebooks
    * ride the [[graft.functions.GraftFunctions.TopCells]] expression
    * object; large ones a broadcast variable. Same math either way.
    * One-shot convenience — multi-use callers go through [[centroidRef]].
    */
  private[graft] def topCellsAuto(vec: Column,
      centroids: Array[Array[Double]], n: Int,
      l2: Boolean = false): Column =
    topCellsRef(vec, centroidRef(centroids), n, l2)

  /** Nearest-centroid cell id for a vector (map-side; one primitive loop
    * per row, O(1) plan size at any nlist×dim — centroids ride the
    * expression object or, past [[BroadcastCentroidDoubles]], a broadcast
    * variable; see [[topCellsAuto]]). The write-side half of the at-scale
    * IVF layout: persist the corpus directory-partitioned by this cell so
    * query probes prune to nprobe/nlist of the files at scan planning
    * time.
    */
  def assignCell(vec: Column, centroids: Array[Array[Double]]): Column =
    element_at(topCellsAuto(asDouble(vec), centroids, 1), 1)

  /** IVF approximate top-k: corpus rows are assigned once to their nearest
    * coarse centroid (map-side — centroids are plan literals); each query
    * probes its `nprobe` nearest cells and re-ranks exactly inside them.
    *
    * The at-scale layout: ONE hash shuffle of the corpus on cell id (or
    * none, if the corpus is pre-partitioned/bucketed by cell at write
    * time), queries broadcast. Recall is tuned by nprobe/nlist;
    * nprobe = nlist degenerates to exact brute force.
    */
  def ivfTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4, iters: Int = 5,
      sampleSize: Int = 4096,
      pretrained: Option[Array[Array[Double]]] = None): DataFrame =
    ivfTopKReleasable(corpus, corpusId, corpusVec, queries, queryId,
      queryVec, k, nlist, nprobe, iters, sampleSize, pretrained)._1

  /** [[ivfTopK]] plus a release handle for the centroid broadcast.
    *
    * Broadcast lifecycle: past [[BroadcastCentroidDoubles]] the centroid
    * table rides a broadcast variable that must outlive the LAZY result
    * DataFrame, so [[ivfTopK]] cannot destroy it eagerly — the trainers
    * destroy theirs per-iteration (their actions complete inside the
    * call), but query-side broadcasts are reclaimed by Spark's
    * ContextCleaner once the plan is GC'd. A session running many
    * large-nlist queries back to back can accumulate broadcast blocks
    * faster than GC notices; callers that materialize the result eagerly
    * should invoke the returned release hook afterwards (safe to call at
    * most once; a no-op for small plan-literal centroid tables).
    */
  def ivfTopKReleasable(corpus: DataFrame, corpusId: String,
      corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4, iters: Int = 5,
      sampleSize: Int = 4096,
      pretrained: Option[Array[Array[Double]]] = None)
      : (DataFrame, () => Unit) = {
    val centroids = pretrained.getOrElse(trainIvfCentroids(
      corpus, corpusId, corpusVec, nlist, iters, sampleSize))
    val probes = math.min(nprobe, centroids.length)
    val ref = centroidRef(centroids) // shared: corpus assign + query probe

    val c = corpus.withColumn("__cell",
      element_at(topCellsRef(asDouble(col(corpusVec)), ref, 1), 1))

    val q = queries.withColumn("__cell", explode(
      topCellsRef(asDouble(col(queryVec)), ref, probes)))

    val joined = c.join(broadcast(q), "__cell")
      .where(col(queryId) =!= col(corpusId))
      .withColumn("sim", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(desc("sim"), col(corpusId))
    val result = joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("sim"), col("rank"))
    (result, () => destroyRef(ref))
  }

  /** IVF × PQ — the composed at-scale ANN architecture (the FAISS
    * IVFPQ shape): the coarse quantizer routes each query to its
    * `nprobe` nearest cells, bounding candidates to ~nprobe/nlist of
    * the corpus, and inside the probed cells candidates are ranked on
    * PQ-RECONSTRUCTED cosine — the corpus rides as m code bytes per
    * vector (32× smaller for 64-dim floats), which is what lets a
    * 100 TB embedding corpus re-rank in executor memory. Both training
    * steps are the bounded deterministic driver samples of the
    * components; corpus assignment and encoding are map-side. Recall is
    * tuned by (nprobe/nlist, m, ksub) — spec-tested against brute force
    * with both approximations stacked.
    */
  def ivfPqTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4, m: Int = 8,
      ksub: Int = 256, iters: Int = 5, adc: Boolean = false): DataFrame = {
    val centroids = trainIvfCentroids(corpus, corpusId, corpusVec,
      nlist, iters)
    val codebooks = trainPqCodebooks(corpus, corpusId, corpusVec,
      m, ksub, iters)
    val probes = math.min(nprobe, centroids.length)
    val ref = centroidRef(centroids) // shared: corpus assign + query probe

    val coded = corpus
      .withColumn("__cell",
        element_at(topCellsRef(asDouble(col(corpusVec)), ref, 1), 1))
      .withColumn("__codes", pqEncode(col(corpusVec), codebooks))
    // ADC: candidates ride as m code bytes, scored via the query's lookup
    // table (O(m)/pair). Otherwise decode ONCE per corpus row; only
    // (id, cell, decoded) ride the join.
    val c =
      if (adc) coded.select(col(corpusId), col("__cell"), col("__codes"))
      else coded.select(col(corpusId), col("__cell"),
        pqDecode(col("__codes"), codebooks).as("__dv"))

    val qProbed = queries.withColumn("__cell", explode(
      topCellsRef(asDouble(col(queryVec)), ref, probes)))
    val q =
      if (adc) qProbed.select(col(queryId), col("__cell"),
        graft.functions.GraftFunctions
          .pqAdcLut(asDouble(col(queryVec)), codebooks).as("__lut"))
      else qProbed

    val joined = c.join(broadcast(q), "__cell")
      .where(col(queryId) =!= col(corpusId))
      .withColumn("sim",
        if (adc) graft.functions.GraftFunctions
          .pqAdcScore(col("__codes"), col("__lut"), codebooks)
        else cosine(col("__dv"), asDouble(col(queryVec))))
    val w = Window.partitionBy(col(queryId)).orderBy(desc("sim"), col(corpusId))
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("sim"), col("rank"))
  }

  // ---------- product quantization (PQ) ----------

  /** Train PQ codebooks: the vector space splits into `m` equal
    * subspaces; each gets its own `ksub`-centroid L2 k-means codebook
    * (Jégou et al., "Product Quantization for Nearest Neighbor Search").
    * Same driver-side discipline as [[trainIvfCentroids]]: deterministic
    * hash-ordered sample, bounded collect, result small enough
    * (m × ksub × dim/m doubles) to ride every task's closure.
    * Initialization is the first `ksub` DISTINCT subvectors of the
    * sample, so a corpus with ≤ ksub distinct subvectors per subspace
    * reconstructs exactly.
    */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int = 256, iters: Int = 5,
      sampleSize: Int = 4096): Array[Array[Array[Double]]] = {
    require(ksub >= 1 && ksub <= 256, "one byte per code: ksub 1..256")
    val sample: Array[Array[Double]] = corpus
      .select(asDouble(col(vecCol)).as("v"))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(sampleSize)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train PQ on an empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dsub = dim / m

    Array.tabulate(m) { j =>
      val sub = sample.map(_.slice(j * dsub, (j + 1) * dsub))
      val distinctInit = scala.collection.mutable.LinkedHashSet
        .empty[scala.collection.immutable.ArraySeq[Double]]
      sub.foreach { s =>
        if (distinctInit.size < ksub)
          distinctInit += scala.collection.immutable.ArraySeq.unsafeWrapArray(s)
      }
      var centroids = distinctInit.toArray.map(_.toArray)
      def nearest(v: Array[Double]): Int = {
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < centroids.length) {
          var d = 0.0; var t = 0
          while (t < dsub) {
            val diff = v(t) - centroids(c)(t); d += diff * diff; t += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
      for (_ <- 0 until iters) {
        val sums = Array.fill(centroids.length)(new Array[Double](dsub))
        val counts = new Array[Long](centroids.length)
        for (v <- sub) {
          val c = nearest(v)
          counts(c) += 1
          var t = 0
          while (t < dsub) { sums(c)(t) += v(t); t += 1 }
        }
        centroids = centroids.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old else sums(c).map(_ / counts(c))
        }
      }
      centroids
    }
  }

  /** DISTRIBUTED full-corpus PQ training — [[trainIvfCentroidsDistributed]]'s
    * discipline applied per subspace (the driver-sample
    * [[trainPqCodebooks]] stays the default). Initialization is the same
    * deterministic distinct-subvector init (driver-side, from the
    * hash-ordered sample); each Lloyd's iteration is ONE corpus pass:
    * every row computes its `m` subspace cell ids map-side (negated-L2
    * [[graft.functions.GraftFunctions.TopCells]], codebooks broadcast
    * past the size threshold), then a partial-aggregated
    * groupBy((subspace, cell, dim)) updates means from exact DECIMAL
    * sums — so training is bit-identical under any repartitioning of the
    * corpus (spec-pinned), and the shuffle carries pre-combined
    * m × ksub × dsub rows per partition, never raw vectors. Empty cells
    * keep their codeword, like the driver trainer.
    */
  def trainPqCodebooksDistributed(corpus: DataFrame, idCol: String,
      vecCol: String, m: Int, ksub: Int = 256,
      iters: Int = 5, sampleSize: Int = 4096): Array[Array[Array[Double]]] = {
    var codebooks = trainPqCodebooks(corpus, idCol, vecCol, m, ksub,
      iters = 0, sampleSize = sampleSize) // init only: distinct subvectors
    val dsub = codebooks(0)(0).length

    val vecs = corpus.select(asDouble(col(vecCol)).as("__v"))
    for (_ <- 0 until iters) {
      val refs = codebooks.map(centroidRef) // one ship per iteration
      try {
      val cellsCol = array((0 until m).map(j =>
        element_at(topCellsRef(
          slice(col("__v"), j * dsub + 1, dsub), refs(j), 1, l2 = true),
          1)): _*)
      val byDim = vecs
        .select(cellsCol.as("__cells"),
          posexplode(col("__v")).as(Seq("__d", "__x")))
        .select(
          expr(s"__d div $dsub").cast(IntegerType).as("__j"),
          element_at(col("__cells"),
            expr(s"__d div $dsub").cast(IntegerType) + 1).as("__cell"),
          (col("__d") % dsub).as("__sd"),
          col("__x"))
        .groupBy(col("__j"), col("__cell"), col("__sd"))
        .agg(sum(col("__x").cast(DecimalType(38, 18))).as("__s"),
          count(lit(1)).as("__n"))
      val updated = byDim
        .select(col("__j"), col("__cell"), struct(col("__sd"),
          (col("__s") / col("__n")).cast(DoubleType).as("__m")).as("__dm"))
        .groupBy(col("__j"), col("__cell"))
        .agg(transform(array_sort(collect_list(col("__dm"))),
          _.getField("__m")).as("__mean"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray)
        .toMap
      codebooks = codebooks.zipWithIndex.map { case (book, j) =>
        book.zipWithIndex.map { case (old, c) =>
          updated.getOrElse((j, c), old) // empty cell keeps its codeword
        }
      }
      } finally refs.foreach(destroyRef) // release even on a failed action
    }
    codebooks
  }

  /** PQ-encode an embedding column to `m` code bytes (binary). */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    graft.functions.GraftFunctions.pqEncode(asDouble(vec), codebooks)

  /** Reconstruct the approximate vector from PQ codes. */
  def pqDecode(codes: Column, codebooks: Array[Array[Array[Double]]]): Column =
    graft.functions.GraftFunctions.pqDecode(codes, codebooks)

  /** Approximate top-k over a PQ-compressed corpus: corpus rows carry only
    * their `m`-byte codes; similarity is cosine(query, decode(codes)) —
    * asymmetric distance computation (exact query side, quantized corpus
    * side), the standard PQ search mode. Lossy (like [[quantize]]'s int8
    * path, but 8× smaller still); recall vs brute force is spec-tested.
    */
  def pqTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, m: Int = 8, ksub: Int = 256, iters: Int = 5): DataFrame = {
    val codebooks = trainPqCodebooks(corpus, corpusId, corpusVec, m, ksub, iters)
    // decode ONCE per corpus row (before the ×|queries| join)
    val compressed = corpus
      .withColumn("__codes", pqEncode(col(corpusVec), codebooks))
      .select(col(corpusId), pqDecode(col("__codes"), codebooks).as("__dv"))
    val joined = compressed.join(broadcast(queries))
      .where(col(queryId) =!= col(corpusId))
      .withColumn("sim", cosine(col("__dv"), asDouble(col(queryVec))))
    val w = Window.partitionBy(col(queryId)).orderBy(desc("sim"), col(corpusId))
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("sim"), col("rank"))
  }

  /** [[pqTopK]] scored by ADC lookup tables — the actual PQ search loop
    * (Jégou et al. §IV-A): each query precomputes, once, the dot product
    * of its subvectors with every codeword ([[graft.functions
    * .GraftFunctions.PqAdcLut]]); a candidate's cosine then reconstructs
    * from `m` table lookups instead of an O(dim) decode + O(dim) fold,
    * and corpus rows cross the join as `m` code bytes instead of a
    * decoded `double[dim]`. Scores equal [[pqTopK]] up to floating-point
    * re-grouping (per-subspace partials vs one flat fold; spec pins
    * |Δ| < 1e-9 and identical top-k), so this is the drop-in scale path:
    * at 100 TB the per-candidate work and the shuffle width both shrink
    * ~dim/m ≈ 8×.
    */
  def pqTopKAdc(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, m: Int = 8, ksub: Int = 256, iters: Int = 5): DataFrame = {
    val codebooks = trainPqCodebooks(corpus, corpusId, corpusVec, m, ksub, iters)
    val compressed = corpus
      .withColumn("__codes", pqEncode(col(corpusVec), codebooks))
      .select(col(corpusId), col("__codes"))
    val q = queries.select(col(queryId),
      graft.functions.GraftFunctions
        .pqAdcLut(asDouble(col(queryVec)), codebooks).as("__lut"))
    val joined = compressed.join(broadcast(q))
      .where(col(queryId) =!= col(corpusId))
      .withColumn("sim", graft.functions.GraftFunctions
        .pqAdcScore(col("__codes"), col("__lut"), codebooks))
    val w = Window.partitionBy(col(queryId)).orderBy(desc("sim"), col(corpusId))
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("sim"), col("rank"))
  }

  // ---------- int8 scale-offset quantization ----------

  /** Quantize a float/double embedding to 8-bit codes with per-vector
    * scale+offset: `struct(mn, scale, codes array<byte>)` — 4× smaller
    * than float32 at rest and on the shuffle wire, reconstruction error
    * ≤ scale/2 per element. At 100 TB of embeddings this is the
    * difference between a corpus that fits executor memory for
    * in-partition re-ranking and one that doesn't. Pure column
    * expressions; deterministic.
    */
  def quantize(vec: Column): Column = {
    val mn = array_min(vec).cast(DoubleType)
    val mx = array_max(vec).cast(DoubleType)
    val scale = when(mx > mn, (mx - mn) / 255.0).otherwise(lit(1.0))
    struct(mn.as("mn"), scale.as("scale"),
      transform(vec, x =>
        (round((x.cast(DoubleType) - mn) / scale) - 128).cast(ByteType))
        .as("codes"))
  }

  /** Reconstruct an approximate double[] from [[quantize]] output. */
  def dequantize(q: Column): Column = {
    val mn = q.getField("mn")
    val scale = q.getField("scale")
    transform(q.getField("codes"),
      c => (c.cast(DoubleType) + 128.0) * scale + mn)
  }

  /** Cosine between a quantized corpus vector and an exact query vector. */
  def quantizedCosine(q: Column, exact: Column): Column =
    cosine(dequantize(q), asDouble(exact))

  /** Fused `dequantize(quantize(vec))` in one native loop — what a
    * quantized re-rank actually evaluates. Bit-identical to the
    * composition (spec-pinned) at ~HOF-free cost; use [[quantize]] /
    * [[dequantize]] when the codes themselves are stored.
    */
  def quantizeRoundtrip(vec: Column): Column =
    graft.functions.GraftFunctions.quantizeRoundtrip(vec)

  // ---------- 1-bit (sign) binary quantization + Hamming retrieval ----------

  /** Pack the sign bits of a float/double embedding into 32-bit words
    * (`array<bigint>`, word w bit (j−32w) set iff `vec[j] > 0`). 32 bits
    * per BIGINT word — not 64 — keeps every word in `[0, 2^32)`, so the
    * packed value is plain non-negative integer arithmetic in ANY engine
    * (a 64-bit pack would put bit 63 in the sign position and make the
    * cross-engine value representation-dependent). 32× smaller at rest
    * than float32; `exact 0.0` and NaN both pack to 0, deterministically.
    *
    * Pure column expressions (one pass per row at write/index time, not
    * in the join), mirrored 1:1 by the sim15 oracle's SQL.
    */
  def binarySignPack(vec: Column, dim: Int): Column = {
    require(dim > 0, s"dim must be positive, got $dim")
    val words = (0 until (dim + 31) / 32).map { w =>
      val lo = w * 32
      val hi = math.min(lo + 31, dim - 1)
      (lo to hi).map { j =>
        when(get(vec, lit(j)) > lit(0.0), lit(1L << (j - lo)))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }
    array(words: _*)
  }

  /** Hamming distance between two [[binarySignPack]] signatures — the
    * native popcount-of-XOR kernel
    * ([[graft.functions.GraftFunctions.HammingDist]], real codegen). */
  def hammingDist(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.hamming(a, b)

  /** Binary-quantized top-k: rank the corpus by Hamming distance on
    * packed sign bits, keep `candidates` per query, exact-cosine re-rank
    * to the final k. The modern memory-bound retrieval shape: the
    * Hamming scan touches 2 longs per corpus row instead of 64 floats
    * (~32× less bandwidth), and only |candidates| rows ever reach the
    * float re-ranker. Wholly deterministic (ties on ascending corpus
    * id), so the FULL pipeline — packing, Hamming ranking, re-rank — is
    * SQL-expressible and hash-oracled end-to-end (no exact-twin needed).
    *
    * Scale shape: queries broadcast (the sim1 regime); the corpus scan
    * carries only (id, packed words, vec) and the per-query candidate
    * window is bounded by `candidates`, not corpus size. For the
    * corpus×corpus regime, pack once and reuse through [[knnJoin]]'s
    * cell shuffle instead.
    */
  def binaryTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      dim: Int, k: Int, candidates: Int): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val c = corpus.select(col(corpusId), col(corpusVec),
      binarySignPack(col(corpusVec), dim).as("__cw"))
    val q = queries.select(col(queryId), col(queryVec),
      binarySignPack(col(queryVec), dim).as("__qw"))
    val wHam = Window.partitionBy(col(queryId))
      .orderBy(col("__ham"), col(corpusId))
    val wSim = Window.partitionBy(col(queryId))
      .orderBy(desc("sim"), col(corpusId))
    c.join(broadcast(q))
      .where(col(queryId) =!= col(corpusId))
      .withColumn("__ham", hammingDist(col("__cw"), col("__qw")))
      .withColumn("__hrank", row_number().over(wHam))
      .where(col("__hrank") <= candidates)
      .withColumn("sim", cosine(col(corpusVec), col(queryVec)))
      .withColumn("rank", row_number().over(wSim))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("sim"), col("rank"))
  }

  /** Matryoshka (MRL-style) truncated retrieval: rank the corpus by
    * cosine over the FIRST `prefixDim` dimensions only, keep
    * `candidates` per query, exact full-dimension re-rank to the final
    * k. Matryoshka-trained embeddings pack the coarse signal into the
    * prefix, so a 16-of-64 prefix scan reads 4× less data with most of
    * the ranking quality — the dimension-truncation analog of
    * [[binaryTopK]]'s bit truncation (measure the trade with
    * [[recallAtK]] before committing). Prefix cosine normalizes over
    * the PREFIX (slice first, then the one native kernel) — truncation
    * then renormalization, the MRL convention. Deterministic ties (asc
    * corpus id) make the whole pipeline SQL-expressible and
    * hash-oracled end-to-end.
    *
    * Scale shape: identical to [[binaryTopK]] — queries broadcast, the
    * corpus scan carries (id, prefix, vec), candidate windows bounded
    * by `candidates`.
    */
  def matryoshkaTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      prefixDim: Int, k: Int, candidates: Int): DataFrame = {
    require(prefixDim > 0, s"prefixDim must be positive, got $prefixDim")
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val c = corpus.select(col(corpusId), col(corpusVec),
      slice(asDouble(col(corpusVec)), 1, prefixDim).as("__cp"))
    val q = queries.select(col(queryId), col(queryVec),
      slice(asDouble(col(queryVec)), 1, prefixDim).as("__qp"))
    val wPre = Window.partitionBy(col(queryId))
      .orderBy(desc("__psim"), col(corpusId))
    val wSim = Window.partitionBy(col(queryId))
      .orderBy(desc("sim"), col(corpusId))
    c.join(broadcast(q))
      .where(col(queryId) =!= col(corpusId))
      .withColumn("__psim", cosine(col("__cp"), col("__qp")))
      .withColumn("__prank", row_number().over(wPre))
      .where(col("__prank") <= candidates)
      .withColumn("sim", cosine(col(corpusVec), col(queryVec)))
      .withColumn("rank", row_number().over(wSim))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("sim"), col("rank"))
  }

  /** Recall@k of an approximate retrieval result against a ground-truth
    * result: per query, |approx top-k ∩ truth top-k| / k. Both inputs
    * are `(queryCol, idCol, rank)` frames (any extra columns ignored);
    * rows past rank k on either side are ignored, and a query present
    * in `truth` but absent from `approx` scores 0 — missing queries are
    * a recall failure, not a join dropout. The standard ANN evaluation
    * harness: run it over [[binaryTopK]]/[[lshTopK]]/[[ivfTopK]] output
    * vs [[bruteForceTopK]] to measure what a quantization config costs
    * before committing an index build to it.
    *
    * Scale: one hash semi-join on (query, id) + one count per query —
    * both sides are k×|queries|, never corpus-sized.
    */
  /** Domain-similarity map — corpus cartography for mixing decisions:
    * one centroid per group (source / language / shard), then pairwise
    * cosine between group centroids. The |groups|² matrix says which
    * domains overlap in embedding space (candidates for merging or for
    * temperature flattening) and which are genuinely distinct — the
    * input to a data-mixing plan, at the cost of ONE pass over the
    * corpus plus a groups-sized join.
    *
    * Determinism: the Pca quantized-moment discipline — dims quantize
    * to `scale` decimals (round(x, s), cross-engine), per-(group, dim)
    * sums are exact decimals, each centroid coordinate is one double
    * division, and the pairwise cosine is the engine's sequential-fold
    * kernel. Scale shape: one posexplode partial-agg over (group, dim),
    * one per-group array fold, one |groups|² inequality join (groups,
    * never rows — the t38 class).
    *
    * Contract: vectors must be dense (no null elements) and share one
    * length per group — either violation raises at runtime rather
    * than silently skewing per-dim denominators.
    */
  def domainCentroidMap(df: DataFrame, groupCol: String, vecCol: String,
      scale: Int = 6): DataFrame = {
    require(scale >= 1 && scale <= 9, s"scale must be in [1, 9], got $scale")
    // Contract: vectors are DENSE and every vector in a group has ONE
    // length — ragged lengths or null elements would give per-(group,
    // dim) denominators that silently diverge from an oracle's
    // count(*). Both are corrupt data here, so both raise loudly; the
    // checks live INSIDE published columns (not a dropped assert
    // column) so column pruning can't optimize them away.
    val ex = df
      .where(col(groupCol).isNotNull && col(vecCol).isNotNull)
      .select(col(groupCol).as("__g"), posexplode(
        transform(asDouble(col(vecCol)),
          e => round(when(e.isNotNull, e).otherwise(raise_error(lit(
            "domainCentroidMap: null vector element — vectors must " +
              "be dense")).cast(DoubleType)), scale)
            .cast(DecimalType(18, scale))))
        .as(Seq("__i", "__v")))
    val cent = ex.groupBy(col("__g"), col("__i"))
      .agg(sum(col("__v")).cast(DecimalType(38, scale)).as("__s"),
        count(lit(1)).as("__n"))
      .withColumn("__c",
        col("__s").cast(DoubleType) / col("__n").cast(DoubleType))
      .groupBy(col("__g"))
      .agg(transform(array_sort(collect_list(struct(col("__i"),
        col("__c")))), _.getField("__c")).as("__cv"),
        min(col("__n")).as("__nmin"), max(col("__n")).as("__nmax"))
      .withColumn("n_vecs",
        when(col("__nmin") === col("__nmax"), col("__nmax"))
          .otherwise(raise_error(lit("domainCentroidMap: ragged " +
            "vector lengths within a group — every vector in a group " +
            "must share one dimension")).cast(LongType)))
    val a = cent.select(col("__g").as("group_a"), col("__cv").as("__va"),
      col("n_vecs").as("n_a"))
    val b = cent.select(col("__g").as("group_b"), col("__cv").as("__vb"),
      col("n_vecs").as("n_b"))
    a.join(b, col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        cosine(col("__va"), col("__vb")).as("cos_sim"))
  }

  def recallAtK(approx: DataFrame, truth: DataFrame, queryCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val a = approx.where(col("rank") <= k)
      .select(col(queryCol), col(idCol))
    val t = truth.where(col("rank") <= k)
      .select(col(queryCol), col(idCol))
    val hits = t.join(a, Seq(queryCol, idCol), "left_semi")
      .groupBy(col(queryCol)).agg(count(lit(1)).as("hits"))
    t.select(col(queryCol)).distinct()
      .join(hits, Seq(queryCol), "left_outer")
      .select(col(queryCol),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast(DoubleType) / k).as("recall"))
  }

  /** The DCG discount table round(1/log₂(i+1), 6), i = 1..k, as exact
    * six-decimal BigDecimals — the operator and any oracle must share
    * these LITERALS (re-deriving log₂ in two engines risks the last
    * ulp; a fixed quantized table cannot).
    */
  private[graft] def dcgWeights(k: Int): Seq[java.math.BigDecimal] =
    (1 to k).map { i =>
      new java.math.BigDecimal(1.0 / (math.log(i + 1.0) / math.log(2.0)))
        .setScale(6, java.math.RoundingMode.HALF_UP)
    }

  /** NDCG@k of an approximate ranking against an exact one, with graded
    * relevance = the TRUE similarity (quantized to DECIMAL(9,6)).
    * DCG = Σ rel_q(doc@i)·w_i over the approx top-k, IDCG the same over
    * the exact top-k; both sums are EXACT decimals (quantized relevance
    * × quantized discount), so the result is partition-order and
    * engine independent — the only float is the final division.
    *
    * Pooled-judgment contract: relevance is looked up from the `truth`
    * frame (the pool); an approx pick outside the pool counts 0, the
    * standard pooled-evaluation convention. `truth` should therefore be
    * computed with a pool depth ≥ the worst expected approx excursion.
    *
    * Scale shape: two rank-filtered frames, one equi-join onto the
    * pool, two group-by-query sums — queries parallelize, nothing is
    * corpus-quadratic here (the rankings themselves came from the
    * retrieval operators under audit).
    */
  def ndcgAtK(approx: DataFrame, truth: DataFrame, queryCol: String,
      idCol: String, simCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val ws = dcgWeights(k)
    def wCol(rankCol: Column): Column =
      ws.zipWithIndex.foldLeft(lit(null).cast(DecimalType(9, 6))) {
        case (acc, (w, i)) =>
          when(rankCol === (i + 1), lit(w).cast(DecimalType(9, 6)))
            .otherwise(acc)
      }
    val zero6 = lit(0).cast(DecimalType(9, 6))
    val relq = round(col(simCol), 6).cast(DecimalType(9, 6))
    val rel = truth.select(col(queryCol), col(idCol), relq.as("__rel"))
    val dcg = approx.where(col("rank") <= k)
      .join(rel, Seq(queryCol, idCol), "left_outer")
      .select(col(queryCol),
        (coalesce(col("__rel"), zero6) * wCol(col("rank")))
          .cast(DecimalType(28, 12)).as("__t"))
      .groupBy(col(queryCol))
      .agg(sum(col("__t")).cast(DecimalType(38, 12)).as("__dcg"))
    val idcg = truth.where(col("rank") <= k)
      .select(col(queryCol),
        (relq * wCol(col("rank")))
          .cast(DecimalType(28, 12)).as("__t"))
      .groupBy(col(queryCol))
      .agg(sum(col("__t")).cast(DecimalType(38, 12)).as("__idcg"))
    val zero12 = lit(0).cast(DecimalType(38, 12))
    idcg.join(dcg, Seq(queryCol), "left_outer")
      .select(col(queryCol),
        coalesce(col("__dcg"), zero12).cast(DoubleType).as("dcg"),
        col("__idcg").cast(DoubleType).as("idcg"),
        when(col("__idcg") === 0, lit(null).cast(DoubleType))
          .otherwise(coalesce(col("__dcg"), zero12).cast(DoubleType) /
            col("__idcg").cast(DoubleType)).as("ndcg"))
  }

  /** Blocked near-duplicate pairs: within `blockCol` groups (e.g. a
    * cluster/label/LSH-bucket column), all pairs with cosine ≥ threshold.
    */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double,
      saltFactor: Int = 8): DataFrame = {
    // Low-cardinality blocks (10 labels) would cap the join at 10 tasks;
    // salting the left side and replicating the right saltFactor-ways
    // raises parallelism to blocks x saltFactor while emitting every pair
    // exactly once.
    val a = emb.select(col(blockCol), col(idCol), col(vecCol))
      .withColumn("__salt", pmod(xxhash64(col(idCol)), lit(saltFactor)).cast("int"))
    val b = emb.select(col(blockCol), col(idCol).as(idCol + "_2"),
      col(vecCol).as(vecCol + "_2"))
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    a.join(b, Seq(blockCol, "__salt"))
      .where(col(idCol) < col(idCol + "_2"))
      .withColumn("sim", cosine(col(vecCol), col(vecCol + "_2")))
      .where(col("sim") >= threshold)
      .select(col(idCol), col(idCol + "_2"), col("sim"))
  }

  /** Distributed k-NN JOIN: every row of a LARGE query set gets its
    * exact-reranked top-k from the corpus. The sim1–sim7 surface
    * broadcasts the query side (one query batch, big corpus); this is
    * the other regime — corpus self-kNN, RAG pair mining — where BOTH
    * sides are corpus-sized: the join shuffles on the IVF cell id, so
    * neither side ever needs to fit in memory.
    *
    * Scale shape: corpus rows shuffle once on their single nearest
    * cell; queries replicate `nprobe` ways (and `saltFactor` ways — see
    * below). The candidate frame re-shuffles by query for the global
    * top-k window, whose partition size is bounded by nprobe × cell
    * size by construction, not by corpus size. A skew-hot k-means cell
    * would bound one task at |cell queries|×|cell| pair work;
    * `saltFactor` splits each cell's corpus rows across S tasks and
    * replicates that cell's probing queries S ways, each (query,
    * corpus) pair still meeting exactly once. nprobe = nlist keeps the
    * provably-exact configuration (every pair met once ⇒ ≡ brute
    * force), which is how the operator is hash-oracled.
    *
    * Centroid broadcast lifecycle matches [[ivfTopK]] (ContextCleaner
    * reclaims large-nlist refs once the plan is GC'd).
    */
  def knnJoin(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4, iters: Int = 5,
      sampleSize: Int = 4096,
      pretrained: Option[Array[Array[Double]]] = None,
      saltFactor: Int = 1, excludeSelf: Boolean = true): DataFrame = {
    val centroids = pretrained.getOrElse(trainIvfCentroids(
      corpus, corpusId, corpusVec, nlist, iters, sampleSize))
    val probes = math.min(nprobe, centroids.length)
    val ref = centroidRef(centroids)
    val c0 = corpus.withColumn("__cell",
      element_at(topCellsRef(asDouble(col(corpusVec)), ref, 1), 1))
    val q0 = queries.withColumn("__cell", explode(
      topCellsRef(asDouble(col(queryVec)), ref, probes)))
    cellJoinTopK(c0, corpusId, corpusVec, q0, queryId, queryVec, k,
      saltFactor, excludeSelf)
  }

  /** Shared tail of the k-NN JOIN family ([[knnJoin]] and
    * `AnnIndex.knnJoin`): salted cell-shuffle join + exact re-rank +
    * per-query top-k. Both inputs must already carry `__cell`.
    * `excludeSelf` drops candidates whose ids match — REQUIRED for
    * self-kNN (a row is trivially its own nearest neighbor), wrong for
    * a heterogeneous query/corpus pair whose id spaces coincide
    * accidentally (question 42 could never retrieve passage 42) — so
    * callers in the two-table regime pass false.
    */
  private[operators] def cellJoinTopK(c0: DataFrame, corpusId: String,
      corpusVec: String, q0: DataFrame, queryId: String, queryVec: String,
      k: Int, saltFactor: Int, excludeSelf: Boolean): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(saltFactor >= 1, s"saltFactor must be positive, got $saltFactor")
    val (c, q, keys) =
      if (saltFactor <= 1) (c0, q0, Seq("__cell"))
      else (
        c0.withColumn("__salt",
          pmod(xxhash64(col(corpusId)), lit(saltFactor)).cast("int")),
        q0.withColumn("__salt",
          explode(sequence(lit(0), lit(saltFactor - 1)))),
        Seq("__cell", "__salt"))
    // NO broadcast hint: the planner (and AQE, at runtime sizes) picks
    // the join strategy — that is the point of this variant.
    // Small-corpus width guard (r15): the candidate count is
    // |queries|·nprobe·|cell| while the INPUT bytes stay tiny, so AQE's
    // byte-driven coalescing collapsed the join+cosine stage to ONE
    // task (sim10: 2.8 s single-task for ~4M 64-dim cosines). When the
    // corpus side is a narrow scan, both sides get a user hash
    // repartition on the join keys — the join reuses it (no extra
    // exchange) and AQE never coalesces a user repartition. At scale
    // the branch is never taken and the plan is byte-identical.
    val (cW, qW) =
      if (Fanout.isNarrow(c0)) {
        val par = c0.sparkSession.sparkContext.defaultParallelism
        (c.repartition(par, keys.map(col): _*),
          q.repartition(par, keys.map(col): _*))
      } else (c, q)
    val joined = cW.join(qW, keys)
      .where(if (excludeSelf) col(queryId) =!= col(corpusId) else lit(true))
      .withColumn("sim", cosine(col(corpusVec), col(queryVec)))
    val idIsLong = c.schema.fields
      .find(_.name == corpusId).map(_.dataType).contains(LongType)
    if (idIsLong) {
      // bounded mergeable top-k aggregate: partial-aggregates map-side,
      // so the per-query shuffle carries ≤ k pairs per partition instead
      // of every candidate row (the window form sorts them all). Content
      // and order are identical to rank ≤ k (score desc, id asc).
      // The null contract here is the AGGREGATE's: graft_topk skips
      // null ids/scores by definition (TopKAgg scaladoc + spec). An
      // explicit `isnotnull(sim)` pre-filter gets pushed INTO the join
      // condition by Catalyst, and codegen does not CSE between a join
      // residual and the downstream project — the dominant cosine
      // kernel would run TWICE per candidate pair (plan-verified on
      // sim10; removing it cut the join+topk stage ~40%).
      joined.groupBy(col(queryId))
        .agg(graft.functions.GraftFunctions
          .topKPairs(col(corpusId), col("sim"), k).as("__top"))
        .select(col(queryId), posexplode(col("__top")).as(Seq("__rk", "__p")))
        .select(col(queryId), col("__p.id").as(corpusId),
          col("__p.score").as("sim"),
          (col("__rk") + 1).cast(IntegerType).as("rank"))
    } else {
      // non-long ids: the window form (generic ordering). The window
      // ranks nulls too, so THIS branch filters them explicitly — the
      // duplicated-cosine pushdown above is acceptable here (the branch
      // is the small-id-space fallback, not the 100 TB path).
      val w = Window.partitionBy(col(queryId))
        .orderBy(desc("sim"), col(corpusId))
      joined
        .where(col(corpusId).isNotNull && col("sim").isNotNull)
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select(col(queryId), col(corpusId), col("sim"),
          col("rank").cast(IntegerType).as("rank"))
    }
  }

  /** MMR-diversified top-k (Carbonell & Goldstein 1998): greedy
    * re-ranking of a relevance candidate pool so results are both
    * relevant and mutually dissimilar —
    * score(d) = λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s),
    * ties on (score DESC, id ASC), round 1 penalizes against an empty
    * set (maxSim = 0).
    *
    * Scale shape: the candidate pool (`poolSize` per query) comes from
    * the DISTRIBUTED relevance pass ([[bruteForceTopK]] here; swap in
    * [[ivfTopK]] / `AnnIndex.knnJoin` for 100 TB corpora — the rerank
    * is pool-only and never touches the corpus again). All cosine
    * arithmetic — query-candidate AND candidate-candidate — is computed
    * distributed by the native kernel BEFORE the greedy phase, so the
    * per-query sequential step is pure double compare/multiply over
    * poolSize² precomputed sims: bounded state, one task per query,
    * queries parallelize freely.
    *
    * Determinism: the greedy chain `λ·rel − (1−λ)·maxSim` is fixed-order
    * IEEE over engine-exact cosines — an oracle that unrolls the k
    * rounds reproduces every selection bit-for-bit. Pass λ whose 1−λ is
    * exact in binary (0.5, 0.75, …) so the oracle can mirror the
    * literal.
    *
    * `corpusId`/`queryId` must be integral (the pool state keys on
    * longs). Queries with fewer than k candidates emit what they have.
    */
  def mmrTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, poolSize: Int, lambda: Double): DataFrame = {
    require(k >= 1 && poolSize >= k,
      s"need 1 <= k <= poolSize, got k=$k poolSize=$poolSize")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    val spark = corpus.sparkSession
    import spark.implicits._
    val oneMinus = 1.0 - lambda
    val cands = bruteForceTopK(corpus, corpusId, corpusVec,
      queries, queryId, queryVec, poolSize)
      .select(col(queryId).cast(LongType).as("__q"),
        col(corpusId).cast(LongType).as("__c"), col("sim").as("__rel"))
    val vecs = corpus.select(col(corpusId).cast(LongType).as("__vid"),
      asDouble(col(corpusVec)).as("__v"))
    val withVec = cands.join(vecs, col("__c") === col("__vid"))
      .select(col("__q"), col("__c"), col("__rel"), col("__v"))
    val left = withVec.select(col("__q"), col("__c").as("__ca"),
      col("__v").as("__va"))
    val right = withVec.select(col("__q").as("__q2"),
      col("__c").as("__cb"), col("__v").as("__vb"))
    val pairSims = left.join(right,
      col("__q") === col("__q2") && col("__ca") =!= col("__cb"))
      .select(col("__q"), col("__ca"), col("__cb"),
        cosine(col("__va"), col("__vb")).as("__s"))
    val relAgg = withVec.groupBy("__q")
      .agg(sort_array(collect_list(struct(col("__c"), col("__rel"))))
        .as("__rels"))
    val pairAgg = pairSims.groupBy("__q")
      .agg(collect_list(struct(col("__ca"), col("__cb"), col("__s")))
        .as("__sims"))
    val grouped = relAgg.join(pairAgg, Seq("__q"), "left_outer")
      .select(col("__q"), col("__rels"),
        coalesce(col("__sims"),
          array().cast(ArrayType(StructType(Seq(
            StructField("__ca", LongType, nullable = false),
            StructField("__cb", LongType, nullable = false),
            StructField("__s", DoubleType, nullable = false)))))
        ).as("__sims"))
      .as[(Long, Seq[(Long, Double)], Seq[(Long, Long, Double)])]
    val picked = grouped.flatMap { case (q, rels, sims) =>
      val simMap = sims.map { case (a, b, s) => (a, b) -> s }.toMap
      val remaining = scala.collection.mutable.LinkedHashMap(rels: _*)
      val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Double, Int)]
      var round = 1
      while (round <= k && remaining.nonEmpty) {
        var bestId = -1L
        var bestScore = Double.NegativeInfinity
        var first = true
        remaining.foreach { case (c, rel) =>
          // true max over the selected set (cosines can be negative —
          // clamping at 0 would diverge from SQL MAX); empty set = 0.0
          var maxSim = 0.0
          if (selected.nonEmpty) {
            maxSim = Double.NegativeInfinity
            selected.foreach { s =>
              val v = simMap((c, s))
              if (v > maxSim) maxSim = v
            }
          }
          val score = lambda * rel - oneMinus * maxSim
          if (first || score > bestScore ||
              (score == bestScore && c < bestId)) {
            bestId = c; bestScore = score; first = false
          }
        }
        remaining.remove(bestId)
        selected += bestId
        out += ((q, bestId, bestScore, round))
        round += 1
      }
      out
    }
    picked.toDF(queryId, corpusId, "mmr", "rank")
      .withColumn("rank", col("rank").cast(IntegerType))
  }
}
