package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.VersionedTable

/** Persisted ANN index lifecycle — turns the `Similarity` stack from
  * per-query training into an actual index.
  *
  * An index is three versioned lake tables under one directory (full
  * commit protocol: optimistic concurrency, time travel, vacuum):
  *
  *   - `<dir>/centroids`: `(cell int, centroid array<double>)` — the IVF
  *     coarse quantizer.
  *   - `<dir>/codebooks` (PQ indexes only): `(subspace int, code int,
  *     centroid array<double>)` — per-subspace PQ codebooks.
  *   - `<dir>/corpus`: the corpus rows + `__cell int` (and `__codes
  *     binary` when PQ) — CELL-ASSIGNED AT WRITE TIME, so queries skip
  *     the per-row nearest-centroid pass entirely and probe prune
  *     against a precomputed column.
  *
  * At 100 TB this is the difference between an index and a table scan:
  * training cost is paid once at [[build]] (and amortized across every
  * query), assignment/encoding cost is paid once per ROW (at build or
  * [[appendRows]]), and a query's work is nprobe/nlist of the corpus.
  *
  * Freshness: [[appendRows]] assigns new rows to their cells with the
  * STORED quantizer (no retraining — the FAISS add-after-train
  * contract) and appends them to the corpus table, so a reloaded handle
  * sees them immediately; [[Handle.corpusVersion]] exposes the index's
  * commit version for staleness checks against a source table's
  * version, and [[build]] stamps the source version as a table property
  * when the corpus came from a versioned lake table.
  */
object AnnIndex {

  /** Table paths under the index directory. */
  def centroidsTable(dir: String): String = dir + "/centroids"
  def codebooksTable(dir: String): String = dir + "/codebooks"
  def corpusTable(dir: String): String = dir + "/corpus"

  /** Property key on the corpus table recording the source table's
    * version at build time (set when `sourceVersion` is passed).
    */
  val SourceVersionProperty = "graft.ann.source.version"

  /** A loaded index: the model (centroids/codebooks, driver-side — it is
    * nlist×dim + m×ksub×dsub doubles, the same size discipline as the
    * trainers) plus the lazily-read cell-assigned corpus.
    */
  case class Handle(
      dir: String,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      codebooks: Option[Array[Array[Array[Double]]]],
      corpus: DataFrame,
      corpusVersion: Long) {
    def nlist: Int = centroids.length

    /** ONE centroid ref (plan literal or broadcast) shared by every
      * query against this handle — a per-call ref would re-broadcast a
      * large-nlist codebook on each of the repeated queries an index
      * exists to serve, accumulating executor broadcast blocks faster
      * than ContextCleaner reclaims them.
      */
    private[graft] lazy val centroidRef: Similarity.CentroidRef =
      Similarity.centroidRef(centroids)

    /** Release the shared centroid broadcast (no-op for plan-literal
      * refs). Call when done with the handle AND every DataFrame
      * derived from it has been materialized — the lazy plans reference
      * the broadcast.
      */
    def release(): Unit = Similarity.destroyRef(centroidRef)
  }

  /** Train, assign, encode, and persist an index. Training uses the same
    * deterministic driver-sample trainers as the ad-hoc queries
    * ([[Similarity.trainIvfCentroids]] / [[Similarity.trainPqCodebooks]]),
    * so an index built with a query's parameters reproduces that query's
    * results exactly. Pass `pq = Some((m, ksub))` to also store PQ codes
    * with each row (the IVFPQ at-rest layout); `sourceVersion` stamps
    * the corpus table with the source's version for staleness checks.
    */
  def build(spark: SparkSession, corpus: DataFrame, idCol: String,
      vecCol: String, dir: String, nlist: Int, iters: Int = 5,
      sampleSize: Int = 4096, pq: Option[(Int, Int)] = None,
      sourceVersion: Option[Long] = None): Handle = {
    val centroids = Similarity.trainIvfCentroids(corpus, idCol, vecCol,
      nlist, iters, sampleSize)
    val codebooks = pq.map { case (m, ksub) =>
      Similarity.trainPqCodebooks(corpus, idCol, vecCol, m, ksub, iters,
        sampleSize)
    }

    // centroids: one row per cell
    val centSchema = StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("centroid", ArrayType(DoubleType), nullable = false)))
    VersionedTable.create(spark, centroidsTable(dir), centSchema)
    val centRows = centroids.zipWithIndex.map { case (c, i) =>
      org.apache.spark.sql.Row(i, c.toSeq)
    }
    VersionedTable.append(spark,
      spark.createDataFrame(java.util.Arrays.asList(centRows: _*), centSchema),
      centroidsTable(dir))

    // codebooks: one row per (subspace, code)
    codebooks.foreach { books =>
      val bookSchema = StructType(Seq(
        StructField("subspace", IntegerType, nullable = false),
        StructField("code", IntegerType, nullable = false),
        StructField("centroid", ArrayType(DoubleType), nullable = false)))
      val rows = for {
        (book, j) <- books.zipWithIndex
        (cw, c) <- book.zipWithIndex
      } yield org.apache.spark.sql.Row(j, c, cw.toSeq)
      VersionedTable.create(spark, codebooksTable(dir), bookSchema)
      VersionedTable.append(spark,
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), bookSchema),
        codebooksTable(dir))
    }

    // corpus: original rows + precomputed cell (+ codes)
    val assigned = assignFrame(corpus, vecCol, centroids, codebooks)
    VersionedTable.create(spark, corpusTable(dir),
      assigned.schema)
    VersionedTable.append(spark, assigned, corpusTable(dir))
    sourceVersion.foreach(v => VersionedTable.alterProperties(spark,
      corpusTable(dir), Map(SourceVersionProperty -> v.toString)))
    load(spark, dir, idCol, vecCol)
  }

  private def assignFrame(rows: DataFrame, vecCol: String,
      centroids: Array[Array[Double]],
      codebooks: Option[Array[Array[Array[Double]]]]): DataFrame = {
    val withCell = rows.withColumn("__cell",
      Similarity.assignCell(col(vecCol), centroids))
    codebooks match {
      case Some(books) => withCell.withColumn("__codes",
        Similarity.pqEncode(col(vecCol), books))
      case None => withCell
    }
  }

  /** Load an index previously written by [[build]] — purely from disk,
    * no state shared with the building session. The model collects to
    * the driver (bounded: it IS the model, not the data); the corpus
    * stays a lazy lake-table read with its usual pruning.
    */
  def load(spark: SparkSession, dir: String, idCol: String,
      vecCol: String): Handle = {
    val cents = VersionedTable.read(spark, centroidsTable(dir))
      .orderBy("cell").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    require(cents.nonEmpty, s"no centroids at ${centroidsTable(dir)} — " +
      "not an AnnIndex directory?")
    require(cents.map(_._1).toSeq == cents.indices.toSeq,
      s"centroid cells must be 0..${cents.length - 1}")
    val books =
      if (VersionedTable.latest(spark, codebooksTable(dir))._1 > 0) {
        val rows = VersionedTable.read(spark, codebooksTable(dir))
          .orderBy("subspace", "code").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
        val m = rows.map(_._1).max + 1
        Some(Array.tabulate(m)(j => rows.filter(_._1 == j).map(_._3)))
      } else None
    val (v, _) = VersionedTable.latest(spark, corpusTable(dir))
    Handle(dir, idCol, vecCol, cents.map(_._2), books,
      VersionedTable.read(spark, corpusTable(dir)), v)
  }

  /** Incrementally index new rows: assign cells (and PQ codes) with the
    * STORED model — one map-side pass, no retraining, exactly how new
    * rows enter a trained FAISS IVF index — and append to the corpus
    * table. Returns the new corpus-table version. Callers re-[[load]]
    * (or re-read the handle's corpus) to query the fresh rows.
    *
    * `txn = Some((writerId, epoch))` makes the append idempotent per
    * (writer, epoch) — a crashed-and-replayed streaming batch cannot
    * double-index its rows (the [[graft.streaming.AnnFeed]] contract).
    */
  def appendRows(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String,
      txn: Option[(String, Long)] = None): Long = {
    val h = load(spark, dir, idCol, vecCol)
    val assigned = assignFrame(rows, vecCol, h.centroids, h.codebooks)
    txn match {
      case Some((writerId, epoch)) => VersionedTable.appendIdempotent(
        spark, assigned, corpusTable(dir), writerId, epoch)
      case None =>
        VersionedTable.append(spark, assigned, corpusTable(dir))
    }
  }

  /** True when the index was built from `sourceTable` (a versioned lake
    * table) and the source has committed past the stamped version.
    */
  def isStale(spark: SparkSession, dir: String, sourceTable: String): Boolean =
    VersionedTable.tableProperties(spark, corpusTable(dir))
      .get(SourceVersionProperty).exists(stamped =>
        VersionedTable.latest(spark, sourceTable)._1 > stamped.toLong)

  /** IVF top-k over a loaded index: queries probe their `nprobe` nearest
    * cells (model from the handle — broadcast past the size threshold)
    * and re-rank EXACTLY against the stored vectors inside probed cells.
    * The corpus side reads the precomputed `__cell` — no per-query
    * assignment pass. Same result as [[Similarity.ivfTopK]] with the
    * same quantizer; `nprobe = nlist` is provably brute force.
    */
  def topK(handle: Handle, queries: DataFrame, queryId: String,
      queryVec: String, k: Int, nprobe: Int): DataFrame = {
    val probes = math.min(nprobe, handle.nlist)
    val q = queries.withColumn("__cell", explode(
      Similarity.topCellsRef(Similarity.asDouble(col(queryVec)),
        handle.centroidRef, probes)))
    // the broadcast hint keeps the small-query-batch plan; the shared
    // tail keeps ranking semantics identical to every other ANN form
    Similarity.cellJoinTopK(handle.corpus, handle.idCol, handle.vecCol,
      broadcast(q), queryId, queryVec, k, saltFactor = 1,
      excludeSelf = true)
  }

  /** Distributed k-NN JOIN over a loaded index —
    * [[Similarity.knnJoin]]'s large-query-side regime with the
    * corpus-side cell assignment READ from the index table instead of
    * recomputed: both sides shuffle on the stored `__cell` (no
    * broadcast of either side), and only the query side runs the
    * quantizer at query time. At 100 TB this is what makes
    * corpus×corpus retrieval an index probe rather than a
    * rescan-and-retrain; `saltFactor` splits skew-hot cells exactly as
    * in the ad-hoc operator, every (query, corpus) pair met once.
    */
  def knnJoin(handle: Handle, queries: DataFrame, queryId: String,
      queryVec: String, k: Int, nprobe: Int,
      saltFactor: Int = 1, excludeSelf: Boolean = true): DataFrame = {
    val probes = math.min(nprobe, handle.nlist)
    val q0 = queries.withColumn("__cell", explode(
      Similarity.topCellsRef(Similarity.asDouble(col(queryVec)),
        handle.centroidRef, probes)))
    // one shared tail with Similarity.knnJoin (salting, re-rank, top-k)
    // so the ad-hoc and index-backed forms cannot diverge
    Similarity.cellJoinTopK(handle.corpus, handle.idCol, handle.vecCol,
      q0, queryId, queryVec, k, saltFactor, excludeSelf)
  }

  /** ADC top-k over a PQ index: candidates ride as stored code bytes and
    * score via the query's lookup table — [[Similarity.pqTopKAdc]]'s
    * shape, with encoding read from the index instead of recomputed.
    * Requires an index built with `pq`.
    */
  def topKAdc(handle: Handle, queries: DataFrame, queryId: String,
      queryVec: String, k: Int, nprobe: Int): DataFrame = {
    val books = handle.codebooks.getOrElse(throw new IllegalArgumentException(
      s"index at ${handle.dir} has no PQ codebooks — build with pq=Some(...)"))
    val probes = math.min(nprobe, handle.nlist)
    val idCol = handle.idCol
    val q = queries.withColumn("__cell", explode(
      Similarity.topCellsRef(Similarity.asDouble(col(queryVec)),
        handle.centroidRef, probes)))
      .withColumn("__lut", graft.functions.GraftFunctions
        .pqAdcLut(Similarity.asDouble(col(queryVec)), books))
    val joined = handle.corpus
      .select(col(idCol), col("__cell"), col("__codes"))
      .join(broadcast(q), "__cell")
      .where(col(queryId) =!= col(idCol))
      .withColumn("sim", graft.functions.GraftFunctions
        .pqAdcScore(col("__codes"), col("__lut"), books))
    val w = Window.partitionBy(col(queryId)).orderBy(desc("sim"), col(idCol))
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(idCol), col("sim"), col("rank"))
  }
}
