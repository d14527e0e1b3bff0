package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.VersionedTable

/** Persisted BM25 inverted index — turns [[TextAnalysis.bm25Retrieval]]
  * from per-query corpus tokenization into an actual index (the text
  * analog of [[AnnIndex]]: pay the corpus pass once, amortize it across
  * every query batch).
  *
  * An index is four versioned lake tables under one directory (full
  * commit protocol: optimistic concurrency, time travel, vacuum):
  *
  *   - `<dir>/postings`: `(doc long, term string, tf double)` — the
  *     inverted index, CLUSTERED BY term so a query batch's term
  *     semi-join prunes row groups by min/max stats instead of scanning
  *     the whole postings table.
  *   - `<dir>/lens`: `(doc long, dl double)` — document lengths.
  *   - `<dir>/df`: `(term string, df double)` — PER-APPEND document-
  *     frequency subtotals. Readers sum by term (the df frame is
  *     vocabulary-sized); appends never read-modify-write.
  *   - `<dir>/stats`: `(n_docs long, sum_dl double)` — per-append
  *     corpus totals; N and avgdl are the sums.
  *
  * The mergeable-subtotal layout (df/stats as per-append deltas) is
  * what makes [[appendRows]] O(new docs): indexing a new batch appends
  * its own narrow aggregates and never rewrites global state. All four
  * appends are deterministic functions of the batch, so idempotent
  * replay under a writer txn re-produces byte-identical rows no matter
  * which appends committed before a crash (the NearDupFeed discipline).
  *
  * Freshness contract: doc ids must be NEW on every append (re-adding
  * a doc would double-count its terms in df/lens — same
  * unique-id-per-lifetime contract as the near-dup gate). idf and
  * length normalization always reflect the CURRENT totals, so scores
  * shift as the corpus grows — exactly as recomputing from scratch
  * would ([[Bm25IndexSpec]] pins search ≡ ad-hoc `bm25Retrieval` over
  * the union).
  */
object Bm25Index {

  def postingsTable(dir: String): String = dir + "/postings"
  def lensTable(dir: String): String = dir + "/lens"
  def dfTable(dir: String): String = dir + "/df"
  def statsTable(dir: String): String = dir + "/stats"

  /** Property key on the postings table recording the source table's
    * version at build time (set when `sourceVersion` is passed).
    */
  val SourceVersionProperty = "graft.bm25.source.version"

  /** A loaded index: lazy lake-table reads plus the two driver scalars
    * (N, avgdl — summed from the per-append stats rows at load).
    *
    * Visibility contract: the four tables commit independently
    * (postings → lens → df → stats, stats LAST as the batch marker),
    * so a load that runs CONCURRENTLY with an in-flight [[appendRows]]
    * can observe the batch's postings without its totals — transiently
    * stale idf/avgdl that converges at the batch boundary. Load
    * between appends (the single-writer [[graft.streaming.Bm25Feed]]
    * discipline: query handles are reloaded after a batch commits,
    * not during one) for exact totals; a crash mid-append leaves the
    * same transient state until the replayed epoch completes the
    * remaining table appends.
    */
  case class Handle(
      dir: String,
      idCol: String,
      postings: DataFrame,
      lens: DataFrame,
      dfSubtotals: DataFrame,
      n: Double,
      avgdl: Double,
      version: Long)

  /** Tokenize a doc batch into the four index frames:
    * (postings, lens, dfDelta, stats). One pass over the text — lens,
    * df, and stats all derive from the checkpointed postings.
    */
  private def frames(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // reject non-integral id columns up front: cast(LongType) NULLs a
    // failed cast silently, which would index unretrievable null-doc
    // postings while still inflating df and the corpus totals
    docs.select(col(idCol)).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"Bm25Index: id column '$idCol' must be integral, got $other")
    }
    // fanned out before tokenization (r15: the tokenize+aggregate
    // materialization below ran as ONE task on a one-file corpus — the
    // scan's partitioning, not the session's); exact counts are
    // partitioning-insensitive, and at scale the branch never fires
    val tf = Fanout.fanOut(docs
      .where(col(idCol).isNotNull) // the doc column is non-nullable
      .select(col(idCol).cast(LongType).as(idCol),
        col(textCol).cast(StringType).as(textCol)))
      .select(col(idCol).cast(LongType).as("doc"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).cast(DoubleType).as("tf"))
      .localCheckpoint(true) // text tokenized once; reused 3×
    val lens = tf.groupBy(col("doc")).agg(sum(col("tf")).as("dl"))
    val dfDelta = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast(DoubleType).as("df"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    (tf, lens, dfDelta, stats)
  }

  /** Tokenize and persist an index over `docs`. `sourceVersion` stamps
    * the postings table with the source lake table's version for
    * [[isStale]] checks. Both id columns in later [[search]] calls must
    * be LongType (the mergeable top-k aggregate's key contract —
    * enforced here for the corpus side by the cast).
    */
  def build(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, dir: String,
      sourceVersion: Option[Long] = None): Handle = {
    val (tf, lens, dfDelta, stats) = frames(docs, idCol, textCol)
    VersionedTable.create(spark, postingsTable(dir), StructType(Seq(
      StructField("doc", LongType, nullable = false),
      StructField("term", StringType, nullable = false),
      StructField("tf", DoubleType, nullable = false))))
    // cluster postings by term: a query batch touches few terms, and
    // min/max stats on a term-clustered layout skip the rest
    VersionedTable.alterProperties(spark, postingsTable(dir),
      Map(VersionedTable.ClusterByProperty -> "term"))
    VersionedTable.create(spark, lensTable(dir), StructType(Seq(
      StructField("doc", LongType, nullable = false),
      StructField("dl", DoubleType, nullable = false))))
    VersionedTable.create(spark, dfTable(dir), StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("df", DoubleType, nullable = false))))
    VersionedTable.create(spark, statsTable(dir), StructType(Seq(
      StructField("n_docs", LongType, nullable = false),
      StructField("sum_dl", DoubleType, nullable = false))))
    require(!tf.isEmpty, "Bm25Index.build: corpus has no indexable " +
      "tokens — an empty index would have undefined idf/avgdl")
    VersionedTable.append(spark, tf, postingsTable(dir))
    VersionedTable.append(spark, lens, lensTable(dir))
    VersionedTable.append(spark, dfDelta, dfTable(dir))
    VersionedTable.append(spark, stats, statsTable(dir))
    sourceVersion.foreach(v => VersionedTable.alterProperties(spark,
      postingsTable(dir), Map(SourceVersionProperty -> v.toString)))
    load(spark, dir, idCol)
  }

  /** Load an index previously written by [[build]] — purely from disk.
    * The stats sum is the only eager work (rows = number of appends);
    * postings/lens/df stay lazy lake reads with their usual pruning.
    */
  def load(spark: SparkSession, dir: String, idCol: String): Handle = {
    val stats = VersionedTable.read(spark, statsTable(dir))
      .agg(sum(col("n_docs")), sum(col("sum_dl"))).head
    require(!stats.isNullAt(0) && stats.getLong(0) > 0,
      s"no stats at ${statsTable(dir)} — not a Bm25Index directory?")
    // per-append subtotals are integer-valued doubles: sums are exact,
    // so N/avgdl equal the from-scratch computation bit-for-bit
    val n = stats.getLong(0).toDouble
    val avgdl = stats.getDouble(1) / n
    val (v, _) = VersionedTable.latest(spark, postingsTable(dir))
    Handle(dir, idCol,
      VersionedTable.read(spark, postingsTable(dir)),
      VersionedTable.read(spark, lensTable(dir)),
      VersionedTable.read(spark, dfTable(dir)),
      n, avgdl, v)
  }

  /** Incrementally index new docs: tokenize ONLY the batch, append its
    * postings/lens rows and its df/stats subtotals. No global state is
    * read or rewritten — the 100 TB shape for a growing corpus. Doc ids
    * must be new (see the class contract). Returns the new postings
    * version; re-[[load]] to query fresh totals.
    *
    * `txn = Some((writerId, epoch))` makes each append idempotent per
    * (writer, epoch): a crashed-and-replayed streaming batch re-derives
    * identical frames, so completion of the remaining appends converges
    * to the same index state.
    */
  def appendRows(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String,
      txn: Option[(String, Long)] = None): Long = {
    val (tf, lens, dfDelta, stats) = frames(docs, idCol, textCol)
    // a batch with no indexable tokens (all-whitespace text) must not
    // append a (0, NULL) stats row into the non-nullable sum_dl
    if (tf.isEmpty)
      return VersionedTable.latest(spark, postingsTable(dir))._1
    def put(df: DataFrame, table: String): Long = txn match {
      case Some((w, e)) => VersionedTable.appendIdempotent(spark, df, table, w, e)
      case None => VersionedTable.append(spark, df, table)
    }
    // stats commits LAST as the batch's visibility marker: a reader
    // whose load() observes this batch's stats row is guaranteed the
    // postings/lens/df rows it summarizes committed before it
    val v = put(tf, postingsTable(dir))
    put(lens, lensTable(dir))
    put(dfDelta, dfTable(dir))
    put(stats, statsTable(dir))
    v
  }

  /** True when the index was built from `sourceTable` (a versioned lake
    * table) and the source has committed past the stamped version.
    */
  def isStale(spark: SparkSession, dir: String, sourceTable: String): Boolean =
    VersionedTable.tableProperties(spark, postingsTable(dir))
      .get(SourceVersionProperty).exists(stamped =>
        VersionedTable.latest(spark, sourceTable)._1 > stamped.toLong)

  /** BM25 retrieval join over a loaded index — identical semantics to
    * [[TextAnalysis.bm25Retrieval]] with the SAME parameters over the
    * same corpus (one shared scoring tail), but the corpus is never
    * re-tokenized: postings/lens read from the index, df aggregates
    * from the vocabulary-sized subtotal table, stop-terms with
    * df > maxDfRatio·N prune before the join.
    */
  def search(handle: Handle, queries: DataFrame, qidCol: String,
      qtextCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDfRatio: Double = 0.5): DataFrame = {
    require(k >= 1, s"Bm25Index.search: k must be positive, got $k")
    require(maxDfRatio > 0.0 && maxDfRatio <= 1.0,
      s"Bm25Index.search: maxDfRatio must be in (0, 1], got $maxDfRatio")
    require(queries.schema.fields.find(_.name == qidCol).map(_.dataType)
      .contains(LongType),
      "Bm25Index.search: query id column must be LongType (graft_topk key)")
    val n = handle.n
    val tf = handle.postings.select(col("doc").as(handle.idCol),
      col("term").as("__term"), col("tf").as("__tf"))
    val lens = handle.lens.select(col("doc").as(handle.idCol),
      col("dl").as("__dl"))
    val dfreq = handle.dfSubtotals
      .groupBy(col("term").as("__term"))
      .agg(sum(col("df")).as("__df")) // exact: integer-valued doubles
      .where(col("__df") <= lit(maxDfRatio) * lit(n))
      .withColumn("__idf",
        log(lit(1.0) + (lit(n) - col("__df") + lit(0.5))
          / (col("__df") + lit(0.5))))
    TextAnalysis.bm25Tail(tf, lens, dfreq, queries, handle.idCol,
      qidCol, qtextCol, k, k1, b, handle.avgdl)
  }
}
