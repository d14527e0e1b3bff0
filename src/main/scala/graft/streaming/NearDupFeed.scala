package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.VersionedTable

/** Streaming near-duplicate gate — the online form of
  * [[Dedup.minhashPairs]]: each arriving document is checked against
  * every document EVER ACCEPTED (via a persisted MinHash-LSH index)
  * and against earlier documents of its own micro-batch, then either
  * admitted into the index or flagged with the id it duplicates. The
  * "have I seen this before" filter a continuously-ingesting
  * training-data pipeline needs — batch near-dup passes only dedup
  * within a snapshot.
  *
  * State is three versioned lake tables under `dir` (never stream
  * state — the index must outlive any one query and serve batch reads):
  *
  *   - `<dir>/buckets`: `(band int, bkey long, doc_id long)` — one row
  *     per LSH band per ACCEPTED doc; the candidate-lookup key.
  *   - `<dir>/shingles`: `(doc_id long, sh array<long>)` — each
  *     accepted doc's sorted distinct shingle hashes, for the exact
  *     Jaccard verification (LSH candidates are only candidates).
  *   - `<dir>/decisions`: `(doc_id long, dup_of long, sim double)` —
  *     the per-doc verdict; `dup_of` null = accepted/canonical.
  *     `dup_of` is the SMALLEST matching prior doc id, which may
  *     itself be a duplicate when a within-batch chain fires (A←B,
  *     B←C); follow `dup_of` to a null to reach the canonical.
  *
  * Per micro-batch: shingle + MinHash signatures map-side; candidates =
  * stored buckets matching the batch's band keys (semi-join pruned —
  * the index is never scanned whole) plus the batch's own band
  * self-collisions (earlier doc id wins; micro-batch size bounds the
  * in-bucket pairing); exact sorted-Jaccard verification; decisions,
  * accepted docs' bucket rows, and their shingle rows each append under
  * writer-txn epoch = batchId.
  *
  * Crash-retry correctness: every index read EXCLUDES the current
  * batch's own doc ids (anti-join), so a replayed batch recomputes
  * byte-identical decisions no matter which of the three appends
  * committed before the crash — and each append is then skipped or
  * applied independently by its own (writer, epoch) watermark.
  * Consequence of the exclusion: doc ids are expected unique across
  * the stream's lifetime (re-keyed upstream if necessary); a genuine
  * re-ingest of an old id would not see its own earlier index rows.
  *
  * Scale shape: per batch, work is (batch × bands) narrow rows joined
  * against the PRUNED slice of the index — candidate buckets only —
  * plus one exact verification per surviving candidate pair. The
  * index tables grow linearly with accepted docs; at 100 TB the
  * buckets table is the natural bucketing candidate (`(band, bkey)`).
  */
object NearDupFeed {

  def bucketsTable(dir: String): String = dir + "/buckets"
  def shinglesTable(dir: String): String = dir + "/shingles"
  def decisionsTable(dir: String): String = dir + "/decisions"

  private val bucketsSchema = StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bkey", LongType, nullable = false),
    StructField("doc_id", LongType, nullable = false)))
  private val shinglesSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sh", ArrayType(LongType), nullable = false)))
  private val decisionsSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("dup_of", LongType, nullable = true),
    StructField("sim", DoubleType, nullable = true)))

  /** The decisions table as a frame (doc_id, dup_of, sim). */
  def readDecisions(spark: SparkSession, dir: String): DataFrame =
    VersionedTable.read(spark, decisionsTable(dir))

  /** Compact the index tables: every micro-batch appends one small
    * file per table, and after thousands of batches the probe's
    * file-pruning wins drown in open-file overhead. Compaction
    * re-clusters the bucket rows (the table's `clusterBy` applies on
    * rewrite), restoring range-pruned probes; it is invisible to the
    * gate (content-identical snapshot) and safe between batches of a
    * STOPPED stream — run it from the maintenance cadence, not inside
    * foreachBatch (the gate's reads must see a stable snapshot).
    */
  def compactIndex(spark: SparkSession, dir: String,
      numFiles: Int = 8): Unit = {
    VersionedTable.compact(spark, bucketsTable(dir), numFiles)
    VersionedTable.compact(spark, shinglesTable(dir), numFiles)
    ()
  }

  /** Start gating `stream` (must carry `idCol` castable to long and
    * `textCol` string). Rows with null id/text carry nothing hashable
    * and are skipped. Parameters mirror [[Dedup.minhashPairs]]; two
    * docs are near-dups when their exact `n`-shingle Jaccard >=
    * `threshold` (LSH tuned by numHashes/bands proposes candidates).
    */
  def startGate(
      spark: SparkSession,
      stream: DataFrame,
      dir: String,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 128,
      bands: Int = 16,
      threshold: Double = 0.7,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, "bands must divide numHashes")
    val bucketsExisted =
      try { VersionedTable.latest(spark, bucketsTable(dir)); true }
      catch { case _: Exception => false }
    VersionedTable.create(spark, bucketsTable(dir), bucketsSchema,
      ifNotExists = true)
    // cluster the bucket rows by band key on write: each batch's index
    // probe is a (band, bkey) point-set lookup, and range-clustered
    // files let stats skipping prune the index scan to candidate files
    // instead of reading the whole table (the lk1 discipline — the
    // 100 TB index read path)
    if (!bucketsExisted)
      VersionedTable.alterProperties(spark, bucketsTable(dir),
        Map(VersionedTable.ClusterByProperty -> "bkey"))
    VersionedTable.create(spark, shinglesTable(dir), shinglesSchema,
      ifNotExists = true)
    VersionedTable.create(spark, decisionsTable(dir), decisionsSchema,
      ifNotExists = true)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row],
          batchId: Long) =>
        val s = batch.sparkSession
        applyBatch(s, batch.toDF(), dir, idCol, textCol, n, numHashes,
          bands, rows, threshold, batchId)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** One batch of the gate (shared by the stream and by tests that pin
    * replay idempotence).
    */
  private[graft] def applyBatch(s: SparkSession, batch0: DataFrame,
      dir: String, idCol: String, textCol: String, n: Int,
      numHashes: Int, bands: Int, rows: Int, threshold: Double,
      epoch: Long): Unit = {
    val docs = batch0
      .select(col(idCol).cast(LongType).as("doc_id"),
        col(textCol).as("__text"))
      .where(col("doc_id").isNotNull && col("__text").isNotNull)
      // ids are unique by contract; a violating batch must not fan one
      // id into duplicated decision/index rows
      .dropDuplicates("doc_id")
    // shingles + band keys once per doc; the frame is consumed by the
    // self-join, the index probe, and the verification
    val sh = docs.select(col("doc_id"),
      sort_array(array_distinct(Dedup.shingleHashes(
        TextAnalysis.tokens(col("__text")), n))).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (sh.isEmpty) return
      val bandRows = sh.select(col("doc_id"),
        posexplode(Dedup.bandKeys(
          Dedup.minhashSignature(col("sh"), numHashes), bands, rows))
          .as(Seq("band", "bkey")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val batchIds = sh.select(col("doc_id"))
        // crash-retry determinism: exclude this batch's own ids from
        // every index read — a partially-committed prior attempt must
        // not change what this attempt computes
        val storedBuckets = VersionedTable.read(s, bucketsTable(dir))
          .join(batchIds, Seq("doc_id"), "left_anti")
          .join(bandRows.select("band", "bkey").distinct(),
            Seq("band", "bkey"), "left_semi")
        val candIdx = bandRows
          .join(storedBuckets.withColumnRenamed("doc_id", "cand_id"),
            Seq("band", "bkey"))
          .select(col("doc_id"), col("cand_id"))
        // within-batch collisions: the earlier id is the candidate
        val candIn = bandRows.alias("x")
          .join(bandRows.alias("y"), Seq("band", "bkey"))
          .where(col("x.doc_id") > col("y.doc_id"))
          .select(col("x.doc_id").as("doc_id"),
            col("y.doc_id").as("cand_id"))
        val cand = candIdx.unionByName(candIn).distinct()
        val candShingles = VersionedTable.read(s, shinglesTable(dir))
          .join(batchIds, Seq("doc_id"), "left_anti")
          .unionByName(sh)
          .select(col("doc_id").as("cand_id"), col("sh").as("__sh_c"))
        val verified = cand
          .join(sh, Seq("doc_id"))
          .join(candShingles, Seq("cand_id"))
          .withColumn("__sim", graft.functions.GraftFunctions
            .jaccardSorted(col("sh"), col("__sh_c")))
          .where(col("__sim") >= threshold)
        // dup_of = the smallest matching id (and that match's sim)
        val dupOf = verified.groupBy(col("doc_id"))
          .agg(min(struct(col("cand_id"), col("__sim"))).as("__m"))
          .select(col("doc_id"), col("__m.cand_id").as("dup_of"),
            col("__m.__sim").as("sim"))
        val decisions = sh.select(col("doc_id"))
          .join(dupOf, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("dup_of"), col("sim"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val accepted = decisions.where(col("dup_of").isNull)
            .select("doc_id")
          VersionedTable.appendIdempotent(s,
            bandRows.join(accepted, Seq("doc_id"))
              .select(col("band"), col("bkey"), col("doc_id")),
            bucketsTable(dir), "graft-neardup-buckets", epoch)
          VersionedTable.appendIdempotent(s,
            sh.join(accepted, Seq("doc_id")),
            shinglesTable(dir), "graft-neardup-shingles", epoch)
          VersionedTable.appendIdempotent(s, decisions,
            decisionsTable(dir), "graft-neardup-decisions", epoch)
        } finally { decisions.unpersist(false); () }
      } finally { bandRows.unpersist(false); () }
    } finally { sh.unpersist(false); () }
  }
}
