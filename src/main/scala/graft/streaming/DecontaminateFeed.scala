package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.VersionedTable

/** Streaming decontamination — the online form of
  * [[Dedup.contaminationReport]]/[[Dedup.decontaminate]]: the eval/
  * benchmark corpus is shingle-indexed ONCE into a lake table, and
  * every arriving training document is scored against it map-side
  * (distinct n-gram overlap fraction) with a verdict appended
  * exactly-once. A continuously-ingesting pipeline needs the check at
  * ingest time — batch decontamination only cleans a snapshot, and an
  * eval leak admitted today is in every checkpoint trained tomorrow.
  *
  * State is two lake tables under `dir`:
  *   - `<dir>/bench_shingles`: `(sh long)` — the eval set's distinct
  *     shingle hashes, written once by [[indexBench]] (the shingle
  *     width `n` is stamped as a table property so the stream can
  *     never score with a mismatched width).
  *   - `<dir>/decisions`: `(doc_id long, overlap double, grams long,
  *     clean boolean)` — per-doc verdict, `overlap` and `grams`
  *     exactly as the batch report computes them.
  *
  * Per micro-batch: one map-side shingle pass over the batch, one join
  * against the bench table (eval-set-sized — AQE broadcasts it), one
  * idempotent append under writer-txn epoch = batchId. The bench index
  * is immutable after [[indexBench]], so a replayed batch recomputes
  * identical decisions unconditionally.
  */
object DecontaminateFeed {

  def benchTable(dir: String): String = dir + "/bench_shingles"
  def decisionsTable(dir: String): String = dir + "/decisions"

  /** Property stamping the shingle width the bench was indexed with. */
  val NgramProperty = "graft.decon.n"

  private val benchSchema = StructType(Seq(
    StructField("sh", LongType, nullable = false)))
  private val decisionsSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("overlap", DoubleType, nullable = true),
    StructField("grams", LongType, nullable = true),
    StructField("clean", BooleanType, nullable = true)))

  /** Index the eval corpus's distinct `n`-shingle hashes. Run once per
    * eval-set release; re-running replaces the index (overwrite by
    * recreate) and stamps `n`.
    */
  def indexBench(spark: SparkSession, bench: DataFrame, textCol: String,
      dir: String, n: Int = 3): Unit = {
    VersionedTable.create(spark, benchTable(dir), benchSchema,
      ifNotExists = true)
    VersionedTable.append(spark,
      bench.select(explode(array_distinct(Dedup.shingleHashes(
          TextAnalysis.tokens(col(textCol)), n))).as("sh"))
        .distinct(),
      benchTable(dir))
    VersionedTable.alterProperties(spark, benchTable(dir),
      Map(NgramProperty -> n.toString))
  }

  /** The decisions table as a frame (doc_id, overlap, grams, clean). */
  def readDecisions(spark: SparkSession, dir: String): DataFrame =
    VersionedTable.read(spark, decisionsTable(dir))

  /** Start scoring `stream` (must carry `idCol` castable to long and
    * `textCol` string) against the indexed bench. `clean` = overlap <
    * `maxOverlap` (the dc1 filter predicate — consumers keep clean
    * rows, or route dirty ones to [[TextAnalysis.decontaminateSpans]]).
    */
  def startScore(
      spark: SparkSession,
      stream: DataFrame,
      dir: String,
      idCol: String,
      textCol: String,
      maxOverlap: Double = 0.5,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val n = VersionedTable.tableProperties(spark, benchTable(dir))
      .getOrElse(NgramProperty, throw new IllegalArgumentException(
        s"$dir has no indexed bench — run indexBench first")).toInt
    VersionedTable.create(spark, decisionsTable(dir), decisionsSchema,
      ifNotExists = true)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row],
          batchId: Long) =>
        val s = batch.sparkSession
        val docs = batch.toDF()
          .select(col(idCol).cast(LongType).as("doc_id"),
            col(textCol).as("__text"))
          .where(col("doc_id").isNotNull)
          // one decision per id even from a contract-violating batch
          // (duplicated ids would otherwise mix shingle multisets)
          .dropDuplicates("doc_id")
        if (!docs.isEmpty) {
          // explode_outer: a null/short text keeps one null-shingle row
          // (zero overlap, zero grams) — scored, not silently dropped;
          // identical to the batch report's semantics
          val docSh = docs.select(col("doc_id"),
            explode_outer(array_distinct(Dedup.shingleHashes(
              TextAnalysis.tokens(col("__text")), n))).as("__sh"))
          val benchSh = VersionedTable.read(s, benchTable(dir))
            .select(col("sh").as("__sh")).withColumn("__hit", lit(1))
          val decisions = docSh.join(benchSh, Seq("__sh"), "left")
            .groupBy(col("doc_id"))
            .agg(
              (sum(coalesce(col("__hit"), lit(0))).cast(DoubleType) /
                count(lit(1)).cast(DoubleType)).as("overlap"),
              sum(when(col("__sh").isNotNull, 1L).otherwise(0L))
                .as("grams"))
            .withColumn("clean", col("overlap") < maxOverlap)
          VersionedTable.appendIdempotent(s, decisions,
            decisionsTable(dir), "graft-decon-decisions", batchId)
          ()
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
