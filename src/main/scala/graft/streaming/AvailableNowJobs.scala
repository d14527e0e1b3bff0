package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.operators.Normalize

/** Structured-Streaming form of the reference's cron-micro-batch protocol
  * (SURVEY.md §2.9).
  *
  * The reference's "streaming" is: Cloud Scheduler fires a batch job that
  * reads everything in a folder, appends to the warehouse, and archives the
  * inputs (read-all-then-archive, `README.md:143-148`). Spark's file source
  * with `Trigger.AvailableNow` is that protocol natively:
  *
  *   - exactly-once file tracking via the checkpoint (replaces S3 guard +
  *     S7 archive-as-bookkeeping),
  *   - `cleanSource=archive` moves consumed files aside (replaces the
  *     driver-side GCS copy+delete loop),
  *   - each scheduler tick = one `AvailableNow` run that drains pending
  *     files and stops.
  *
  * At scale this is strictly better than the batch form: no re-listing
  * races, no partially-archived folders, and state (seen-files log) lives
  * in the checkpoint, not in folder layout.
  */
object AvailableNowJobs {

  /** Streaming twin of [[graft.jobs.Jobs.singleFolderElt]]: schema'd CSV
    * stream → rename → cast → na.drop → parquet append. Runs one
    * AvailableNow drain and blocks until it finishes; returns true if the
    * query ran (files may or may not have been pending).
    */
  def singleFolderElt(
      spark: SparkSession,
      sourceDir: String,
      archiveDir: String,
      lakePath: String,
      checkpointDir: String,
      rawSchema: StructType,
      casts: Map[String, DataType]): Boolean = {
    val raw = spark.readStream
      .option("header", "true")
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", archiveDir)
      .schema(rawSchema)
      .csv(sourceDir)
    val cleaned = Normalize.dropNullRows(
      Normalize.castColumns(Normalize.renameAll(raw), casts))
    val q = cleaned.writeStream
      .format("parquet")
      .option("path", lakePath)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    true
  }

  /** Streaming event-time aggregation with watermarking — the idiomatic
    * upgrade of the reference's A4/A5 time-bucket queries to continuous
    * input: tumbling-window average with late-data bound.
    */
  def windowedAvg(
      events: DataFrame,
      timeCol: String,
      measure: String,
      windowSpan: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), windowSpan))
      .agg(avg(col(measure)).as("avg_" + measure),
        count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("avg_" + measure), col("n"))
  }

  /** Streaming dedup within the watermark horizon; state is bounded by
    * the watermark. Default (`includeEventTime = true`) collapses exact
    * (keys, event-time) re-deliveries — the continuous form of the
    * reference's batch `dropDuplicates` (P4) on rows that include their
    * timestamp. Pass false to dedup on the natural keys ALONE, so a
    * re-delivered record whose timestamp was re-stamped (within the
    * watermark) is also dropped.
    */
  def dedupStream(events: DataFrame, timeCol: String, keys: Seq[String],
      watermark: String = "2 hours",
      includeEventTime: Boolean = true): DataFrame =
    events.withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark(
        if (includeEventTime) keys :+ timeCol else keys)
}
