package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions.{cmUnion, countMin, theta, thetaSetOp}
import graft.sources.VersionedTable

/** Streaming sketch maintenance — a Count-Min sketch PER TIME WINDOW
  * kept fresh in a versioned lake table from an event stream. The
  * continuous half of the a27 rollup: any-span point-frequency queries
  * (`graft_cm_merge` over the stored window rows + `graft_cm_estimate`)
  * answer "how often did THIS key appear between t1 and t2" without
  * ever rescanning raw events.
  *
  * Per micro-batch: rows aggregate map-side into one sketch per touched
  * window (mergeable — only sketches cross the shuffle), the stored
  * sketches for exactly those windows are read back (semi-join pruned),
  * cell-wise unioned ([[graft.functions.CmUnion]]), and upserted keyed
  * by window start. Writer-txn epochs = the foreachBatch batchId, so a
  * replayed batch after a crash is exactly-once (the
  * [[graft.operators.IncrementalView]] discipline).
  *
  * Scale shape: state NEVER lives in the stream — the store is the
  * lake table (one small binary row per window), the per-batch working
  * set is (touched windows × sketch size), and late data within any
  * window simply merges into that window's row whenever it arrives (no
  * watermark needed for correctness; sketches are insert-only).
  */
object SketchFeed {

  /** The maintained table's schema: window start (epoch micros,
    * floor-aligned to `windowSeconds`) + the serialized sketch.
    */
  def tableSchema: StructType = StructType(Seq(
    StructField("w_start", LongType, nullable = false),
    StructField("sk", BinaryType, nullable = false)))

  /** Start maintaining `table` (created here when absent) from the
    * stream. `timeCol` must be a timestamp, `itemCol` a string; rows
    * with null time/item carry no mass and are skipped. Windows are
    * `[k·windowSeconds, (k+1)·windowSeconds)` in epoch time (post-1970
    * data — the integer division floors toward zero).
    */
  def startCountMin(
      spark: SparkSession,
      stream: DataFrame,
      timeCol: String,
      itemCol: String,
      windowSeconds: Long,
      depth: Int,
      width: Int,
      table: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): org.apache.spark.sql.streaming.StreamingQuery = {
    require(windowSeconds >= 1, s"windowSeconds must be >= 1")
    val winUs = windowSeconds * 1000000L
    VersionedTable.create(spark, table, tableSchema, ifNotExists = true)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row],
          batchId: Long) =>
        val s = batch.sparkSession
        val delta = batch.toDF()
          .where(col(timeCol).isNotNull && col(itemCol).isNotNull)
          .groupBy(expr(s"(unix_micros($timeCol) div ${winUs}L) * ${winUs}L")
            .as("w_start"))
          .agg(countMin(col(itemCol).cast(StringType), depth, width)
            .as("sk"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (!delta.isEmpty) {
            val cur = VersionedTable.read(s, table)
              .join(delta.select("w_start"), Seq("w_start"), "left_semi")
            val merged = delta.alias("d")
              .join(cur.alias("c"), Seq("w_start"), "left_outer")
              .select(col("w_start"),
                cmUnion(col("c.sk"), col("d.sk")).as("sk"))
            VersionedTable.upsert(s, merged, table, "w_start",
              txn = Some(("graft-cm-feed", batchId)))
          }
        } finally { delta.unpersist(false); () }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** [[startCountMin]]'s sibling for DISTINCT counts with set algebra: a
    * theta sketch per window, same exactly-once upsert discipline. The
    * stored rows answer any-span distinct counts (`graft_theta_merge` +
    * estimate) and cross-window set questions ("how many keys appear in
    * BOTH hours" via `graft_theta_setop`) without rescanning events.
    * Replays and duplicates are free: theta insertion is idempotent, so
    * a key seen twice in a window adds no mass.
    */
  def startTheta(
      spark: SparkSession,
      stream: DataFrame,
      timeCol: String,
      itemCol: String,
      windowSeconds: Long,
      k: Int,
      table: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): org.apache.spark.sql.streaming.StreamingQuery = {
    require(windowSeconds >= 1, s"windowSeconds must be >= 1")
    val winUs = windowSeconds * 1000000L
    VersionedTable.create(spark, table, tableSchema, ifNotExists = true)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row],
          batchId: Long) =>
        val s = batch.sparkSession
        val delta = batch.toDF()
          .where(col(timeCol).isNotNull && col(itemCol).isNotNull)
          .groupBy(expr(s"(unix_micros($timeCol) div ${winUs}L) * ${winUs}L")
            .as("w_start"))
          .agg(theta(col(itemCol).cast(StringType), k).as("sk"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (!delta.isEmpty) {
            val cur = VersionedTable.read(s, table)
              .join(delta.select("w_start"), Seq("w_start"), "left_semi")
            val merged = delta.alias("d")
              .join(cur.alias("c"), Seq("w_start"), "left_outer")
              .select(col("w_start"),
                when(col("c.sk").isNull, col("d.sk"))
                  .otherwise(thetaSetOp(col("c.sk"), col("d.sk"), "union"))
                  .as("sk"))
            VersionedTable.upsert(s, merged, table, "w_start",
              txn = Some(("graft-theta-feed", batchId)))
          }
        } finally { delta.unpersist(false); () }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
