package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Bm25Index

/** Streaming BM25 index maintenance — keeps a persisted [[Bm25Index]]
  * fresh from a document stream, exactly-once (the text twin of
  * [[AnnFeed]]).
  *
  * Per micro-batch: the batch's docs are tokenized ONCE and their
  * postings/lens rows plus df/stats SUBTOTALS are appended under
  * writer-txn epoch = `batchId` (the [[SketchFeed]] discipline). The
  * mergeable-subtotal layout is what makes this exactly-once cheap:
  * the batch never reads or rewrites global df/N state, it just adds
  * its own deltas — a crashed-and-replayed batch re-derives the
  * identical frames, so completing the remaining table appends
  * converges (the [[Bm25Index.appendRows]] contract). A handle loaded
  * after the batch commits scores with the refreshed idf/avgdl.
  *
  * Contract inherited from [[Bm25Index]]: doc ids must be unique
  * across the stream's lifetime (a re-sent id would double-count its
  * terms in df/lens — same contract as [[NearDupFeed]]).
  */
object Bm25Feed {

  /** Writer id stamped on every batch's append. */
  val WriterId = "graft-bm25-feed"

  /** Start indexing `stream`'s docs (schema must carry `idCol` +
    * `textCol`) into the index at `dir`. Rows with null id/text carry
    * nothing indexable and are skipped, not job-fatal.
    */
  def startAppend(
      spark: SparkSession,
      stream: DataFrame,
      dir: String,
      idCol: String,
      textCol: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row],
          batchId: Long) =>
        val rows = batch.toDF()
          .where(col(idCol).isNotNull && col(textCol).isNotNull)
        if (!rows.isEmpty)
          Bm25Index.appendRows(batch.sparkSession, dir, rows, idCol,
            textCol, txn = Some((WriterId, batchId)))
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
