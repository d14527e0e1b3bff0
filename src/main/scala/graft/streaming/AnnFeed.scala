package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.AnnIndex

/** Streaming ANN index maintenance — keeps a persisted [[AnnIndex]]
  * fresh from a vector stream, exactly-once.
  *
  * Per micro-batch: new rows are cell-assigned (and PQ-encoded when the
  * index carries codebooks) with the STORED quantizer — one map-side
  * pass, no retraining, the FAISS add-after-train contract — and
  * appended to the index's corpus table under writer-txn epoch =
  * `batchId` (the [[SketchFeed]] discipline), so a crashed-and-replayed
  * batch cannot double-index its rows. Any handle loaded after the
  * batch commits sees the new rows; [[AnnIndex.isStale]] answers
  * whether a re-query needs a re-[[AnnIndex.load]].
  *
  * Scale shape: state never lives in the stream — the store is the
  * index's lake tables; the per-batch work is one quantizer pass over
  * the batch's rows plus one keyed append. The model tables re-read per
  * batch are nlist + m×ksub rows (model-sized, the centroid contract).
  *
  * What this deliberately does NOT do: retrain the quantizer. Cell
  * balance degrades as the streamed distribution drifts from the build
  * sample — the standard IVF trade — and the remedy is an offline
  * [[AnnIndex.build]] of a successor index, not an in-stream retrain
  * (which would silently re-cell the whole corpus mid-query).
  */
object AnnFeed {

  /** Writer id stamped on every batch's append. */
  val WriterId = "graft-ann-feed"

  /** Start appending `stream`'s rows (schema must carry `idCol` +
    * `vecCol`) into the index at `dir`. Rows with null id/vector carry
    * nothing indexable and are skipped, not job-fatal.
    */
  def startAppend(
      spark: SparkSession,
      stream: DataFrame,
      dir: String,
      idCol: String,
      vecCol: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row],
          batchId: Long) =>
        val rows = batch.toDF()
          .where(col(idCol).isNotNull && col(vecCol).isNotNull)
        if (!rows.isEmpty)
          AnnIndex.appendRows(batch.sparkSession, dir, rows, idCol,
            vecCol, txn = Some((WriterId, batchId)))
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
