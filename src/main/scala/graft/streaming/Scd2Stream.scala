package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/** Streaming SCD type 2 maintenance — the continuous counterpart of
  * `Analytics.scd2` (a23): a change-log stream keeps each key's current
  * dimension version in state and emits a version EXACTLY ONCE when it
  * closes (a sealed later change supersedes it). Append-mode discipline
  * matches [[Sessionize]]: nothing is emitted while it could still be
  * revised — the open (is_current) version lives in state, and
  * change-log rows buffer until the watermark passes them, so
  * within-watermark out-of-order rows land in history exactly where the
  * batch operator would put them.
  *
  * Scale notes: one hash shuffle of narrow (key, ts, tie, attr) rows per
  * micro-batch; state per key is the open version plus the
  * watermark-bounded buffer of unsealed changes — independent of stream
  * length. No collect, no driver state.
  */
object Scd2Stream {

  case class Change(user_id: Long, ts: Timestamp, tie: Long, attr: String)

  /** A change buffered until the watermark seals it. Times in epoch
    * micros (state must be encodable; micros match the batch operator's
    * timestamp arithmetic).
    */
  case class PendingChange(us: Long, tie: Long, attr: String)

  /** Per-key state: the open version (if any) + unsealed changes. */
  case class DimState(hasCur: Boolean, curStart: Long, curAttr: String,
      pending: List[PendingChange])

  /** A CLOSED version (is_current = false by construction — the open
    * version is in state, not in the output stream).
    */
  case class ClosedVersion(user_id: Long, attr: String,
      effective_from: Timestamp, effective_to: Timestamp)

  import TimeCodec.{tsToMicros, microsToTs}

  /** Maintain SCD2 versions over a change-log stream. `events` must
    * carry `user_id` (castable to long), `timeCol` (timestamp), `tieCol`
    * (long — the same total-order tie-breaker the batch operator
    * requires), and `attrCol` (string; null is a legal value and
    * null→value / value→null are changes, null→null is not — the batch
    * null-safe contract). Rows with null key/time drop, not job-fatal.
    *
    * Sealing is strict (`ts < watermark`): Spark admits rows AT the
    * watermark, so a row is processed only once no equal-or-earlier
    * arrival is possible. Consecutive sealed rows with an unchanged
    * attribute collapse silently, exactly like the batch operator.
    */
  def closedVersions(
      spark: SparkSession,
      events: DataFrame,
      timeCol: String,
      tieCol: String,
      attrCol: String,
      watermark: String = "1 hour"): Dataset[ClosedVersion] = {
    import spark.implicits._

    val typed = events
      .withWatermark(timeCol, watermark)
      .select(col("user_id").cast(LongType).as("user_id"),
        col(timeCol).as("ts"),
        // null tie sorts FIRST among equal timestamps (the batch
        // operator's asc-nulls-first), encoded as MinValue so the
        // primitive-Long state field cannot decode-crash the query
        coalesce(col(tieCol).cast(LongType), lit(Long.MinValue)).as("tie"),
        col(attrCol).cast("string").as("attr"))
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .as[Change]

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[DimState, ClosedVersion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Change], state: GroupState[DimState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(
            DimState(hasCur = false, 0L, null, Nil))
          val pending = (st.pending ++ batch.map(c =>
            PendingChange(tsToMicros(c.ts), c.tie, c.attr)))
            .sortBy(p => (p.us, p.tie))
          val (sealable, rest) = pending.partition(_.us < wmUs)

          var hasCur = st.hasCur
          var curStart = st.curStart
          var curAttr = st.curAttr
          val closed = List.newBuilder[ClosedVersion]
          sealable.foreach { p =>
            if (!hasCur) {
              hasCur = true; curStart = p.us; curAttr = p.attr
            } else if (Option(p.attr) != Option(curAttr)) {
              closed += ClosedVersion(uid, curAttr,
                microsToTs(curStart), microsToTs(p.us))
              curStart = p.us; curAttr = p.attr
            } // unchanged: collapse silently
          }

          if (hasCur || rest.nonEmpty) {
            state.update(DimState(hasCur, curStart, curAttr, rest))
            if (rest.nonEmpty)
              // wake when the earliest unsealed change seals (timeout
              // API is millis; round UP so we never fire early)
              state.setTimeoutTimestamp(math.max(
                (rest.map(_.us).min + 999L) / 1000L,
                state.getCurrentWatermarkMs() + 1))
          } else state.remove()
          closed.result().iterator
      }
  }
}
