package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/** Streaming sessionization with custom per-key state
  * (`flatMapGroupsWithState` + event-time timeout) — the stateful
  * counterpart of the batch gap-sessionizer (`SparkEntry` w2_sessionize).
  *
  * The reference has no streaming engine (SURVEY.md §2.9); its session-like
  * analyses are cron batch. This is the idiomatic continuous upgrade: state
  * is the list of not-yet-sealed sessions per user, bounded by the
  * watermark — late events beyond the watermark are dropped by the
  * engine, unsealed sessions stay revisable, and each session flushes
  * exactly once when the watermark passes its end + gap (event-time
  * timeout). State size is O(active users × unsealed sessions), bounded
  * by the watermark horizon, independent of stream length.
  *
  * Scale notes: `groupByKey(user)` is one hash shuffle of narrow
  * (user, ts, value) rows per micro-batch; the state store is
  * per-partition RocksDB/HDFS-backed on a real cluster. No collect, no
  * driver state.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)

  /** Open-session state: bounds, event count, value sum. Times in epoch
    * MICROS (state must be encodable) — matching the batch sessionizer's
    * unix_micros gap arithmetic; millis truncation would merge sessions
    * the batch path splits at sub-millisecond gap boundaries.
    */
  case class OpenSession(start: Long, end: Long, n: Long, sum: Double)

  import TimeCodec.{tsToMicros, microsToTs}

  case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total_value: Double)

  /** Sessionize a stream: events for the same user separated by more than
    * `gapSeconds` start a new session. Emits each session exactly once
    * (append mode), and only once the WATERMARK passes its `end + gap` —
    * until then every session stays revisable in state, so a
    * within-watermark late event merges into (or bridges) exactly the
    * session it belongs to, matching the batch sessionizer's output.
    * Rows with null user_id/time (or ids that fail the long cast) are
    * dropped, not job-fatal.
    *
    * @param events must have `user_id` (castable to long), `timeCol`
    *               (timestamp), `valueCol` (double)
    */
  def sessions(
      spark: SparkSession,
      events: DataFrame,
      timeCol: String,
      valueCol: String,
      gapSeconds: Long,
      watermark: String = "1 hour"): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    val typed = events
      .withWatermark(timeCol, watermark)
      .select(col("user_id").cast(LongType).as("user_id"),
        col(timeCol).as("ts"),
        // null-safe: a null measure counts 0 toward the session sum
        // instead of failing the primitive-field decode
        coalesce(col(valueCol).cast("double"), lit(0.0)).as("value"))
      // dirty rows (null/uncastable id, null time) are dropped, not fatal
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .as[Event]

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[OpenSession], Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event],
            state: GroupState[List[OpenSession]]) =>
          def close(s: OpenSession): Session = Session(uid,
            microsToTs(s.start), microsToTs(s.end), s.n, s.sum)

          // Merge retained sessions + this batch's events as time-sorted
          // singletons (late events extend/bridge whichever session they
          // fall into), then FLUSH only sessions the watermark has sealed
          // (end + gap <= watermark) — every unsealed session stays in
          // state and remains revisable by further late events, exactly
          // like the batch sessionizer over the same data.
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val pieces = (state.getOption.getOrElse(Nil) ++
            batch.map { e =>
              val us = tsToMicros(e.ts)
              OpenSession(us, us, 1L, e.value)
            }).sortBy(s => (s.start, s.end))
          val merged = pieces.foldLeft(List.empty[OpenSession]) {
            case (acc, s) => acc match {
              case cur :: rest if s.start - cur.end <= gapUs =>
                OpenSession(cur.start, math.max(cur.end, s.end),
                  cur.n + s.n, cur.sum + s.sum) :: rest
              case _ => s :: acc
            }
          }.reverse
          val (flushed, open) = merged.partition(_.end + gapUs <= wmUs)
          if (open.nonEmpty) {
            state.update(open)
            // next flush check when the earliest unsealed session seals
            // (timeout API is millis; round UP so we never fire early)
            state.setTimeoutTimestamp(math.max(
              (open.map(_.end + gapUs).min + 999L) / 1000L,
              state.getCurrentWatermarkMs() + 1))
          } else state.remove()
          flushed.map(close).iterator
      }
  }
}
