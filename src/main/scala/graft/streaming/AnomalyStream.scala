package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/** Streaming rolling z-score anomaly detection — the stateful
  * counterpart of `Analytics.rollingZScoreAnomalies` (ts1), same
  * discipline as [[Sessionize]]: per-key custom state via
  * `flatMapGroupsWithState`, watermark-sealed emission.
  *
  * Parity contract with the batch operator: an event is scored against
  * the trailing `lookback` SEALED events of its key in (ts, event_id)
  * order, itself excluded; values quantize to cents (the batch
  * DECIMAL(18,2) stabilization) and the z chain is the same
  * fixed-order IEEE expression — so for the same sealed prefix the
  * stream flags exactly the rows the batch query flags
  * (AnomalyStreamSpec pins stream == batch on the sealed range).
  *
  * Sealing: an event is scored only once the watermark passes its
  * timestamp — before that a within-watermark late event could still
  * belong EARLIER in the trailing window and change the verdict.
  * Events newer than the watermark wait in state (bounded by the
  * watermark horizon); each is scored and emitted exactly once.
  *
  * Scale shape: one hash shuffle of narrow rows per micro-batch;
  * state per key = pending events within the watermark horizon plus
  * `lookback` sealed (ts, cents) pairs — independent of stream length.
  */
object AnomalyStream {

  case class Event(user_id: Long, event_id: Long, ts: Timestamp,
      value: Double)

  /** Per-key state: not-yet-sealed events + the last `lookback` sealed
    * observations as (micros, cents). Times in epoch micros, values in
    * exact cents (the encodable forms of the batch operator's
    * timestamp ordering and decimal quantization).
    */
  case class KeyState(pending: List[(Long, Long, Long, Double)],
      tail: List[(Long, Long)])

  case class Anomaly(user_id: Long, event_id: Long, ts: Timestamp,
      value: Double, z: Double)

  import TimeCodec.{microsToTs, tsToMicros}

  /** Round a double to exact cents — the same value the batch path's
    * CAST(v AS DECIMAL(18,2)) produces (HALF_UP at the second decimal).
    */
  private[streaming] def toCents(v: Double): Long =
    new java.math.BigDecimal(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** Score `cents` (raw `x`) against the trailing window — the batch
    * operator's exact z chain from exact integer sums: s1 = Σcents/100,
    * s2 = Σcents²/10000 (both correctly-rounded doubles of the same
    * rationals the decimal casts produce).
    */
  private[streaming] def zOf(x: Double, tail: List[(Long, Long)],
      minObs: Int): Option[Double] = {
    val n = tail.length
    if (n < minObs) return None
    var s1c = 0L
    var s2c = 0L
    tail.foreach { case (_, c) => s1c += c; s2c += c * c }
    val s1 = s1c.toDouble / 100.0
    val s2 = s2c.toDouble / 10000.0
    val variance = (s2 - s1 * s1 / n) / (n - 1)
    if (variance > 0) Some((x - s1 / n) / math.sqrt(variance)) else None
  }

  /** Detect anomalies on a stream. `events` must have `user_id`
    * (castable to long), `event_id` (long, the intra-timestamp
    * tie-break), `timeCol` (timestamp), `valueCol` (double). Rows with
    * null key/time/value are dropped, not job-fatal (a null measure
    * carries no anomaly signal, unlike the sessionizer's sum where it
    * counts 0).
    */
  def anomalies(
      spark: SparkSession,
      events: DataFrame,
      timeCol: String,
      valueCol: String,
      lookback: Int,
      zThreshold: Double,
      minObs: Int = 2,
      watermark: String = "1 hour"): Dataset[Anomaly] = {
    require(lookback >= 1 && minObs >= 2 && zThreshold > 0,
      s"need lookback >= 1, minObs >= 2, zThreshold > 0")
    import spark.implicits._

    val typed = events
      .withWatermark(timeCol, watermark)
      .select(col("user_id").cast(LongType).as("user_id"),
        col("event_id").cast(LongType).as("event_id"),
        col(timeCol).as("ts"),
        col(valueCol).cast("double").as("value"))
      .where(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("ts").isNotNull && col("value").isNotNull)
      .as[Event]

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[KeyState, Anomaly](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[KeyState]) =>
          val st = state.getOption.getOrElse(KeyState(Nil, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val pending = st.pending ++ batch.map(e =>
            (tsToMicros(e.ts), e.event_id, toCents(e.value), e.value))
          // seal events the watermark has passed; score them in the
          // batch operator's (ts, event_id) order
          val (ready, open) = pending.partition(_._1 <= wmUs)
          var tail = st.tail
          val out = scala.collection.mutable.ListBuffer.empty[Anomaly]
          ready.sortBy(e => (e._1, e._2)).foreach {
            case (us, eid, cents, x) =>
              // x is the RAW value — the batch z chain subtracts the
              // stabilized mean from the unquantized observation
              zOf(x, tail, minObs).foreach { z =>
                if (math.abs(z) > zThreshold)
                  out += Anomaly(uid, eid, microsToTs(us), x, z)
              }
              tail = (tail :+ ((us, cents))).takeRight(lookback)
          }
          state.update(KeyState(open, tail))
          // wake this key when the watermark passes its oldest pending
          // event, so sealing does not wait for new data on the key
          open.map(_._1).minOption.foreach(us =>
            state.setTimeoutTimestamp(us / 1000L + 1L))
          out.iterator
      }
  }
}
