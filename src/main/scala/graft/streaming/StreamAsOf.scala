package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/** STREAM-STREAM backward as-of join — the streaming twin of
  * [[graft.operators.AsOfJoin]] (J2) with BOTH sides continuous, which
  * Spark's built-in stream-stream joins cannot express ("latest right
  * row ≤ left time" is not an equi/range predicate but an argmax over
  * an unbounded-preceding range).
  *
  * Correctness contract: each left event is emitted EXACTLY ONCE, with
  * the value of the latest right event at-or-before it in the same key
  * group, and only once the shared watermark proves no earlier right
  * event can still arrive (left rows are held in state until
  * `lt < watermark`). Within-watermark out-of-order arrivals on either
  * side therefore produce exactly the batch `AsOfJoin.backward` answer
  * over the same data — spec-verified against it.
  *
  * State per key is watermark-bounded: unflushed left rows (horizon ≤
  * watermark delay) + right rows newer than the watermark + ONE carry
  * right row (the newest at-or-below the watermark — still the best
  * match for any future left). Event-time timeouts flush keys that go
  * quiet; no driver state, one narrow hash shuffle per micro-batch —
  * at scale the state store is per-partition RocksDB, same shape as
  * sessionization.
  */
object StreamAsOf {

  /** Internal union row (public: Dataset encoders codegen field access). */
  case class Tagged(key: Long, ts: Timestamp, left: Boolean,
      payload: Option[String], value: Option[Double])

  /** State: (rights sorted asc, unflushed lefts) — times in micros. */
  case class AsOfBuf(rights: List[(Long, Double)],
      lefts: List[(Long, String)])

  case class AsOfOut(key: Long, ts: Timestamp, payload: String,
      asof_value: Option[Double])

  private def tsToMicros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000L

  private def microsToTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** @param left  streaming frame with (`keyCol`, `timeCol`, `payloadCol`)
    * @param right streaming frame with (`keyCol`, `timeCol`, `valueCol`)
    * @param watermark shared out-of-orderness bound (e.g. "10 minutes");
    *                  results are delayed by at most this much event time
    */
  def backward(
      spark: SparkSession,
      left: DataFrame, leftKey: String, leftTime: String, payloadCol: String,
      right: DataFrame, rightKey: String, rightTime: String, valueCol: String,
      watermark: String): Dataset[AsOfOut] = {
    import spark.implicits._

    val l = left
      .withWatermark(leftTime, watermark)
      .select(col(leftKey).cast(LongType).as("key"),
        col(leftTime).as("ts"), lit(true).as("left"),
        col(payloadCol).cast("string").as("payload"),
        lit(null).cast("double").as("value"))
    val r = right
      .withWatermark(rightTime, watermark)
      .select(col(rightKey).cast(LongType).as("key"),
        col(rightTime).as("ts"), lit(false).as("left"),
        lit(null).cast("string").as("payload"),
        col(valueCol).cast("double").as("value"))
    val tagged = l.unionByName(r)
      .where(col("key").isNotNull && col("ts").isNotNull) // dirty rows drop
      .as[Tagged]

    tagged
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfBuf, AsOfOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, batch: Iterator[Tagged], state: GroupState[AsOfBuf]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
          var rights = st.rights
          var lefts = st.lefts
          batch.foreach { e =>
            val us = tsToMicros(e.ts)
            if (e.left) lefts ::= ((us, e.payload.getOrElse("")))
            else e.value.foreach(v => rights ::= ((us, v)))
          }
          val rSorted = rights.sortBy(_._1)
          // flush exactly the lefts the watermark has sealed: no right
          // row with rt <= lt can arrive once lt < watermark (engine
          // drops later arrivals older than the watermark)
          val (ready, pending) = lefts.partition(_._1 < wmUs)
          val out = ready.sortBy(_._1).map { case (lt, payload) =>
            val m = rSorted.takeWhile(_._1 <= lt).lastOption
            AsOfOut(key, microsToTs(lt), payload, m.map(_._2))
          }
          // prune rights: everything below the watermark except the
          // newest such row (the carry — best match for future lefts)
          val (old, fresh) = rSorted.partition(_._1 < wmUs)
          val kept = old.lastOption.toList ++ fresh
          if (pending.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(AsOfBuf(kept, pending))
            if (pending.nonEmpty)
              // earliest unflushed left seals when the watermark passes
              // it (timeout is millis; round UP, stay above current wm)
              state.setTimeoutTimestamp(math.max(
                (pending.map(_._1).min + 999L) / 1000L + 1,
                state.getCurrentWatermarkMs() + 1))
          }
          out.iterator
      }
  }
}
