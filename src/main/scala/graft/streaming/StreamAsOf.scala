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
  * match for any future left). Event-time timeouts flush buffered left
  * rows when a key goes quiet; the carry right row itself is retained
  * INDEFINITELY by design — as-of semantics need the last right value
  * for whichever left arrives next, however far in the future. Under
  * heavy key churn that is unbounded total state; pass `carryIdleMs`
  * to trade completeness for a bound: a key idle (no rows either side)
  * past that event-time horizon has its carry dropped, and a left
  * arriving later than the horizon after its last right joins null.
  * No driver state, one narrow hash shuffle per micro-batch — at scale
  * the state store is per-partition RocksDB, same shape as
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

  import TimeCodec.{tsToMicros, microsToTs}

  /** @param left  streaming frame with (`keyCol`, `timeCol`, `payloadCol`)
    * @param right streaming frame with (`keyCol`, `timeCol`, `valueCol`)
    * @param watermark shared out-of-orderness bound (e.g. "10 minutes");
    *                  results are delayed by at most this much event time
    * @param carryIdleMs optional event-time TTL for the carry right row:
    *                    a key with no activity on either side for this
    *                    long has its state dropped (bounds total state
    *                    under key churn; later lefts on that key join
    *                    null). Default `None` = retain carry forever,
    *                    the exact as-of semantics.
    *
    * Key columns must be integral (byte/short/int/long) — state is keyed
    * by Long. Non-numeric keys fail here at plan time rather than
    * silently casting to null and emitting nothing.
    */
  def backward(
      spark: SparkSession,
      left: DataFrame, leftKey: String, leftTime: String, payloadCol: String,
      right: DataFrame, rightKey: String, rightTime: String, valueCol: String,
      watermark: String, carryIdleMs: Option[Long] = None): Dataset[AsOfOut] = {
    import spark.implicits._

    // Fail fast on key types that would cast to null below: a string
    // zone id, say, would null out on LongType cast, hit the dirty-row
    // filter, and the stream would run forever emitting nothing.
    Seq(left.schema(leftKey) -> leftKey, right.schema(rightKey) -> rightKey)
      .foreach { case (field, name) =>
        field.dataType match {
          case org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.LongType => ()
          case dt => throw new IllegalArgumentException(
            s"StreamAsOf.backward: key column '$name' has type " +
              s"${dt.simpleString}; state is keyed by Long, so keys must " +
              "be integral. Hash or dictionary-encode string keys first " +
              "(e.g. xxhash64(col)) and join the original key back after.")
        }
      }

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
          // Seal timeouts are armed only while lefts are pending, the
          // idle TTL only while none are: a timeout firing with no
          // buffered lefts and no new rows is the TTL — the key went
          // quiet, drop its carry.
          val idleExpired = carryIdleMs.isDefined && state.hasTimedOut &&
            st.lefts.isEmpty && batch.isEmpty
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
          if ((pending.isEmpty && kept.isEmpty) || idleExpired) state.remove()
          else {
            state.update(AsOfBuf(kept, pending))
            if (pending.nonEmpty)
              // earliest unflushed left seals when the watermark passes
              // it (timeout is millis; round UP, stay above current wm)
              state.setTimeoutTimestamp(math.max(
                (pending.map(_._1).min + 999L) / 1000L + 1,
                state.getCurrentWatermarkMs() + 1))
            else carryIdleMs.foreach { ttl =>
              // carry-only state: arm the idle TTL; any later activity
              // on the key re-arms (data invocations overwrite this)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttl)
            }
          }
          out.iterator
      }
  }
}
