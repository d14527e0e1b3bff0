package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** STREAM-STREAM point-in-interval join — the streaming twin of
  * [[graft.operators.IntervalJoin.pointInInterval]] (J1) with BOTH
  * sides continuous.
  *
  * Unlike the as-of join (whose "latest right ≤ left" argmax needs
  * custom state, [[StreamAsOf]]), point-in-interval IS an equi + time-
  * range predicate — exactly the shape Spark's built-in watermarked
  * stream-stream join executes with bounded state. So this operator is
  * deliberately a thin declarative composition, not a stateful
  * re-implementation: preference (a) of the build rules. Spark derives
  * the state eviction bound from the watermarks plus the
  * `point ≤ start + maxDuration` conjunct; each side buffers only
  * watermark-delay + maxDuration of event time per key, per-partition
  * state store, one hash shuffle per micro-batch.
  *
  * `maxDuration` is the STATE-BOUND CONTRACT, not a hint: a point
  * falling inside an interval but more than `maxDuration` after its
  * start is NOT emitted (the interval's state was reclaimable). Size it
  * to the longest interval the feed can produce (the reference's SPP
  * feed: 15-minute settlement intervals → "1 hour" is generous).
  * Within that bound, out-of-order arrivals on either side produce
  * exactly the batch J1 answer over the same data — spec-pinned.
  *
  * Both time bounds are CLOSED (`between` semantics, SURVEY §7.4.6),
  * matching the batch operator.
  */
object StreamIntervalJoin {

  /** @param points     streaming frame carrying (`pKey`, `pTime`, payload…)
    * @param intervals  streaming frame carrying (`iKey`, `iStart`, `iEnd`, …)
    * @param watermark  shared out-of-orderness bound (e.g. "10 minutes")
    * @param maxDuration longest honored interval span (SQL interval
    *                    literal body, e.g. "1 hour") — see the state-bound
    *                    contract above
    * @param select     output columns (built against the joined frame);
    *                    empty = all columns from both sides
    * @param joinType   "inner" (default), "left_outer", or
    *                    "full_outer" — the outer sides emit an
    *                    unmatched row ONCE, null-padded, when the
    *                    watermark proves no in-bound partner can still
    *                    arrive (Spark's outer stream-stream semantics
    *                    under the same state bound; full-outer
    *                    null-pads unmatched INTERVALS too)
    */
  def pointInInterval(
      points: DataFrame, pKey: String, pTime: String,
      intervals: DataFrame, iKey: String, iStart: String, iEnd: String,
      watermark: String, maxDuration: String,
      select: Seq[Column] = Nil, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer" ||
      joinType == "full_outer",
      s"joinType must be inner, left_outer, or full_outer, got '$joinType'")
    val p = points.withWatermark(pTime, watermark).alias("p")
    val i = intervals.withWatermark(iStart, watermark).alias("i")
    val joined = p.join(i,
      col(s"p.$pKey") === col(s"i.$iKey") &&
        col(s"p.$pTime") >= col(s"i.$iStart") &&
        col(s"p.$pTime") <=
          col(s"i.$iStart") + expr(s"INTERVAL $maxDuration") &&
        col(s"p.$pTime") <= col(s"i.$iEnd"),
      joinType)
    if (select.isEmpty) joined else joined.select(select: _*)
  }
}
