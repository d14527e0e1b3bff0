package graft.streaming

import java.sql.Timestamp

/** The ONE Timestamp ↔ epoch-micros codec for streaming state (state
  * must be encodable, and micros match the batch operators' arithmetic).
  *
  * Both directions use floor division: `getTime / 1000` truncates toward
  * zero, so a pre-epoch instant with a sub-second part (e.g.
  * 1969-12-31 23:59:59.5 → getTime −500, nanos 5e8) would encode to
  * +500000 µs instead of −500000 µs — sorting pre-epoch changes AFTER
  * post-epoch ones and failing to round-trip through [[microsToTs]].
  */
private[streaming] object TimeCodec {

  def tsToMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def microsToTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
}
