package graft.sources

/** Roaring-style compressed set of row ordinals (the position-delete
  * layer's per-file payload). Positions partition by their high bits
  * into 65536-ordinal containers; a sparse container stores sorted
  * 16-bit lows (2 bytes/position), a dense one an 8 KiB bitmap — the
  * classic RoaringBitmap layout (Chambi, Lemire et al., "Better bitmap
  * performance with Roaring bitmaps"), reimplemented minimally because
  * the sandbox has no external jars. Contiguous deletes (the common
  * compaction-pressure shape) compress ~1000×: 5M contiguous dead rows
  * cost ~640 KiB instead of 40 MB of sorted longs, and the whole map
  * ships ONCE per executor as a broadcast instead of once per task in
  * the reader-factory closure.
  */
final class PositionBitmap private (
    private val highs: Array[Long],
    private val containers: Array[AnyRef]) extends Serializable {

  def cardinality: Long = containers.iterator.map {
    case a: Array[Short] => a.length.toLong
    case b: Array[Long] =>
      var s = 0L; var i = 0
      while (i < b.length) { s += java.lang.Long.bitCount(b(i)); i += 1 }
      s
    case _ => 0L
  }.sum

  /** In-memory/serialized footprint, close enough for cap decisions. */
  def estimatedBytes: Long = 32L + highs.length * 8L +
    containers.iterator.map {
      case a: Array[Short] => 16L + a.length * 2L
      case b: Array[Long] => 16L + b.length * 8L
      case _ => 0L
    }.sum

  def toSortedArray: Array[Long] = {
    val out = Array.ofDim[Long](math.toIntExact(cardinality))
    var o = 0
    var i = 0
    while (i < highs.length) {
      val base = highs(i) << 16
      containers(i) match {
        case a: Array[Short] =>
          var j = 0
          while (j < a.length) {
            out(o) = base | ((a(j).toInt & 0xffff) ^ 0x8000); o += 1; j += 1
          }
        case b: Array[Long] =>
          var lo = 0
          while (lo < 65536) {
            if ((b(lo >>> 6) & (1L << (lo & 63))) != 0) {
              out(o) = base | lo; o += 1
            }
            lo += 1
          }
      }
      i += 1
    }
    out
  }

  /** Sequential-scan-friendly membership test: caches the last probed
    * container, so an ascending ordinal walk does one binary search per
    * 65536 ordinals. Each reader takes its own probe (mutable cursor).
    */
  def probe(): Long => Boolean = {
    var curHigh = -1L
    var ci = -1
    pos => {
      val hi = pos >>> 16
      if (hi != curHigh) {
        curHigh = hi
        ci = java.util.Arrays.binarySearch(highs, hi)
      }
      ci >= 0 && {
        val lo = (pos & 0xffffL).toInt
        containers(ci) match {
          case a: Array[Short] =>
            java.util.Arrays.binarySearch(a, ((lo ^ 0x8000) & 0xffff).toShort) >= 0
          case b: Array[Long] => (b(lo >>> 6) & (1L << (lo & 63))) != 0
        }
      }
    }
  }

  def union(other: PositionBitmap): PositionBitmap = {
    val a = toSortedArray
    val b = other.toSortedArray
    val merged = Array.ofDim[Long](a.length + b.length)
    System.arraycopy(a, 0, merged, 0, a.length)
    System.arraycopy(b, 0, merged, a.length, b.length)
    java.util.Arrays.sort(merged)
    PositionBitmap.fromSorted(merged)
  }
}

object PositionBitmap {

  /** Above this many positions a container flips from the sorted-shorts
    * array (2 bytes each) to the 8 KiB bitmap — the break-even point,
    * same constant as RoaringBitmap.
    */
  private val DenseThreshold = 4096

  /** Build from an ASCENDING (not necessarily distinct) position array. */
  def fromSorted(sorted: Array[Long]): PositionBitmap = {
    val highs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val containers = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var i = 0
    while (i < sorted.length) {
      val hi = sorted(i) >>> 16
      var end = i
      while (end < sorted.length && (sorted(end) >>> 16) == hi) end += 1
      // distinct lows within the run (input may carry duplicates)
      var distinct = 0
      var j = i
      var prev = -1L
      while (j < end) {
        if (sorted(j) != prev) { distinct += 1; prev = sorted(j) }
        j += 1
      }
      highs += hi
      if (distinct > DenseThreshold) {
        val words = Array.ofDim[Long](1024)
        j = i
        while (j < end) {
          val lo = (sorted(j) & 0xffffL).toInt
          words(lo >>> 6) |= 1L << (lo & 63)
          j += 1
        }
        containers += words
      } else {
        val arr = Array.ofDim[Short](distinct)
        var o = 0
        j = i
        prev = -1L
        while (j < end) {
          if (sorted(j) != prev) {
            val lo = (sorted(j) & 0xffffL).toInt
            arr(o) = ((lo ^ 0x8000) & 0xffff).toShort
            o += 1
            prev = sorted(j)
          }
          j += 1
        }
        containers += arr
      }
      i = end
    }
    new PositionBitmap(highs.toArray, containers.toArray)
  }

  def fromUnsorted(positions: Array[Long]): PositionBitmap = {
    java.util.Arrays.sort(positions)
    fromSorted(positions)
  }
}
