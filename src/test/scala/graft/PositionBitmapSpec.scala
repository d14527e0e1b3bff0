package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PositionBitmap

/** The compressed position-delete payload: sparse/dense containers,
  * sequential probe, union, and the compression that justifies the
  * byte cap (contiguous runs ~1000× smaller than sorted longs).
  */
class PositionBitmapSpec extends AnyFunSuite {

  test("roundtrip: sparse and dense containers, duplicates collapse") {
    // container 0 sparse (3 lows), container 1 dense (65536 lows),
    // container 77 sparse crossing the signed-short midpoint
    val positions = Array(1L, 5L, 9L, 5L) ++
      (65536L until 131072L) ++
      Array((77L << 16) | 32767L, (77L << 16) | 32768L, (77L << 16) | 65535L)
    val bm = PositionBitmap.fromUnsorted(positions)
    assert(bm.cardinality === 3L + 65536L + 3L)
    assert(bm.toSortedArray === positions.distinct.sorted)
  }

  test("probe answers membership for ascending and random order") {
    val dead = Array(0L, 2L, 100000L, 100001L, (5L << 16) | 70L)
    val bm = PositionBitmap.fromUnsorted(dead.clone())
    val p = bm.probe()
    // ascending walk (the reader's access pattern)
    (0L until 400000L).foreach { i =>
      assert(p(i) === dead.contains(i), s"ordinal $i")
    }
    // cache-busting random revisits
    val p2 = bm.probe()
    Seq(100001L, 2L, 399999L, 0L, (5L << 16) | 70L, 1L).foreach { i =>
      assert(p2(i) === dead.contains(i), s"ordinal $i")
    }
  }

  test("union merges layers; contiguous runs compress ~1000x") {
    val a = PositionBitmap.fromUnsorted(Array(1L, 10L, 1000000L))
    val b = PositionBitmap.fromUnsorted(Array(2L, 10L, 999999L))
    assert(a.union(b).toSortedArray ===
      Array(1L, 2L, 10L, 999999L, 1000000L))
    // 5.25M contiguous-ish dead rows (the old cap's breaking point):
    // dense containers put this around 1 bit/position
    val big = PositionBitmap.fromSorted(
      (0L until 6000000L).filter(_ % 8 != 0).toArray)
    assert(big.cardinality === 5250000L)
    assert(big.estimatedBytes < (2L << 20),
      s"expected ~750 KiB, got ${big.estimatedBytes}")
    // sorted-longs form would be 42 MB
    assert(big.estimatedBytes * 50 < 5250000L * 8)
  }

  test("java serialization keeps probes correct (broadcast transport)") {
    val bm = PositionBitmap.fromUnsorted(Array(3L, 70000L, 70001L))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(bm); oos.close()
    val read = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[PositionBitmap]
    val p = read.probe()
    assert(p(3L) && p(70000L) && p(70001L) && !p(4L) && !p(70002L))
  }
}
