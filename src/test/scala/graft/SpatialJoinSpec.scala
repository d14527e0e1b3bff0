package graft

import org.apache.spark.sql.functions._
import graft.operators.SpatialJoin

class SpatialJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("radiusPairs: hand-placed points — neighbors found across cell " +
      "boundaries, far points excluded, each pair exactly once") {
    // radius 1.0 cells; pairs (1,2) same cell, (3,4) straddle a cell
    // boundary at distance 0.2, (5) isolated
    val pts = Seq(
      (1L, 0.10, 0.10), (2L, 0.30, 0.10),
      (3L, 0.95, 2.50), (4L, 1.05, 2.50),
      (5L, 5.00, 5.00)).toDF("id", "x", "y")
    val got = SpatialJoin.radiusPairs(pts, "id", "x", "y", radius = 1.0)
      .select("id", "id_2").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (3L, 4L)))
  }

  test("radiusPairs equals brute force on a deterministic cloud") {
    val n = 300
    val pts = (1 to n).map { i =>
      val x = ((i * 2654435761L) % 1000) / 1000.0
      val y = ((i * 40503L) % 1000) / 1000.0
      (i.toLong, x, y)
    }.toDF("id", "x", "y")
    val r = 0.07
    val got = SpatialJoin.radiusPairs(pts, "id", "x", "y", r)
      .select("id", "id_2").as[(Long, Long)].collect().toSet
    val arr = pts.as[(Long, Double, Double)].collect()
    val brute = (for {
      a <- arr; b <- arr if a._1 < b._1
      dx = a._2 - b._2; dy = a._3 - b._3
      if dx * dx + dy * dy <= r * r
    } yield (a._1, b._1)).toSet
    assert(brute.nonEmpty, "degenerate fixture: no close pairs")
    assert(got === brute,
      s"missing: ${(brute -- got).take(5)}; extra: ${(got -- brute).take(5)}")
  }

  test("radiusPairs: dist/dist2 are the exact squared-distance chain") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.3, 0.4)).toDF("id", "x", "y")
    val row = SpatialJoin.radiusPairs(pts, "id", "x", "y", 1.0)
      .select("dist2", "dist").as[(Double, Double)].head()
    assert(row._1 === 0.3 * 0.3 + 0.4 * 0.4)
    assert(row._2 === math.sqrt(0.3 * 0.3 + 0.4 * 0.4))
  }

  test("radiusPairs: oversized-cell cap chains instead of exploding") {
    // 50 coincident points (one dense cell) + one isolated
    val pts = ((1 to 50).map(i => (i.toLong, 0.5, 0.5)) :+
      (100L, 9.0, 9.0)).toDF("id", "x", "y")
    val capped = SpatialJoin.radiusPairs(pts, "id", "x", "y",
      radius = 1.0, maxCellSize = 10)
      .select("id", "id_2").as[(Long, Long)].collect().toSet
    // linear chain: 49 adjacent pairs, not 50*49/2 = 1225
    assert(capped === (1 to 49).map(i => (i.toLong, i + 1L)).toSet)
    // transitively connected under union-find
    val parent = scala.collection.mutable.Map(
      (1 to 50).map(i => i.toLong -> i.toLong): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { parent(x) = find(parent(x)); parent(x) }
    capped.foreach { case (a, b) => parent(find(a)) = find(b) }
    assert((1 to 50).map(i => find(i.toLong)).toSet.size === 1)
    // uncapped regime on the same data is exhaustive
    val full = SpatialJoin.radiusPairs(pts, "id", "x", "y", radius = 1.0)
      .count()
    assert(full === 1225L)
  }

  test("radiusPairs: guards reject bad inputs; null coordinates drop") {
    intercept[IllegalArgumentException] {
      SpatialJoin.radiusPairs(Seq((1L, 0.0, 0.0)).toDF("id", "x", "y"),
        "id", "x", "y", radius = 0.0)
    }
    intercept[IllegalArgumentException] {
      SpatialJoin.radiusPairs(Seq((1L, 0.0, 0.0)).toDF("id", "x", "y"),
        "id", "x", "y", radius = 1.0, maxCellSize = 1)
    }
    val withNull = Seq((1L, Some(0.1), Some(0.1)), (2L, None, Some(0.1)),
      (3L, Some(0.15), Some(0.1))).toDF("id", "x", "y")
    val got = SpatialJoin.radiusPairs(withNull, "id", "x", "y", 1.0)
      .select("id", "id_2").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 3L)))
  }
}
