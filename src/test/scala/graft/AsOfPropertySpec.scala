package graft

import java.sql.Timestamp

import scala.util.Random

import graft.operators.{AsOfJoin, IntervalJoin}

/** Property-style checks (SURVEY.md §5.2): the distributed operators vs
  * naive quadratic specifications on seeded random inputs.
  */
class AsOfPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val base = 1700000000000L // fixed epoch base, ms

  private def randomSide(rnd: Random, maxN: Int): List[(Long, Double)] = {
    val n = rnd.nextInt(maxN + 1)
    List.fill(n)((base + rnd.nextInt(2000) * 500L,
      rnd.nextInt(100000) / 100.0))
      .distinctBy(_._1) // unique right times => deterministic as-of
  }

  test("as-of join equals naive backward-nearest spec on random inputs") {
    val rnd = new Random(42)
    for (trial <- 1 to 12) {
      val ls = randomSide(rnd, 25)
      val rs = randomSide(rnd, 25)
      val buckets = Seq(1, 3, 17)(trial % 3)
      val left = ls.map { case (t, v) => (new Timestamp(t), v) }.toDF("time", "x")
      val right = rs.map { case (t, v) => (new Timestamp(t), v) }.toDF("time", "v")
      val got = AsOfJoin.backward(left, right, "time", "time",
        valueCols = Seq(("v", "v")), numBuckets = buckets)
        .select($"time", $"v").collect()
        .map(r => (r.getTimestamp(0).getTime,
          Option(r.get(1)).map(_.asInstanceOf[Double])))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val want = ls.map { case (t, _) =>
        t -> rs.filter(_._1 <= t).maxByOption(_._1).map(_._2)
      }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(got === want, s"trial $trial (buckets=$buckets, |l|=${ls.size}, |r|=${rs.size})")
    }
  }

  test("auto() equals the naive keyed spec under every strategy choice") {
    val rnd = new Random(1234)
    for (trial <- 1 to 6) {
      val keys = 1 + rnd.nextInt(3)
      def side(maxN: Int): List[(Int, Long, Double)] = {
        val n = rnd.nextInt(maxN + 1)
        List.fill(n)((rnd.nextInt(keys), base + rnd.nextInt(2000) * 500L,
          rnd.nextInt(100000) / 100.0))
          .distinctBy(t => (t._1, t._2)) // unique (key, time) on the right
      }
      val ls = side(20)
      val rs = side(20)
      val left = ls.map { case (k, t, v) => (k, new Timestamp(t), v) }
        .toDF("k", "time", "x")
      val right = rs.map { case (k, t, v) => (k, new Timestamp(t), v) }
        .toDF("k", "time", "v")
      // threshold 0 forces merge (or backward when keyless); MaxValue
      // forces the broadcast pick — the answer must not depend on it
      val want = ls.map { case (k, t, _) =>
        (k, t) -> rs.filter(r => r._1 == k && r._2 <= t)
          .maxByOption(_._2).map(_._3)
      }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      for (threshold <- Seq(0L, Long.MaxValue)) {
        val got = AsOfJoin.auto(left, right, "time", "time",
          by = Seq(("k", "k")), valueCols = Seq(("v", "v")),
          broadcastThreshold = threshold)
          .select($"k", $"time", $"v").collect()
          .map(r => ((r.getInt(0), r.getTimestamp(1).getTime),
            Option(r.get(2)).map(_.asInstanceOf[Double])))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        assert(got === want,
          s"trial $trial threshold=$threshold keys=$keys |l|=${ls.size} |r|=${rs.size}")
      }
    }
  }

  test("bucketed interval join equals filter-after-cross-join spec") {
    val rnd = new Random(7)
    for (trial <- 1 to 8) {
      val ivs = List.tabulate(rnd.nextInt(16)) { i =>
        val s = base + rnd.nextInt(1000) * 1000L
        (i.toLong, s, s + (1 + rnd.nextInt(600)) * 1000L)
      }
      val ps = List.tabulate(rnd.nextInt(21)) { i =>
        (i.toLong, base + rnd.nextInt(1600) * 1000L)
      }
      val points = ps.map { case (id, t) => (id, new Timestamp(t)) }.toDF("pid", "pt")
      val intervals = ivs.map { case (id, s, e) =>
        (id, new Timestamp(s), new Timestamp(e)) }.toDF("iid", "istart", "iend")
      val got = IntervalJoin.pointInIntervalBucketed(points, intervals,
        "pt", "istart", "iend", widthMicros = 90L * 1000000)
        .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (pid, t) <- ps
        (iid, s, e) <- ivs
        if t >= s && t <= e
      } yield (pid, iid)).toSet
      assert(got === want, s"trial $trial")
    }
  }
}
