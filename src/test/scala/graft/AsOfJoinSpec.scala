package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val fm = Seq(
    (ts("2024-05-01 00:00:00"), 100.0),
    (ts("2024-05-01 00:05:00"), 110.0),
    (ts("2024-05-01 00:59:00"), 120.0),
    (ts("2024-05-01 01:00:00"), 130.0), // exact match with right @01:00
    (ts("2024-04-30 23:00:00"), 90.0)   // before any right row
  ).toDF("time", "mw")

  private val load = Seq(
    (ts("2024-05-01 00:00:00"), 42000.0),
    (ts("2024-05-01 01:00:00"), 45000.0),
    (ts("2024-05-01 02:00:00"), 47000.0)
  ).toDF("time", "load")

  /** Naive O(n·m) spec: latest right with rt <= lt. */
  private def naive(left: Seq[(Timestamp, Double)],
      right: Seq[(Timestamp, Double)]): Map[Timestamp, Option[Double]] =
    left.map { case (lt, _) =>
      lt -> right.filter(_._1.compareTo(lt) <= 0)
        .sortBy(_._1.getTime).lastOption.map(_._2)
    }.toMap

  test("backward as-of matches naive spec, exact matches included (J2)") {
    val got = AsOfJoin.backward(fm, load, "time", "time",
      valueCols = Seq(("load", "load")), numBuckets = 2)
      .select($"time", $"mw", $"load")
      .collect().map(r => (r.getTimestamp(0), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    val want = naive(
      fm.collect().map(r => (r.getTimestamp(0), r.getDouble(1))).toSeq,
      load.collect().map(r => (r.getTimestamp(0), r.getDouble(1))).toSeq)
    assert(got === want)
    // exact match: left @01:00 takes right @01:00, not @00:00
    assert(got(ts("2024-05-01 01:00:00")) === Some(45000.0))
    // unmatched left row yields null (outer form)
    assert(got(ts("2024-04-30 23:00:00")) === None)
  }

  test("inner=true drops unmatched left rows (reference dropna composed)") {
    val got = AsOfJoin.backward(fm, load, "time", "time",
      valueCols = Seq(("load", "load")), inner = true, numBuckets = 2)
    assert(got.count() === 4)
  }

  test("carry-in crosses empty buckets (left far after all right rows)") {
    val left = Seq((ts("2030-01-01 00:00:00"), 1.0)).toDF("time", "mw")
    val got = AsOfJoin.backward(left, load, "time", "time",
      valueCols = Seq(("load", "load")), numBuckets = 50)
    assert(got.select($"load").head.getDouble(0) === 47000.0)
  }

  test("keyed as-of partitions by equi key") {
    val l = Seq(("a", ts("2024-05-01 01:30:00"), 1.0),
      ("b", ts("2024-05-01 01:30:00"), 2.0)).toDF("k", "time", "x")
    val r = Seq(("a", ts("2024-05-01 01:00:00"), 10.0),
      ("b", ts("2024-05-01 01:15:00"), 20.0),
      ("b", ts("2024-05-01 02:00:00"), 30.0)).toDF("kk", "time", "v")
    val got = AsOfJoin.backward(l, r, "time", "time",
      by = Seq(("k", "kk")), valueCols = Seq(("v", "v")), numBuckets = 4)
      .select($"k", $"v").collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got === Map("a" -> 10.0, "b" -> 20.0))
  }

  test("bucket count does not change results (boundary invariance)") {
    def run(n: Int): Array[(Timestamp, Option[Double])] =
      AsOfJoin.backward(fm, load, "time", "time",
        valueCols = Seq(("load", "load")), numBuckets = n)
        .select($"time", $"load").collect()
        .map(r => (r.getTimestamp(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
        .sortBy(_._1.getTime)
    assert(run(1) === run(3))
    assert(run(1) === run(64))
  }

  test("broadcastBackward matches the distributed form (keyed and keyless)") {
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select($"time", $"mw", $"load").collect()
        .map(r => (r.getTimestamp(0), r.getDouble(1),
          Option(r.get(2)).map(_.asInstanceOf[Double])))
        .sortBy(_._1.getTime)
    val dist = collect(AsOfJoin.backward(fm, load, "time", "time",
      valueCols = Seq(("load", "load")), numBuckets = 4))
    val bcast = collect(AsOfJoin.broadcastBackward(fm, load, "time", "time",
      valueCols = Seq(("load", "load"))))
    assert(bcast === dist)
    val distInner = AsOfJoin.backward(fm, load, "time", "time",
      valueCols = Seq(("load", "load")), inner = true).count()
    val bcastInner = AsOfJoin.broadcastBackward(fm, load, "time", "time",
      valueCols = Seq(("load", "load")), inner = true).count()
    assert(bcastInner === distInner)
  }

  test("null left times never match (dropped under inner)") {
    val withNull = fm.unionByName(
      Seq((Option.empty[Timestamp], 999.0)).toDF("time", "mw"))
    val outer = AsOfJoin.backward(withNull, load, "time", "time",
      valueCols = Seq(("load", "load")))
    assert(outer.count() === 6)
    assert(outer.where($"mw" === 999.0).select($"load").head.get(0) === null)
    val inner = AsOfJoin.backward(withNull, load, "time", "time",
      valueCols = Seq(("load", "load")), inner = true)
    assert(inner.where($"mw" === 999.0).count() === 0)
  }

  test("matched row's null value is preserved, all value cols from same row") {
    // Right rows: @00:00 has (v1=1.0, v2=10.0); @01:00 has (v1=null, v2=20.0).
    // merge_asof attaches ALL columns of the single matched row — a left row
    // at 01:30 must get (null, 20.0), NOT v1 backfilled from 00:00.
    val l = Seq((ts("2024-05-01 01:30:00"), 1.0)).toDF("time", "x")
    val r = Seq(
      (ts("2024-05-01 00:00:00"), Option(1.0), Option(10.0)),
      (ts("2024-05-01 01:00:00"), Option.empty[Double], Option(20.0))
    ).toDF("time", "v1", "v2")
    for (buckets <- Seq(1, 4)) {
      val row = AsOfJoin.backward(l, r, "time", "time",
        valueCols = Seq(("v1", "v1"), ("v2", "v2")), numBuckets = buckets)
        .select($"v1", $"v2").head
      assert(row.isNullAt(0), s"buckets=$buckets: v1 must stay null")
      assert(row.getDouble(1) === 20.0)
    }
    // Same contract from the broadcast strategy — and inner keeps the row
    // (it IS matched, just with a null value).
    val b = AsOfJoin.broadcastBackward(l, r, "time", "time",
      valueCols = Seq(("v1", "v1"), ("v2", "v2")), inner = true)
      .select($"v1", $"v2").head
    assert(b.isNullAt(0) && b.getDouble(1) === 20.0)
    // carry path too: left in a later empty bucket must carry the whole
    // struct of the last right row, null included
    val lFar = Seq((ts("2024-05-02 09:00:00"), 1.0)).toDF("time", "x")
    val c = AsOfJoin.backward(lFar, r, "time", "time",
      valueCols = Seq(("v1", "v1"), ("v2", "v2")), numBuckets = 32)
      .select($"v1", $"v2").head
    assert(c.isNullAt(0) && c.getDouble(1) === 20.0)
  }

  test("broadcastBackward keyless empty right keeps left rows (outer)") {
    val outer = AsOfJoin.broadcastBackward(fm, load.limit(0), "time", "time",
      valueCols = Seq(("load", "load")))
    assert(outer.count() === 5)
    assert(outer.where($"load".isNotNull).count() === 0)
    val inner = AsOfJoin.broadcastBackward(fm, load.limit(0), "time", "time",
      valueCols = Seq(("load", "load")), inner = true)
    assert(inner.count() === 0)
  }

  test("both sides empty keeps left schema value types (parquet-writable)") {
    val out = AsOfJoin.backward(fm.limit(0), load.limit(0), "time", "time",
      valueCols = Seq(("load", "load")))
    assert(out.schema("load").dataType ===
      org.apache.spark.sql.types.DoubleType)
    assert(out.count() === 0)
  }

  test("empty right side yields all-null values / empty inner") {
    val empty = load.limit(0)
    val outer = AsOfJoin.backward(fm, empty, "time", "time",
      valueCols = Seq(("load", "load")))
    assert(outer.count() === 5)
    assert(outer.where($"load".isNotNull).count() === 0)
    val inner = AsOfJoin.backward(fm, empty, "time", "time",
      valueCols = Seq(("load", "load")), inner = true)
    assert(inner.count() === 0)
  }

  test("fixed epoch grid: same results as adaptive, one fewer Spark job") {
    val adaptive = AsOfJoin.backward(fm, load, "time", "time",
      valueCols = Seq(("load", "load")), numBuckets = 4)
      .select($"time", $"mw", $"load").collect().toSet
    val fixed = AsOfJoin.backward(fm, load, "time", "time",
      valueCols = Seq(("load", "load")),
      bucketWidthMicros = 15L * 60 * 1000000) // 15-min epoch grid
    assert(fixed.select($"time", $"mw", $"load").collect().toSet === adaptive)
    // plan construction itself must not run the min/max bounds job: count
    // jobs triggered while only BUILDING the plan (an action runs >=1)
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    AsOfJoin.backward(fm, load, "time", "time",
      valueCols = Seq(("load", "load")),
      bucketWidthMicros = 15L * 60 * 1000000).queryExecution.executedPlan
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after === before, "fixed-grid backward ran a job during planning")
  }

  // ---- auto() strategy selection (the production default) ----

  private val keyedL = Seq((1, ts("2024-05-01 00:10:00"), "a"),
    (2, ts("2024-05-01 00:20:00"), "b")).toDF("k", "time", "tag")
  private val keyedR = Seq((1, ts("2024-05-01 00:00:00"), 10.0),
    (2, ts("2024-05-01 00:00:00"), 20.0)).toDF("k", "time", "v")

  test("auto: small right side plans the broadcast pick (zero left shuffles)") {
    val plan = AsOfJoin.auto(keyedL, keyedR, "time", "time",
      by = Seq(("k", "k")), valueCols = Seq(("v", "v")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
    assert(!plan.contains("AsOfMergeJoin"))
  }

  test("auto: keyed right side over the threshold plans AsOfMergeJoinExec") {
    val df = AsOfJoin.auto(keyedL, keyedR, "time", "time",
      by = Seq(("k", "k")), valueCols = Seq(("v", "v")),
      broadcastThreshold = 0L)
    assert(df.queryExecution.executedPlan.toString.contains("AsOfMergeJoin"))
    assert(df.orderBy("k").select("k", "v").as[(Int, Double)].collect()
      .toSeq === Seq((1, 10.0), (2, 20.0)))
  }

  test("auto: keyless big right falls back to the bucketed composition") {
    val plan = AsOfJoin.auto(fm, load, "time", "time",
      valueCols = Seq(("load", "load")), broadcastThreshold = 0L)
      .queryExecution.executedPlan.toString
    // not the single-partition merge degeneration, not a broadcast pick
    assert(!plan.contains("AsOfMergeJoin"))
    assert(plan.contains("Window")) // the bucketed window composition
  }

  test("forward as-of: earliest right at-or-after, exact match included") {
    // naive forward spec over the same frames
    val want = fm.as[(Timestamp, Double)].collect().map { case (lt, mw) =>
      val m = load.as[(Timestamp, Double)].collect()
        .filter(_._1.compareTo(lt) >= 0).sortBy(_._1.getTime)
        .headOption.map(_._2)
      (lt, mw, m)
    }.sortBy(_._1.getTime).toSeq
    val got = AsOfJoin.forward(fm, load, "time", "time",
      valueCols = Seq(("load", "next_load")), numBuckets = 2)
      .select($"time", $"mw", $"next_load")
      .as[(Timestamp, Double, Option[Double])]
      .collect().sortBy(_._1.getTime).toSeq
    assert(got === want)
    // sanity on the interesting rows: exact match takes the 01:00 right
    // row; a left after the last right is unmatched
    val byTime = got.map(r => r._1 -> r._3).toMap
    assert(byTime(ts("2024-05-01 01:00:00")) === Some(45000.0))
    assert(byTime(ts("2024-05-01 00:05:00")) === Some(45000.0))
    assert(byTime(ts("2024-04-30 23:00:00")) === Some(42000.0))
  }

  test("forwardMerge == forward composition; big keyed right plans the exec") {
    val l = Seq((1L, ts("2024-05-01 00:10:00"), "a"),
      (1L, ts("2024-05-01 00:30:00"), "b"),
      (2L, ts("2024-05-01 00:10:00"), "c")).toDF("k", "time", "tag")
    val r = Seq((1L, ts("2024-05-01 00:30:00"), 1.0), // exact match for b
      (1L, ts("2024-05-01 00:20:00"), 2.0),
      (2L, ts("2024-05-01 02:00:00"), 3.0)).toDF("k", "time", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"tag", $"v").as[(String, Option[Double])].collect().toSet
    val viaMerge = AsOfJoin.forwardMerge(l, r, "time", "time",
      by = Seq(("k", "k")), valueCols = Seq(("v", "v")))
    val viaComposition = AsOfJoin.forward(l, r, "time", "time",
      by = Seq(("k", "k")), valueCols = Seq(("v", "v")))
    assert(rows(viaMerge) === rows(viaComposition))
    assert(rows(viaMerge) ===
      Set(("a", Some(2.0)), ("b", Some(1.0)), ("c", Some(3.0))))
    assert(viaMerge.queryExecution.executedPlan.toString
      .contains("AsOfMergeJoin"))
    // forward() itself picks the exec once the right side looks big
    val picked = AsOfJoin.forward(l, r, "time", "time",
      by = Seq(("k", "k")), valueCols = Seq(("v", "v")),
      broadcastThreshold = 0L)
    assert(picked.queryExecution.executedPlan.toString
      .contains("AsOfMergeJoin"))
    assert(rows(picked) === rows(viaComposition))
  }

  test("nearest as-of: closer side wins, ties prefer backward") {
    val l = Seq(
      (ts("2024-05-01 00:20:00"), "closer-back"),  // 5 min back vs 40 fwd
      (ts("2024-05-01 00:45:00"), "closer-fwd"),   // 30 back vs 15 fwd
      (ts("2024-05-01 00:37:30"), "tie"),          // 22.5 both -> backward
      (ts("2024-04-01 00:00:00"), "only-fwd"),     // before all rights
      (ts("2024-06-01 00:00:00"), "only-back")     // after all rights
    ).toDF("time", "tag")
    val r = Seq(
      (ts("2024-05-01 00:15:00"), 1.0),
      (ts("2024-05-01 01:00:00"), 2.0)
    ).toDF("time", "v")
    val got = AsOfJoin.nearest(l, r, "time", "time",
      valueCols = Seq(("v", "v")), numBuckets = 2)
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap
    assert(got === Map(
      "closer-back" -> Some(1.0), "closer-fwd" -> Some(2.0),
      "tie" -> Some(1.0), "only-fwd" -> Some(1.0), "only-back" -> Some(2.0)))
    // inner keeps all here (every row matched one side)
    assert(AsOfJoin.nearest(l, r, "time", "time",
      valueCols = Seq(("v", "v")), inner = true).count() === 5)
  }

  test("forward as-of: keyed, inner drops rows with no later right") {
    val l = Seq((1L, ts("2024-05-01 03:00:00"), "late"),
      (1L, ts("2024-05-01 00:10:00"), "early"),
      (2L, ts("2024-05-01 00:10:00"), "other-key")).toDF("k", "time", "tag")
    val r = Seq((1L, ts("2024-05-01 00:30:00"), 7.0)).toDF("k", "time", "v")
    val got = AsOfJoin.forward(l, r, "time", "time",
      by = Seq(("k", "k")), valueCols = Seq(("v", "v")), inner = true)
      .select($"tag", $"v").as[(String, Double)].collect().toSet
    assert(got === Set(("early", 7.0)))
  }

  test("backwardTolerant: pandas tolerance semantics — inclusive gap, " +
    "exact match qualifies, stale match nulls, inner drops") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-05-01 00:$m%02d:00")
    val l = Seq((1L, "k", ts(10)), (2L, "k", ts(15)), (3L, "k", ts(30)),
      (4L, "k", ts(5)), (5L, "z", ts(10)))
      .toDF("id", "k", "time")
    val r = Seq(("k", ts(5), 50.0), ("k", ts(10), 100.0))
      .toDF("rk", "rtime", "v")
    val out = AsOfJoin.backwardTolerant(l, r, "time", "rtime",
      by = Seq(("k", "rk")), valueCols = Seq(("v", "v")),
      toleranceMicros = 5L * 60 * 1000000) // 5 minutes
      .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(100.0)) // exact match (gap 0)
    assert(out(2L) === Some(100.0)) // gap == tolerance: inclusive
    assert(out(3L) === None)        // latest match 20 min stale
    assert(out(4L) === Some(50.0))  // exact at the earlier anchor
    assert(out(5L) === None)        // no right key at all
    val inner = AsOfJoin.backwardTolerant(l, r, "time", "rtime",
      by = Seq(("k", "rk")), valueCols = Seq(("v", "v")),
      toleranceMicros = 5L * 60 * 1000000, inner = true)
      .select($"id").as[Long].collect().toSet
    assert(inner === Set(1L, 2L, 4L))
  }

  test("forwardTolerant: the mirrored gap — next match within the " +
    "window, too-far-ahead nulls") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-05-01 00:$m%02d:00")
    val l = Seq((1L, "k", ts(5)), (2L, "k", ts(10)), (3L, "k", ts(40)))
      .toDF("id", "k", "time")
    val r = Seq(("k", ts(10), 100.0), ("k", ts(60), 600.0))
      .toDF("rk", "rtime", "v")
    val out = AsOfJoin.forwardTolerant(l, r, "time", "rtime",
      by = Seq(("k", "rk")), valueCols = Seq(("v", "v")),
      toleranceMicros = 5L * 60 * 1000000)
      .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(100.0)) // 5 min ahead == tolerance
    assert(out(2L) === Some(100.0)) // exact
    assert(out(3L) === None)        // next match 20 min ahead
  }
}
