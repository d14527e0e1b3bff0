package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Dedicated sort-merge as-of operator (AsOfJoinNode / AsOfMergeJoinExec):
  * semantic equivalence with the composition form, plus plan-shape
  * guarantees (one exchange per side, no windows, no broadcast).
  */
class AsOfMergeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val l = Seq(
    ("a", ts("2024-05-01 01:30:00"), 1.0),
    ("a", ts("2024-05-01 00:30:00"), 2.0),
    ("b", ts("2024-05-01 01:30:00"), 3.0),
    ("c", ts("2024-05-01 01:30:00"), 4.0), // key absent on right
    ("a", ts("2024-04-30 00:00:00"), 5.0)  // before any right row
  ).toDF("k", "time", "x")

  private val r = Seq(
    ("a", ts("2024-05-01 00:00:00"), 10.0),
    ("a", ts("2024-05-01 01:00:00"), 11.0),
    ("a", ts("2024-05-01 02:00:00"), 12.0),
    ("b", ts("2024-05-01 01:30:00"), 20.0) // exact match
  ).toDF("kk", "time", "v")

  test("merge equals backward on keyed inputs (outer and inner)") {
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"x", $"v").collect()
        .map(row => (row.getString(0), row.getDouble(1),
          Option(row.get(2)).map(_.asInstanceOf[Double])))
        .sortBy(t => (t._1, t._2))
    for (inner <- Seq(false, true)) {
      val m = collect(AsOfJoin.merge(l, r, "time", "time",
        by = Seq(("k", "kk")), valueCols = Seq(("v", "v")), inner = inner))
      val b = collect(AsOfJoin.backward(l, r, "time", "time",
        by = Seq(("k", "kk")), valueCols = Seq(("v", "v")), inner = inner))
      assert(m === b, s"inner=$inner")
    }
    // spot-check semantics directly
    val got = AsOfJoin.merge(l, r, "time", "time",
      by = Seq(("k", "kk")), valueCols = Seq(("v", "v")))
      .select($"x", $"v").collect()
      .map(row => row.getDouble(0) ->
        Option(row.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got === Map(1.0 -> Some(11.0), 2.0 -> Some(10.0),
      3.0 -> Some(20.0), 4.0 -> None, 5.0 -> None))
  }

  test("merge matches backward on random data (property)") {
    val rnd = new scala.util.Random(7)
    val keys = Seq("a", "b", "c", "d")
    def randRows(n: Int) = (0 until n).map { i =>
      (keys(rnd.nextInt(keys.size)),
        new Timestamp(1714521600000L + rnd.nextInt(100000) * 1000L),
        i.toDouble)
    }
    val lf = randRows(300).toDF("k", "time", "x")
    // unique (key, time) right side => deterministic match values
    val rf = randRows(200).toDF("kk", "time", "v")
      .groupBy("kk", "time").agg(max("v").as("v"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"time", $"x", $"v").collect()
        .map(row => (row.getString(0), row.getTimestamp(1), row.getDouble(2),
          Option(row.get(3)).map(_.asInstanceOf[Double])))
        .sortBy(t => (t._1, t._2.getTime, t._3))
    val m = norm(AsOfJoin.merge(lf, rf, "time", "time",
      by = Seq(("k", "kk")), valueCols = Seq(("v", "v"))))
    val b = norm(AsOfJoin.backward(lf, rf, "time", "time",
      by = Seq(("k", "kk")), valueCols = Seq(("v", "v"))))
    assert(m === b)
  }

  test("matched row's null value stays null; all cols from one row") {
    val lf = Seq(("a", ts("2024-05-01 01:30:00"), 1.0)).toDF("k", "time", "x")
    val rf = Seq(
      ("a", ts("2024-05-01 00:00:00"), Option(1.0), Option(10.0)),
      ("a", ts("2024-05-01 01:00:00"), Option.empty[Double], Option(20.0))
    ).toDF("kk", "time", "v1", "v2")
    val row = AsOfJoin.merge(lf, rf, "time", "time",
      by = Seq(("k", "kk")), valueCols = Seq(("v1", "v1"), ("v2", "v2")),
      inner = true)
      .select($"v1", $"v2").head
    assert(row.isNullAt(0) && row.getDouble(1) === 20.0)
  }

  test("null left times never match; null right times are skipped") {
    val lf = Seq(("a", Option(ts("2024-05-01 01:00:00")), 1.0),
      ("a", Option.empty[Timestamp], 2.0)).toDF("k", "time", "x")
    val rf = Seq(("a", Option(ts("2024-05-01 00:00:00")), 10.0),
      ("a", Option.empty[Timestamp], 99.0)).toDF("kk", "time", "v")
    val got = AsOfJoin.merge(lf, rf, "time", "time",
      by = Seq(("k", "kk")), valueCols = Seq(("v", "v")))
      .select($"x", $"v").collect()
      .map(row => row.getDouble(0) ->
        Option(row.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got === Map(1.0 -> Some(10.0), 2.0 -> None))
  }

  test("physical plan: one exchange per side, no window, no broadcast") {
    val df = AsOfJoin.merge(l, r, "time", "time",
      by = Seq(("k", "kk")), valueCols = Seq(("v", "v")))
    df.collect() // materialize so AQE finalizes the plan
    // AQE's toString prints the plan twice (Final + Initial) — count only
    // the final section
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("AsOfMergeJoin"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 2, s"want exactly 2 exchanges:\n$plan")
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("BroadcastExchange"), plan)
  }

  test("empty right keeps left rows (outer) / drops them (inner)") {
    val outer = AsOfJoin.merge(l, r.limit(0), "time", "time",
      by = Seq(("k", "kk")), valueCols = Seq(("v", "v")))
    assert(outer.count() === 5)
    assert(outer.where($"v".isNotNull).count() === 0)
    val inner = AsOfJoin.merge(l, r.limit(0), "time", "time",
      by = Seq(("k", "kk")), valueCols = Seq(("v", "v")), inner = true)
    assert(inner.count() === 0)
  }

  test("merge: self as-of join needs no caller-side aliasing, " +
      "plan still one exchange+sort per side") {
    // both sides are literally the same DataFrame — shared attribute ids
    val df = AsOfJoin.merge(l, l, "time", "time",
      by = Seq(("k", "k")), valueCols = Seq(("x", "prev_x")))
    // exact matches are allowed, so each row at least matches itself
    val got = df.select($"x", $"prev_x").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // ("a", 01:30) has earlier sibling rows but the LATEST <= is itself;
    // every row's backward-nearest is itself (unique times per key here)
    assert(got === Map(1.0 -> 1.0, 2.0 -> 2.0, 3.0 -> 3.0,
      4.0 -> 4.0, 5.0 -> 5.0))
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("AsOfMergeJoin"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 2, s"want exactly 2 exchanges:\n$plan")
    // and equivalence with the composition on a self-join
    val b = AsOfJoin.backward(l, l, "time", "time",
      by = Seq(("k", "k")), valueCols = Seq(("x", "prev_x")))
      .select($"x", $"prev_x").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(b === got)
  }

  test("LongType ordering columns are raw micros in EVERY strategy — " +
      "size-based routing can never flip semantics") {
    // 2024-scale epoch micros (~1.7e15): interpreting them as SECONDS
    // overflows the timestamp range, so any strategy that still casts
    // produces garbage and this spec catches it
    val base = 1714521600000000L // 2024-05-01 00:00:00 UTC in micros
    val ll = l.select($"k", (lit(base) + (col("x") * 1000000L).cast("long"))
      .as("t_us"), $"x")
    val rr = r.select($"kk", (lit(base) + (col("v") * 100000L).cast("long"))
      .as("t_us"), $"v")
    def m(d: org.apache.spark.sql.DataFrame) =
      d.select($"x", $"v").collect()
        .map(row => row.getDouble(0) ->
          Option(row.get(1)).map(_.asInstanceOf[Double])).toMap
    val keyed = Seq(("k", "kk"))
    val viaMerge = m(AsOfJoin.merge(ll, rr, "t_us", "t_us", keyed,
      Seq(("v", "v"))))
    val viaBackward = m(AsOfJoin.backward(ll, rr, "t_us", "t_us", keyed,
      Seq(("v", "v"))))
    val viaBroadcast = m(AsOfJoin.broadcastBackward(ll, rr, "t_us", "t_us",
      keyed, Seq(("v", "v"))))
    val viaAutoSmall = m(AsOfJoin.auto(ll, rr, "t_us", "t_us", keyed,
      Seq(("v", "v")), broadcastThreshold = Long.MaxValue))
    val viaAutoBig = m(AsOfJoin.auto(ll, rr, "t_us", "t_us", keyed,
      Seq(("v", "v")), broadcastThreshold = 0))
    assert(viaBackward === viaMerge, "backward vs merge")
    assert(viaBroadcast === viaMerge, "broadcastBackward vs merge")
    assert(viaAutoSmall === viaMerge, "auto(broadcast) vs merge")
    assert(viaAutoBig === viaMerge, "auto(merge) vs merge")
    // keyless: broadcast vs bucketed composition agree too
    val klBroadcast = m(AsOfJoin.broadcastBackward(ll, rr, "t_us", "t_us",
      Nil, Seq(("v", "v"))))
    val klBackward = m(AsOfJoin.backward(ll, rr, "t_us", "t_us",
      Nil, Seq(("v", "v"))))
    assert(klBroadcast === klBackward, "keyless broadcast vs bucketed")
    // forward on the same raw axis: merge path vs composition path
    val fMerge = m(AsOfJoin.forwardMerge(ll, rr, "t_us", "t_us", keyed,
      Seq(("v", "v"))))
    val fComp = m(AsOfJoin.forward(ll, rr, "t_us", "t_us", keyed,
      Seq(("v", "v")), broadcastThreshold = Long.MaxValue))
    assert(fMerge === fComp, "forwardMerge vs forward composition")
  }

  test("merge: keyless call routes to the bucketed composition " +
      "(>1 partition, no single-partition exec)") {
    val df = AsOfJoin.merge(l, r, "time", "time",
      by = Nil, valueCols = Seq(("v", "v")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("AsOfMergeJoin"),
      s"keyless must not plan the AllTuples exec:\n$plan")
    // same answer as the explicit composition and the broadcast form
    def m(d: org.apache.spark.sql.DataFrame) =
      d.select($"x", $"v").collect()
        .map(row => row.getDouble(0) ->
          Option(row.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(m(df) === m(AsOfJoin.backward(l, r, "time", "time",
      Nil, Seq(("v", "v")))))
    assert(m(df) === m(AsOfJoin.broadcastBackward(l, r, "time", "time",
      Nil, Seq(("v", "v")))))
    // the composition spreads keyless work over the bucket grid: the
    // main window exchange hashes on the bucket column (AQE may coalesce
    // tiny test data afterwards, so assert the plan, not the runtime
    // partition count — the spine's single-partition window is the
    // O(buckets) carry frame, not the fact path)
    assert(plan.contains("hashpartitioning(__b"),
      s"keyless merge must exchange on the time-bucket column:\n$plan")
  }
}
