package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, AsOfJoin}
import graft.sources.LakeReader

class IncrementalSpec extends SparkTestBase {
  import spark.implicits._

  test("incremental rollup over batches equals full re-aggregation") {
    val all = spark.read.parquet(s"$sf/orders.parquet")
    val b1 = all.where($"o_orderkey" % 3 === 0)
    val b2 = all.where($"o_orderkey" % 3 === 1)
    val b3 = all.where($"o_orderkey" % 3 === 2)
    val keys = Seq("o_orderstatus")
    val measures = Map("o_totalprice" -> "sum_price")

    val full = Analytics.rollupBatch(all, keys, measures)
      .orderBy("o_orderstatus").collect().toSeq
    val incremental = Seq(b2, b3).foldLeft(
      Analytics.rollupBatch(b1, keys, measures)) { (acc, b) =>
      Analytics.mergeRollup(acc, Analytics.rollupBatch(b, keys, measures),
        keys, Seq("sum_price"))
    }.orderBy("o_orderstatus").collect().toSeq
    assert(incremental === full) // exact decimal sums => bit-equal merge
  }

  test("exactStats agrees with built-in corr/stddev_samp to 1e-9") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val got = Analytics.exactStats(li, "l_quantity", "l_extendedprice").head
    val ref = li.agg(
      stddev_samp($"l_quantity"), stddev_samp($"l_extendedprice"),
      corr($"l_quantity", $"l_extendedprice")).head
    assert(got.getLong(0) === li.count())
    assert(math.abs(got.getDouble(1) - ref.getDouble(0)) < 1e-9)
    assert(math.abs(got.getDouble(2) - ref.getDouble(1)) < 1e-6)
    assert(math.abs(got.getDouble(3) - ref.getDouble(2)) < 1e-9)
    // determinism: same value regardless of partitioning
    val repart = Analytics.exactStats(li.repartition(13), "l_quantity",
      "l_extendedprice").head
    assert(repart.getDouble(3) === got.getDouble(3))
  }

  test("AsOfJoin.auto picks broadcast for small right, distributed for big") {
    val left = LakeReader.table(spark, sf, "events")
    val small = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_totalprice").as("p"))
    val picked = AsOfJoin.auto(left, small, "ts", "o_orderdate",
      by = Seq(("user_id", "o_custkey")), valueCols = Seq(("p", "p")))
    assert(picked.queryExecution.executedPlan.toString.contains("graft_asof_pick"),
      "small right side should take the broadcast path")
    val forced = AsOfJoin.auto(left, small, "ts", "o_orderdate",
      by = Seq(("user_id", "o_custkey")), valueCols = Seq(("p", "p")),
      broadcastThreshold = 0)
    val forcedPlan = forced.queryExecution.executedPlan.toString
    assert(!forcedPlan.contains("graft_asof_pick"),
      "zero threshold should take the distributed path")
    assert(forcedPlan.contains("AsOfMergeJoin"),
      "keyed big-right should plan the dedicated sort-merge operator")
    // both paths agree
    val a = picked.select($"event_id", $"p").collect().map(r => (r.getLong(0), r.get(1))).sortBy(_._1).toSeq
    val b = forced.select($"event_id", $"p").collect().map(r => (r.getLong(0), r.get(1))).sortBy(_._1).toSeq
    assert(a === b)
  }

  test("sessionize: gap strictly greater than the threshold starts a new " +
      "session; exact-gap continues; ids are per-key running ints") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("u1", 1L, ts("2024-05-01 00:00:00")),
      ("u1", 2L, ts("2024-05-01 00:30:00")), // exactly 30min -> same session
      ("u1", 3L, ts("2024-05-01 01:00:01")), // 30min+1s -> new session
      ("u1", 4L, ts("2024-05-01 01:10:00")),
      ("u2", 5L, ts("2024-05-01 00:00:00"))  // other key: own numbering
    ).toDF("user", "id", "ts")
    val got = Analytics.sessionize(df, Seq("user"), "ts",
      gapMicros = 1800L * 1000000, tieBreak = Seq("id"))
      .orderBy("id").select($"id", $"session_id")
      .as[(Long, Int)].collect().toSeq
    assert(got === Seq(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 1))
  }

  test("trailingRangeStats: closed time frame, peer-inclusive on ties, " +
      "stable mean") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("u1", 1L, ts("2024-05-01 00:00:00"), 1.0),
      ("u1", 2L, ts("2024-05-01 00:40:00"), 3.0),
      ("u1", 3L, ts("2024-05-01 01:00:00"), 5.0), // frame: all three
      ("u1", 4L, ts("2024-05-01 01:00:00"), 7.0), // peer of id=3: same frame
      ("u1", 5L, ts("2024-05-01 02:30:00"), 9.0)  // everything aged out
    ).toDF("user", "id", "ts", "v")
    val got = Analytics.trailingRangeStats(df, Seq("user"), "ts", "v",
      rangeMicros = 3600000000L)
      .orderBy("id").select($"id", $"n", $"avg")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 1.0),
      (2L, 2L, 2.0),
      (3L, 4L, 4.0), // RANGE frame includes the 01:00 peer both ways
      (4L, 4L, 4.0),
      (5L, 1L, 9.0)))
  }

  test("z-order dims: modDim buckets ids, timeBucketDim floors to the " +
      "grid, zOrderValue interleaves") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq((1025L, ts("1970-01-01 02:59:59")),
      (7L, ts("1970-01-01 03:00:00"))).toDF("uid", "ts")
    val got = df.select(
      Analytics.modDim($"uid", 1024),
      Analytics.timeBucketDim($"ts", 3600000000L, 1024),
      Analytics.zOrderValue(Seq(lit(1L), lit(2L)), 2))
      .as[(Long, Long, Long)].collect().toSeq
    // 1025 % 1024 = 1; 02:59:59 is hour-bucket 2, 03:00:00 is bucket 3
    assert(got.map(r => (r._1, r._2)) === Seq((1L, 2L), (7L, 3L)))
    // interleave(x=1(01), y=2(10)) bits: y1 x1 y0 x0 = 1 0 0 1 = 9
    assert(got.head._3 === 9L)
    // FLOOR semantics for pre-epoch instants: 23:30 the day before is
    // hour-quotient -1 (not truncated to 0, which would merge the hour
    // before the epoch with the hour after into one double-width
    // bucket), and pmod maps it into the z-dim contract range
    // [0, buckets): -1 mod 1024 = 1023 — never a negative value that
    // ZValue's `& mask` would silently wrap
    val pre = Seq(Tuple1(ts("1969-12-31 23:30:00"))).toDF("ts")
      .select(Analytics.timeBucketDim($"ts", 3600000000L, 1024))
      .as[Long].head()
    assert(pre === 1023L, s"pre-epoch bucket must floor then pmod, got $pre")
    // negative ids: modDim is pmod too
    val negId = Seq(Tuple1(-1L)).toDF("uid")
      .select(Analytics.modDim($"uid", 1024)).as[Long].head()
    assert(negId === 1023L, s"negative id must pmod into range, got $negId")
  }

  test("gapFill: hourly grid, cell max-downsample, forward fill") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val obs = Seq(
      ("a", ts("2024-05-01 00:00:00"), 1.0),
      ("a", ts("2024-05-01 00:10:00"), 5.0), // same cell -> max 5.0
      ("a", ts("2024-05-01 03:30:00"), 2.0), // two empty cells between
      ("b", ts("2024-05-01 10:00:00"), 9.0)  // single-obs key: 1 cell
    ).toDF("k", "ts", "v")
    val got = Analytics.gapFill(obs, Seq("k"), "ts", "v", 3600000000L)
      .orderBy("k", "gts")
      .as[(String, java.sql.Timestamp, Double)].collect().toSeq
    assert(got === Seq(
      ("a", ts("2024-05-01 00:00:00"), 5.0),
      ("a", ts("2024-05-01 01:00:00"), 5.0), // filled
      ("a", ts("2024-05-01 02:00:00"), 5.0), // filled
      ("a", ts("2024-05-01 03:00:00"), 2.0), // 03:30 obs lands here
      ("b", ts("2024-05-01 10:00:00"), 9.0)))
    // leading cells can never be null: grid starts at the first obs
    assert(!got.exists(_._3.isNaN))
  }

  test("resampleLinear: interior gaps interpolate, edges fill from the " +
      "one existing neighbor") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val obs = Seq(
      ("a", ts("2024-05-01 00:00:00"), 1.0),
      ("a", ts("2024-05-01 03:00:00"), 7.0), // 2-cell gap: 3.0, 5.0
      ("b", ts("2024-05-01 10:00:00"), 9.0)
    ).toDF("k", "ts", "v")
    val got = Analytics.resampleLinear(obs, Seq("k"), "ts", "v",
      3600000000L)
      .orderBy("k", "gts")
      .as[(String, java.sql.Timestamp, Double)].collect().toSeq
    assert(got === Seq(
      ("a", ts("2024-05-01 00:00:00"), 1.0),
      ("a", ts("2024-05-01 01:00:00"), 3.0), // 1 + (7-1) * 1/3
      ("a", ts("2024-05-01 02:00:00"), 5.0), // 1 + (7-1) * 2/3
      ("a", ts("2024-05-01 03:00:00"), 7.0),
      ("b", ts("2024-05-01 10:00:00"), 9.0)))
  }

  test("HLL sketches merge losslessly: union of parts == sketch of whole") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val whole = ev.agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))"))
      .head.getLong(0)
    val merged = ev.groupBy(expr("user_id % 7").as("part"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .head.getLong(0)
    assert(merged === whole,
      "merging per-partition sketches must equal sketching the whole")
    val exact = ev.select(countDistinct($"user_id")).head.getLong(0)
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"estimate $merged too far from exact $exact")
  }

  test("quantile sketches: union of parts == sketch of whole at tiny " +
      "eps, and coarse-eps rank error is certified") {
    val ev = LakeReader.table(spark, sf, "events").select($"user_id", $"value")
    val ps = Seq(0.1, 0.5, 0.95, 0.99)
    def estimates(df: org.apache.spark.sql.DataFrame, eps: String) = {
      val whole = df.agg(expr(s"graft_quantile_sketch(value, $eps)").as("sk"))
      ps.map(p => whole.select(
        expr(s"graft_quantile_estimate(sk, ${p}d)")).head.getDouble(0))
    }
    // tiny eps: 2*eps*n < 1 => compression can never merge samples, so
    // the whole-sketch and the merged per-part sketches retain every
    // value and answer IDENTICALLY
    val whole = estimates(ev, "0.0000001d")
    val parts = ev.groupBy(expr("user_id % 7").as("part"))
      .agg(expr("graft_quantile_sketch(value, 0.0000001d)").as("sk"))
      .agg(expr("graft_quantile_merge(sk)").as("sk"))
    val merged = ps.map(p => parts.select(
      expr(s"graft_quantile_estimate(sk, ${p}d)")).head.getDouble(0))
    assert(merged === whole,
      "lossless-regime merge must equal sketching the whole")
    // certified rank error at a coarse eps: the estimate is a real data
    // value whose exact rank is within eps*n (+1 slack for boundary
    // conventions) of the target rank
    val sorted = ev.select($"value").as[Double].collect().sorted
    val n = sorted.length
    val coarse = estimates(ev, "0.01d")
    ps.zip(coarse).foreach { case (p, est) =>
      val lo = sorted.indexWhere(_ >= est) // first rank holding est
      val hi = sorted.lastIndexWhere(_ <= est) + 1
      val target = p * n
      assert(lo <= target + 0.01 * n + 1 && hi >= target - 0.01 * n - 1,
        s"p=$p estimate $est rank window [$lo,$hi] misses target $target")
    }
    // null sketch column (empty merge group) stays null
    val empty = ev.limit(0)
      .agg(expr("graft_quantile_merge(CAST(NULL AS BINARY))").as("sk"))
      .select(expr("graft_quantile_estimate(sk, 0.5d)"))
    assert(empty.head.isNullAt(0))
    // SQL ergonomics: decimal eps/p literals (the natural spellings)
    // coerce instead of crashing, and decimal VALUE columns sketch
    val dec = ev.selectExpr("CAST(value AS DECIMAL(18,6)) AS value")
      .agg(expr("graft_quantile_sketch(value, 0.01)").as("sk"))
      .select(expr("graft_quantile_estimate(sk, 0.5)")).head.getDouble(0)
    assert(!dec.isNaN)
    // mixed-eps sketches refuse to union (incompatible error bounds)
    val err = intercept[Exception] {
      val s1 = ev.agg(expr("graft_quantile_sketch(value, 0.01d)").as("sk"))
      val s2 = ev.agg(expr("graft_quantile_sketch(value, 0.001d)").as("sk"))
      s1.unionAll(s2)
        .agg(expr("graft_quantile_estimate(graft_quantile_merge(sk), 0.5d)"))
        .head()
    }
    assert(err.getMessage.contains("relativeError") ||
      Option(err.getCause).exists(_.getMessage.contains("relativeError")))
    // out-of-range p fails with the function's own message
    val bad = intercept[Exception] {
      ev.agg(expr("graft_quantile_sketch(value, 0.01d)").as("sk"))
        .select(expr("graft_quantile_estimate(sk, 1.5d)")).head()
    }
    assert(bad.getMessage.contains("quantile must be in [0, 1]") ||
      Option(bad.getCause).exists(
        _.getMessage.contains("quantile must be in [0, 1]")))
  }
}
