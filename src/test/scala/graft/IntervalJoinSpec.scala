package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, IntervalJoin}

class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val weather = Seq(
    ("LZ_WEST", ts("2024-05-01 00:15:00"), 75.2), // == interval start (inclusive)
    ("LZ_WEST", ts("2024-05-01 00:30:00"), 75.4), // == interval end (inclusive)
    ("LZ_WEST", ts("2024-05-01 00:31:00"), 75.5), // inside second interval
    ("LZ_WEST", ts("2024-05-01 00:14:59"), 75.0), // before all intervals
    ("LZ_SOUTH", ts("2024-05-01 00:20:00"), 80.1) // zone with no intervals
  ).toDF("location", "w_ts", "temp")

  private val prices = Seq(
    ("LZ_WEST", ts("2024-05-01 00:15:00"), ts("2024-05-01 00:30:00"), 21.5),
    ("LZ_WEST", ts("2024-05-01 00:30:01"), ts("2024-05-01 00:45:00"), 22.0)
  ).toDF("location", "start", "end", "spp")

  test("closed-interval bounds are inclusive on both ends (J1, F7)") {
    val j = IntervalJoin.pointInInterval(weather, prices,
      weather("w_ts"), prices("start"), prices("end"),
      Seq((weather("location"), prices("location"))))
    val got = j.select($"w_ts", $"spp").collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1))).toMap
    assert(got === Map(
      ts("2024-05-01 00:15:00") -> 21.5,
      ts("2024-05-01 00:30:00") -> 21.5,
      ts("2024-05-01 00:31:00") -> 22.0))
  }

  test("equi key is extracted — no nested-loop plan (§7.4.5)") {
    val j = IntervalJoin.pointInInterval(weather, prices,
      weather("w_ts"), prices("start"), prices("end"),
      Seq((weather("location"), prices("location"))))
    IntervalJoin.assertNoNestedLoop(j)
  }

  test("bucketed keyless variant equals plain theta join") {
    val plain = IntervalJoin.pointInInterval(weather, prices,
      weather("w_ts"), prices("start"), prices("end"), Nil)
      .select(weather("w_ts"), prices("spp")).collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1))).sortBy(_._1.getTime)
    val bucketed = IntervalJoin.pointInIntervalBucketed(
      weather, prices.withColumnRenamed("location", "p_location"),
      "w_ts", "start", "end", widthMicros = 60L * 1000000)
      .select($"w_ts", $"spp").collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1))).sortBy(_._1.getTime)
    assert(bucketed === plain)
  }

  test("planted 60%-hot-zone: the auto variant salts the hot key, " +
      "bounds per-reducer group size, output identical") {
    // 100k points, 60% on ONE zone; 1000 one-minute intervals per zone.
    // Join key is (cell, zone): every hot-zone cell lands on the same
    // reducer chain without salting.
    val zones = 20
    val pts = spark.range(100000).select(
      when(col("id") % 10 < 6, lit("HOT"))
        .otherwise(concat(lit("z"), (col("id") % zones).cast("string")))
        .as("zone"),
      timestamp_micros(col("id") % 1000 * 60000000L + 1000000L +
        (col("id") / 1000L).cast("long")).as("p_ts"), // unique micros
      col("id").as("x"))
    val ivs = spark.range(1000).select(
      explode(array((lit("HOT") +: (0 until zones).map(z =>
        lit(s"z$z"))): _*)).as("zone"),
      timestamp_micros(col("id") * 60000000L).as("start"),
      timestamp_micros(col("id") * 60000000L + 59999999L).as("end"),
      col("id").as("price"))
    val plain = IntervalJoin.pointInIntervalBucketed(pts, ivs,
      "p_ts", "start", "end", widthMicros = 60000000L,
      equi = Seq("zone"))
      .select("zone", "x", "price").as[(String, Long, Long)]
      .collect().toSet
    val auto = IntervalJoin.pointInIntervalBucketedAuto(pts, ivs,
      "p_ts", "start", "end", widthMicros = 60000000L,
      equi = Seq("zone"), skewSampleFraction = 0.05, salt = 8)
    assert(auto.select("zone", "x", "price").as[(String, Long, Long)]
      .collect().toSet === plain)
    // the salted hot branch bounds what one reducer group sees: max
    // (cell, zone, salt) group ≤ ~1/salt of the hot cell's points
    // (hash-of-timestamp salting; identical timestamps share a salt,
    // here each point has a distinct micros offset)
    // residues with r%10<6 are fully hot: 100 hot points in each of
    // 600 hot cells
    val hotPerCell = 100L
    val maxSalted = pts.where(col("zone") === "HOT")
      .withColumn("__cell",
        (unix_micros(col("p_ts")) / 60000000L).cast("long"))
      .withColumn("__salt", pmod(hash(col("p_ts")), lit(8)))
      .groupBy("__cell", "__salt").count()
      .agg(max("count")).head().getLong(0)
    assert(maxSalted <= hotPerCell / 8 * 3,
      s"salting failed to spread the hot cell: max group $maxSalted")
    // without a probe (fraction 0) the plan stays the single-join shape
    val off = IntervalJoin.pointInIntervalBucketedAuto(pts, ivs,
      "p_ts", "start", "end", widthMicros = 60000000L,
      equi = Seq("zone"))
    assert(!off.queryExecution.executedPlan.toString.contains("Union"))
  }

  // ---------- interval coverage (gaps and islands) ----------

  private def cov(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long, Long)] =
    Analytics.intervalCoverage(rows.toDF("k", "s", "e"), Seq("k"), "s", "e")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("interval coverage: overlap, touch, nest, and gap closed forms") {
    val r = cov(Seq(
      ("a", 0L, 10L), ("a", 5L, 20L),   // overlap -> [0,20)
      ("a", 20L, 30L),                  // touching merges -> [0,30)
      ("a", 100L, 200L), ("a", 120L, 150L), // nested -> [100,200)
      ("b", 0L, 1L)))
    assert(r("a") === ((2L, 130L, 100L)))
    assert(r("b") === ((1L, 1L, 1L)))
  }

  test("interval coverage: identical intervals and input order do not " +
      "change islands") {
    val rows = Seq(("k", 10L, 20L), ("k", 10L, 20L), ("k", 30L, 40L))
    val want = Map("k" -> ((2L, 20L, 10L)))
    assert(cov(rows) === want)
    assert(cov(rows.reverse) === want)
    val shuffled = Analytics.intervalCoverage(
      rows.toDF("k", "s", "e").repartition(7), Seq("k"), "s", "e")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(shuffled === want)
  }

  test("bandJoin: exact cents boundary inclusive, cross-bucket pairs " +
    "found, negatives handled, plan stays an equi join") {
    // the 9e13 pair sits past 2^53 in cents: a double-division bucket
    // index would round and silently drop it (decimal division holds)
    val a = Seq((1L, 1.00), (2L, 1.04), (3L, -0.03), (4L, 10.00),
      (5L, 90071992547410.00)).toDF("id_a", "va")
    val b = Seq((10L, 1.05), (11L, 0.94), (12L, 0.02), (13L, 10.06),
      (14L, 90071992547410.05)).toDF("id_b", "vb")
    val out = IntervalJoin.bandJoin(a, b, "va", "vb",
      new java.math.BigDecimal("0.05"))
      .select("id_a", "id_b", "diff_cents")
      .as[(Long, Long, Long)].collect().toSet
    // (1.00, 1.05): |Δ|=5 inclusive AND crosses the floor(c/5) bucket
    // boundary (100/5=20, 105/5=21); (-0.03, 0.02): negative left,
    // |Δ|=5, buckets -1 and 0; (10.00, 10.06): |Δ|=6 excluded;
    // (1.00, 0.94): |Δ|=6 excluded; the 9e13 pair survives past 2^53
    assert(out === Set((1L, 10L, 5L), (2L, 10L, 1L), (3L, 12L, 5L),
      (5L, 14L, 5L)))
    // no nested loop: the band join must plan as a hash/sort-merge join
    IntervalJoin.assertNoNestedLoop(
      IntervalJoin.bandJoin(a, b, "va", "vb",
        new java.math.BigDecimal("0.05")))
    ()
  }
}
