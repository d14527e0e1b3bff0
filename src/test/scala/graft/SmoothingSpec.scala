package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** EWMA + autocorrelation (ts3/ts4 family). */
class SmoothingSpec extends SparkTestBase {
  import spark.implicits._

  test("ewma: hand-computed recurrence, alpha = 0.5") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("b", 1L, 4.0)).toDF("k", "ts", "v")
    val out = Analytics.ewma(df, Seq("k"), "ts", "v", alpha = 0.5)
      .orderBy("k", "ts")
      .select("k", "ts", "ewma").as[(String, Long, Double)].collect()
    assert(out === Array(
      ("a", 1L, 10.0), ("a", 2L, 15.0), ("a", 3L, 22.5), ("b", 1L, 4.0)))
  }

  test("ewma: alpha = 1 reproduces the (stabilized) series") {
    val df = Seq(("a", 1L, 1.25), ("a", 2L, 7.5), ("a", 3L, -2.0))
      .toDF("k", "ts", "v")
    val out = Analytics.ewma(df, Seq("k"), "ts", "v", alpha = 1.0)
      .orderBy("ts").select("ewma").as[Double].collect()
    assert(out === Array(1.25, 7.5, -2.0))
  }

  test("ewma: observation contract excludes null ts / null / non-stabilizing") {
    val df = Seq(
      ("a", Option(1L), Option(10.0)),
      ("a", None, Option(99.0)),       // null time: excluded
      ("a", Option(2L), None),          // null measure: excluded
      ("a", Option(3L), Option(Double.NaN)), // does not stabilize
      ("a", Option(4L), Option(20.0))).toDF("k", "ts", "v")
    val out = Analytics.ewma(df, Seq("k"), "ts", "v", alpha = 0.5)
      .orderBy("ts").select("ts", "ewma").as[(Long, Double)].collect()
    assert(out === Array((1L, 10.0), (4L, 15.0)))
  }

  test("ewma: partition-layout independent") {
    val df = spark.range(200).select(
      (col("id") % 7).as("k"), col("id").as("ts"),
      (col("id") * 13 % 101).cast("double").as("v"))
    val a = Analytics.ewma(df, Seq("k"), "ts", "v", 0.25)
      .orderBy("k", "ts").collect()
    val b = Analytics.ewma(df.repartition(11), Seq("k"), "ts", "v", 0.25)
      .orderBy("k", "ts").collect()
    assert(a === b)
  }

  test("ewma: tie-break column makes equal timestamps deterministic") {
    val df = Seq(("a", 1L, 1L, 2.0), ("a", 1L, 2L, 4.0), ("a", 2L, 3L, 8.0))
      .toDF("k", "ts", "eid", "v")
    val out = Analytics.ewma(df, Seq("k"), "ts", "v", 0.5,
      tieBreak = Seq("eid")).orderBy("ts", "eid")
      .select("ewma").as[Double].collect()
    assert(out === Array(2.0, 3.0, 5.5))
  }

  test("autocorrelation: affine series correlates to ~1 at every lag") {
    val df = spark.range(1, 41).select(lit("k").as("k"),
      col("id").as("ts"), col("id").cast("double").as("v"))
    val out = Analytics.autocorrelation(df, Seq("k"), "ts", "v", maxLag = 3)
      .orderBy("lag").select("lag", "n_pairs", "acf")
      .as[(Int, Long, Double)].collect()
    assert(out.map(_._1) === Array(1, 2, 3))
    assert(out.map(_._2) === Array(39L, 38L, 37L))
    out.foreach { case (_, _, r) => assert(math.abs(r - 1.0) < 1e-12) }
  }

  test("autocorrelation: alternating series flips sign by lag parity") {
    val df = spark.range(0, 30).select(lit("k").as("k"), col("id").as("ts"),
      when(col("id") % 2 === 0, 1.0).otherwise(-1.0).as("v"))
    val out = Analytics.autocorrelation(df, Seq("k"), "ts", "v", maxLag = 2)
      .orderBy("lag").select("lag", "acf").as[(Int, Double)].collect()
    assert(math.abs(out(0)._2 + 1.0) < 1e-12, s"lag1 ${out(0)._2}")
    assert(math.abs(out(1)._2 - 1.0) < 1e-12, s"lag2 ${out(1)._2}")
  }

  test("autocorrelation: constant series (zero variance) emits nothing") {
    val df = spark.range(0, 20).select(lit("k").as("k"), col("id").as("ts"),
      lit(5.0).as("v"))
    assert(Analytics.autocorrelation(df, Seq("k"), "ts", "v", 2).count() === 0)
  }

  test("autocorrelation: minPairs gates short lags; keys independent") {
    // key a: length 5 => lag3 has 2 pairs (< 3, dropped)
    val a = (1 to 5).map(i => ("a", i.toLong, i * i % 7 + 0.5))
    val b = (1 to 12).map(i => ("b", i.toLong, (i * 5 % 11).toDouble))
    val df = (a ++ b).toDF("k", "ts", "v")
    val out = Analytics.autocorrelation(df, Seq("k"), "ts", "v", maxLag = 3)
      .select("k", "lag").as[(String, Int)].collect().toSet
    assert(!out.contains(("a", 3)))
    assert(out.contains(("b", 3)))
  }

  test("autocorrelation: partition-layout independent") {
    val df = spark.range(300).select((col("id") % 5).as("k"),
      col("id").as("ts"), (col("id") * 17 % 97).cast("double").as("v"))
    val x = Analytics.autocorrelation(df, Seq("k"), "ts", "v", 4)
      .orderBy("k", "lag").collect()
    val y = Analytics.autocorrelation(df.repartition(13), Seq("k"), "ts",
      "v", 4).orderBy("k", "lag").collect()
    assert(x === y)
  }

  test("twap: hand-computed step weights; last observation only bounds") {
    // key a: 10 for 10s, then 20 for 20s → (100 + 400) / 30 = 16.666667;
    // the value at t=30 (999) holds nothing and must not contribute
    val df = Seq(
      ("a", 0L, 10.0), ("a", 10L, 20.0), ("a", 30L, 999.0),
      ("b", 5L, 7.0) // single observation: no span → excluded
    ).toDF("k", "sec", "v")
      .withColumn("ts", col("sec").cast("timestamp"))
    val out = Analytics.twap(df, Seq("k"), "ts", "v")
      .select("k", "n_segments", "span_us", "twap")
      .as[(String, Long, Long, Double)].collect()
    assert(out === Array(("a", 2L, 30000000L, 16.666667)))
  }

  test("twap: zero-length segments weigh nothing; layout independent") {
    val df = Seq(
      ("a", 1L, 0L, 100.0), // same ts as the next row: dt = 0
      ("a", 2L, 0L, 5.0), ("a", 3L, 10L, 5.0))
      .toDF("k", "id", "sec", "v")
      .withColumn("ts", col("sec").cast("timestamp"))
    val run = (d: org.apache.spark.sql.DataFrame) =>
      Analytics.twap(d, Seq("k"), "ts", "v", tieBreak = Seq("id"))
        .select("k", "twap").as[(String, Double)].collect()
    val out = run(df)
    assert(out === Array(("a", 5.0))) // 100·0 + 5·10 over 10
    assert(run(df.repartition(7)).toSeq === out.toSeq)
  }

  test("ksTest: hand-computed max CDF gap; identical samples give D = 0") {
    // A = {1, 2}, B = {2, 3}: CDFs at 1: (1/2, 0) gap cross-mult
    // |1·2 − 0·2| = 2; at 2: (2/2, 1/2) → |2·2 − 1·2| = 2; at 3:
    // (2/2, 2/2) → 0. d_num = 2, D = 2/4 = 0.5
    val df = Seq(("k", "a", 1.0), ("k", "a", 2.0),
      ("k", "b", 2.0), ("k", "b", 3.0)).toDF("key", "grp", "v")
    val out = Analytics.ksTest(df, Seq("key"), "grp", "a", "b", "v")
      .select("key", "n_a", "n_b", "d_num", "d")
      .as[(String, Long, Long, Long, Double)].head()
    assert(out === (("k", 2L, 2L, 2L, 0.5)))
    // identical samples: every gap zero
    val same = Seq(("k", "a", 5.0), ("k", "b", 5.0)).toDF("key", "grp", "v")
    assert(Analytics.ksTest(same, Seq("key"), "grp", "a", "b", "v")
      .select("d").as[Double].head() === 0.0)
    // disjoint supports: D = 1 (the CDFs separate completely)
    val disj = Seq(("k", "a", 1.0), ("k", "a", 2.0),
      ("k", "b", 9.0)).toDF("key", "grp", "v")
    assert(Analytics.ksTest(disj, Seq("key"), "grp", "a", "b", "v")
      .select("d").as[Double].head() === 1.0)
  }

  test("leaveOneOutInfluence: hand-computed deltas; whole-corpus group excluded") {
    // a: {10, 20} mean 15; b: {40} mean 40; all = 70/3
    // a: rest mean = 40   → influence 15 − 40 = −25
    // b: rest mean = 15   → influence 40 − 15 = +25
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 40.0)).toDF("src", "v")
    val out = Analytics.leaveOneOutInfluence(df, "src", "v")
      .orderBy("src")
      .select("src", "n", "mean_group", "mean_rest", "influence")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out === Array(
      ("a", 2L, 15.0, 40.0, -25.0), ("b", 1L, 40.0, 15.0, 25.0)))
    // a single-group corpus has no "rest": nothing to compare against
    val solo = Analytics.leaveOneOutInfluence(
      Seq(("only", 1.0)).toDF("src", "v"), "src", "v").count()
    assert(solo === 0L)
  }

  test("rankSumTest: hand-computed U with midrank ties; AUC extremes") {
    // key k: A = {1, 3, 3}, B = {2, 3, 5}
    // sorted: 1(A) 2(B) 3 3 3(AAB ties, midrank 4) 5(B)
    // R1 = 1 + 4 + 4 = 9 → r1_x2 = 18; U1 = 9 − 3·4/2 = 3 → u1_x2 = 6
    // AUC = 3 / 9 = 0.3333…
    val df = Seq(
      ("k", "a", 1.0), ("k", "a", 3.0), ("k", "a", 3.0),
      ("k", "b", 2.0), ("k", "b", 3.0), ("k", "b", 5.0),
      // a second key where A dominates completely → AUC = 1
      ("d", "a", 10.0), ("d", "a", 11.0), ("d", "b", 1.0),
      // a group C row must be ignored entirely
      ("k", "c", 100.0)
    ).toDF("key", "grp", "v")
    val out = Analytics.rankSumTest(df, Seq("key"), "grp", "a", "b", "v")
      .orderBy("key")
      .select("key", "n_a", "n_b", "r1_x2", "u1_x2", "auc")
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(out === Array(
      ("d", 2L, 1L, 10L, 4L, 1.0), // R1 = 2+3 = 5, U1 = 5−3 = 2, AUC 2/2
      ("k", 3L, 3L, 18L, 6L, 6.0 / 18.0)))
    // symmetry: swapping the arms complements the AUC
    val sw = Analytics.rankSumTest(df, Seq("key"), "grp", "b", "a", "v")
      .where(col("key") === "k").select("auc").as[Double].head()
    assert(math.abs(sw + 6.0 / 18.0 - 1.0) < 1e-15)
  }

  test("bootstrapMeanCI: degenerate data, interval sanity, determinism") {
    // constant column: every replicate mean is the constant → the
    // interval collapses onto it exactly
    val const = spark.range(200)
      .select(lit("a").as("k"), col("id"), lit(7.0).as("v"))
    val c = Analytics.bootstrapMeanCI(const, Seq("k"), col("id"), "v",
      replicates = 16, kLo = 1, kHi = 15)
      .select("n", "mean", "ci_lo", "ci_hi", "b_used")
      .as[(Long, Double, Double, Double, Long)].head()
    assert(c === ((200L, 7.0, 7.0, 7.0, 16L)))

    // varied data: interval ordered and bracketing the point estimate,
    // all replicates survive, and the result is layout-independent
    val df = spark.range(500).select(
      (col("id") % 2).cast("string").as("k"), col("id"),
      (col("id") % 97).cast("double").as("v"))
    val run = (d: org.apache.spark.sql.DataFrame) =>
      Analytics.bootstrapMeanCI(d, Seq("k"), col("id"), "v",
        replicates = 40, kLo = 1, kHi = 39)
        .orderBy("k")
        .select("k", "n", "mean", "ci_lo", "ci_hi", "b_used")
        .as[(String, Long, Double, Double, Double, Long)].collect()
    val out = run(df)
    assert(out.length === 2)
    out.foreach { case (_, n, mean, lo, hi, b) =>
      assert(n === 250L && b === 40L)
      assert(lo <= hi)
      assert(lo <= mean && mean <= hi,
        s"rank-1/39 interval should bracket the mean: $lo $mean $hi")
      assert(hi - lo > 0, "real variance must give a real interval")
    }
    assert(run(df.repartition(13)).toSeq === out.toSeq)
  }

  test("twapWindowed: exact cross-window segment splitting, hand-checked") {
    // window = 10s. key a: v=10 from t=5 to t=25 (spans w0,w1,w2),
    // then v=40 from t=25 to t=28 (w2 only).
    // w0: 10 for 5s → 10; w1: 10 for 10s → 10;
    // w2: 10 for 5s + 40 for 3s → (50+120)/8 = 21.25
    val df = Seq(("a", 5L, 10.0), ("a", 25L, 40.0), ("a", 28L, 0.0))
      .toDF("k", "sec", "v")
      .withColumn("ts", col("sec").cast("timestamp"))
    val out = Analytics.twapWindowed(df, Seq("k"), "ts", "v",
      windowMicros = 10000000L)
      .orderBy("bucket")
      .select("bucket", "n_segments", "covered_us", "twap")
      .as[(Long, Long, Long, Double)].collect()
    assert(out === Array(
      (0L, 1L, 5000000L, 10.0),
      (1L, 1L, 10000000L, 10.0),
      (2L, 2L, 8000000L, 21.25)))
    // windowed integrals recombine to the global TWAP
    val global = Analytics.twap(df, Seq("k"), "ts", "v")
      .select("twap").as[Double].head()
    val recombined = out.map { case (_, _, c, t) => t * c }.sum /
      out.map(_._3).sum
    // ts5's global twap is round(·,6)-canonicalized; the windowed
    // quotients are raw — agreement to the rounding grain
    assert(math.abs(recombined - global) < 5e-6)
  }

  test("twapWindowed: the fan-out guard raises instead of clipping") {
    val df = Seq(("a", 0L, 1.0), ("a", 1000L, 2.0), ("a", 1001L, 0.0))
      .toDF("k", "sec", "v")
      .withColumn("ts", col("sec").cast("timestamp"))
    // first segment spans 1000s / 1s windows = 1000 > 8 max
    val e = intercept[Exception] {
      Analytics.twapWindowed(df, Seq("k"), "ts", "v",
        windowMicros = 1000000L, maxWindowsPerSegment = 8).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("twapWindowed")))
  }

  test("ohlcBars: open/high/low/close per bucket, hand-checked") {
    val df = Seq(
      // bucket 0 (0..59s): open 3 (earliest), high 9, low 1, close 1
      ("a", 1L, 5L, 3.0), ("a", 2L, 20L, 9.0), ("a", 3L, 40L, 1.0),
      // bucket 1: single row — all four equal
      ("a", 4L, 70L, 6.0),
      // equal timestamps: the id tie-break decides open/close
      ("b", 1L, 10L, 2.0), ("b", 2L, 10L, 8.0)
    ).toDF("k", "id", "sec", "v")
      .withColumn("ts", col("sec").cast("timestamp"))
    val out = Analytics.ohlcBars(df, Seq("k"), "ts", "v",
      bucketMicros = 60000000L, tieBreak = Seq("id"))
      .orderBy("k", "bucket")
      .select("k", "bucket", "open", "high", "low", "close", "n")
      .as[(String, Long, Double, Double, Double, Double, Long)].collect()
    assert(out === Array(
      ("a", 0L, 3.0, 9.0, 1.0, 1.0, 3L),
      ("a", 1L, 6.0, 6.0, 6.0, 6.0, 1L),
      ("b", 0L, 2.0, 8.0, 2.0, 8.0, 2L)))
  }

  test("holt: hand-computed level/trend recurrence, alpha=0.5 beta=0.5") {
    // x = 10, 20, 30:
    //   t1: l=10, b=0
    //   t2: l=.5*20+.5*10=15,   b=.5*(15-10)+.5*0=2.5
    //   t3: l=.5*30+.5*17.5=23.75, b=.5*(23.75-15)+.5*2.5=5.625
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0))
      .toDF("k", "ts", "v")
    val out = Analytics.holt(df, Seq("k"), "ts", "v",
      alpha = 0.5, beta = 0.5)
      .orderBy("ts").select("level", "trend")
      .as[(Double, Double)].collect()
    assert(out === Array((10.0, 0.0), (15.0, 2.5), (23.75, 5.625)))
  }

  test("holt: beta = 0 degenerates to ewma of the measure") {
    val df = Seq(("a", 1L, 4.0), ("a", 2L, 8.0), ("a", 3L, 1.0),
      ("a", 4L, 9.0)).toDF("k", "ts", "v")
    val lv = Analytics.holt(df, Seq("k"), "ts", "v",
      alpha = 0.5, beta = 0.0)
      .orderBy("ts").select("level").as[Double].collect()
    val ew = Analytics.ewma(df, Seq("k"), "ts", "v", alpha = 0.5)
      .orderBy("ts").select("ewma").as[Double].collect()
    assert(lv === ew)
    val tr = Analytics.holt(df, Seq("k"), "ts", "v",
      alpha = 0.5, beta = 0.0)
      .orderBy("ts").select("trend").as[Double].collect()
    assert(tr.forall(_ == 0.0))
  }

  test("mannKendall: monotone series has S = m(m-1)/2 and the " +
    "hand-computed z") {
    val df = (1 to 10).map(i => ("a", i.toLong, i.toLong, i * 2.0))
      .toDF("grp", "id", "tsl", "v")
      .withColumn("ts", col("tsl").cast("timestamp"))
      .withColumn("k", lit(1L))
    val r = Analytics.mannKendall(df, "k", "ts", "v", "id")
      .select("n", "s", "var18", "z")
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 === 10L)
    assert(r._2 === 45L) // all 45 pairs ascending
    assert(r._3 === 10L * 9 * 25) // no ties
    assert(r._4 === 44.0 / math.sqrt(2250.0 / 18.0))
  }

  test("mannKendall: ties reduce var18, constant series pins z = 0") {
    val const = (1 to 6).map(i => (1L, i.toLong, 5.0))
      .toDF("k", "tsl", "v")
      .withColumn("ts", col("tsl").cast("timestamp"))
      .withColumn("id", col("tsl"))
    val rc = Analytics.mannKendall(const, "k", "ts", "v", "id")
      .select("s", "var18", "z").as[(Long, Long, Double)].head()
    assert(rc._1 === 0L)
    assert(rc._2 === 6L * 5 * 17 - 6L * 5 * 17) // one tie group of 6
    assert(rc._3 === 0.0)
    // one tie pair: values 1,1,2 -> S = 2, var18 = 3*2*11 - 2*1*9 = 48
    val tied = Seq((1L, 1L, 1.0), (1L, 2L, 1.0), (1L, 3L, 2.0))
      .toDF("k", "tsl", "v")
      .withColumn("ts", col("tsl").cast("timestamp"))
      .withColumn("id", col("tsl"))
    val rt = Analytics.mannKendall(tied, "k", "ts", "v", "id")
      .select("s", "var18", "z").as[(Long, Long, Double)].head()
    assert(rt._1 === 2L)
    assert(rt._2 === 48L)
    assert(rt._3 === 1.0 / math.sqrt(48.0 / 18.0))
  }

  test("mannKendall: descending series is the negative mirror and " +
    "partition count does not matter") {
    val rows = (1 to 12).map(i => (7L, i.toLong, (13 - i).toDouble))
    def run(parts: Int) = Analytics.mannKendall(
      rows.toDF("k", "tsl", "v")
        .withColumn("ts", col("tsl").cast("timestamp"))
        .withColumn("id", col("tsl")).repartition(parts),
      "k", "ts", "v", "id")
      .select("s", "z").as[(Long, Double)].head()
    val (s1, z1) = run(1)
    val (s7, z7) = run(7)
    assert(s1 === -66L)
    assert(s1 === s7)
    assert(z1 === z7)
    assert(z1 < 0)
  }

  test("holtWinters: hand recurrence with period 2, warm-up rows not " +
      "emitted, short keys dropped, partition invariance") {
    // key 1: x = 10, 20, 14, 26, 18 with m = 2
    // init (t=2): l = 15, b = 0, seas = (-5, 5)
    val xs = Seq(10.0, 20.0, 14.0, 26.0, 18.0)
    val rows = xs.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, i.toLong, v) } ++
      Seq((2L, 0L, 0L, 7.0), (2L, 1L, 1L, 9.0)) // exactly m rows: dropped
    def run(parts: Int) = Analytics.holtWinters(
      rows.toDF("k", "tsl", "id", "v").repartition(parts)
        .withColumn("ts", col("tsl").cast("timestamp")),
      Seq("k"), "ts", "v", alpha = 0.5, beta = 0.25, gamma = 0.5,
      period = 2, tieBreak = Seq("id"))
      .orderBy("k", "ts")
      .select("k", "v", "level", "trend", "seasonal")
      .as[(Long, Double, Double, Double, Double)].collect().toSeq
    val out = run(1)
    assert(out === run(7))
    assert(out.map(_._1).distinct === Seq(1L)) // key 2 has no t > m
    assert(out.size === 3) // t = 3, 4, 5
    // reference fold
    var l = 15.0; var b = 0.0; var seas = Vector(-5.0, 5.0)
    val want = xs.drop(2).map { x =>
      val sm = seas(0)
      val nl = 0.5 * (x - sm) + 0.5 * (l + b)
      val nb = 0.25 * (nl - l) + 0.75 * b
      val ns = 0.5 * (x - nl) + 0.5 * sm
      seas = seas.drop(1) :+ ns; l = nl; b = nb
      (nl, nb, ns)
    }
    out.zip(want).foreach { case (got, (wl, wb, ws)) =>
      assert(got._3 === wl); assert(got._4 === wb); assert(got._5 === ws)
    }
  }

  test("mannKendall: merge-count S is bit-equal to the definitional " +
    "O(m^2) pair scan on random tied sequences") {
    def pairScanS(xs: Array[Double]): Long = {
      var s = 0L
      var i = 0
      while (i < xs.length) {
        var j = i + 1
        while (j < xs.length) {
          val d = xs(j) - xs(i)
          if (d > 0) s += 1 else if (d < 0) s -= 1
          j += 1
        }
        i += 1
      }
      s
    }
    def mergeCountS(xs: Array[Double]): Long = {
      val m = xs.length.toLong
      val tied = xs.groupBy(identity).valuesIterator
        .map { g => val t = g.length.toLong; t * (t - 1) / 2 }.sum
      m * (m - 1) / 2 - tied - 2L * Analytics.strictInversions(xs.clone())
    }
    val rnd = new scala.util.Random(13)
    (0 until 50).foreach { trial =>
      // heavy-tie domain (0..9) half the trials, wide doubles the other
      val n = rnd.nextInt(200)
      val xs = Array.fill(n)(
        if (trial % 2 == 0) rnd.nextInt(10).toDouble
        else rnd.nextDouble() * 100)
      assert(mergeCountS(xs) === pairScanS(xs), s"trial $trial n=$n")
    }
    // degenerate shapes
    assert(mergeCountS(Array.empty[Double]) === 0L)
    assert(mergeCountS(Array(3.0)) === 0L)
    assert(mergeCountS(Array(2.0, 2.0, 2.0)) === 0L)
  }

  test("localPeaks: strict interior maxima only — endpoints, plateaus, " +
      "and valleys never flag; keys independent") {
    val rows = Seq(
      // key a: 1 5 2 7 7 3 9 -> one peak (the 5): the plateau's 7s are
      // not strictly greater than each other, 9 is an endpoint
      ("a", Seq(1.0, 5.0, 2.0, 7.0, 7.0, 3.0, 9.0)),
      ("b", Seq(4.0, 1.0, 6.0, 2.0))).flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case (v, i) => (k, i.toLong, i.toLong, v) }
    }.toDF("k", "event_id", "ts", "value")
    val out = Analytics.localPeaks(rows, Seq("k"), "ts", "value",
      tieBreak = Seq("event_id"))
      .select("k", "event_id", "value", "prev_value", "next_value")
      .as[(String, Long, Double, Double, Double)].collect().toSet
    assert(out === Set(("a", 1L, 5.0, 1.0, 2.0),
      ("b", 2L, 6.0, 1.0, 2.0)))
    // constant series: no peaks
    val const = (0 to 5).map(i => ("c", i.toLong, i.toLong, 2.0))
      .toDF("k", "event_id", "ts", "value")
    assert(Analytics.localPeaks(const, Seq("k"), "ts", "value",
      Seq("event_id")).count() === 0L)
  }

  test("thresholdStreaks: a NULL measurement breaks adjacency — runs " +
      "across a data gap never merge") {
    import graft.operators.Analytics
    // T NULL T: two separate 1-long streaks, never one 2-long streak
    val rows = Seq(("a", 0L, 0L, Some(9.0)), ("a", 1L, 1L, None),
      ("a", 2L, 2L, Some(9.0)))
      .toDF("k", "event_id", "ts", "value")
    val r = Analytics.thresholdStreaks(rows, Seq("k"), "ts",
      col("value") > 5.0, tieBreak = Seq("event_id"))
      .select("n_streaks", "max_streak", "n_above")
      .as[(Long, Long, Long)].head()
    assert(r === ((2L, 1L, 2L)))
  }

  test("thresholdStreaks: hand-computed islands; all-below keys absent; " +
      "single run counted once") {
    import graft.operators.Analytics
    // a: F T T F T T T F -> runs of 2 and 3; b: all true -> one run of 4
    // c: all false -> no row
    val vals = Map(
      "a" -> Seq(1.0, 9.0, 9.0, 1.0, 9.0, 9.0, 9.0, 1.0),
      "b" -> Seq(9.0, 9.0, 9.0, 9.0),
      "c" -> Seq(1.0, 1.0))
    val df = vals.toSeq.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case (v, i) => (k, i.toLong, i.toLong, v) }
    }.toDF("k", "event_id", "ts", "value")
    val out = Analytics.thresholdStreaks(df, Seq("k"), "ts",
      col("value") > 5.0, tieBreak = Seq("event_id"))
      .select("k", "n_streaks", "max_streak", "n_above")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === Map("a" -> ((2L, 3L, 5L)), "b" -> ((1L, 4L, 4L))))
  }

  test("crossCorrelation: a series correlates perfectly with its own " +
      "shift, exactly at the shift lag") {
    val vals = Seq(5.0, 1.0, 8.0, 2.0, 9.0, 3.0, 7.0, 4.0, 6.0, 0.0,
      5.5, 2.5)
    val a = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("idx", "v")
    val b = vals.zipWithIndex.map { case (v, i) => (i.toLong + 3, v) }
      .toDF("idx", "v")
    val out = Analytics.crossCorrelation(a, b, "idx", "v", maxLag = 5)
      .select("lag", "n_pairs", "xcorr")
      .as[(Int, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(3)._2 === 12L && math.abs(out(3)._3 - 1.0) < 1e-12)
    assert(out.keys.forall(l => l >= 0 && l <= 5))
    assert(out.filter(_._1 != 3).values.forall(_._3 < 0.999))
  }

  test("crossCorrelation: negated series gives exactly -1 at lag 0; " +
      "constant side is excluded (zero variance); minPairs prunes " +
      "thin overlaps") {
    val vals = Seq(1.0, 4.0, 2.0, 8.0, 5.0, 7.0)
    val a = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("idx", "v")
    val neg = vals.zipWithIndex.map { case (v, i) => (i.toLong, -v) }
      .toDF("idx", "v")
    val r0 = Analytics.crossCorrelation(a, neg, "idx", "v", maxLag = 0)
      .select("xcorr").as[Double].collect()
    assert(r0.length === 1 && math.abs(r0.head + 1.0) < 1e-12)
    val const = vals.indices.map(i => (i.toLong, 2.0)).toDF("idx", "v")
    assert(Analytics.crossCorrelation(a, const, "idx", "v", maxLag = 0)
      .count() === 0L)
    // overlap at lag 4 is only 2 pairs < minPairs=3
    val short = Analytics.crossCorrelation(a, a, "idx", "v", maxLag = 4)
      .select("lag").as[Int].collect().toSet
    assert(!short.contains(4) && short.contains(0))
  }

  test("crossCorrelation: sparse indices pair only where both exist " +
      "and the result is repartition-invariant") {
    val a = Seq((0L, 1.0), (1L, 5.0), (2L, 3.0), (4L, 7.0), (5L, 2.0),
      (7L, 6.0)).toDF("idx", "v")
    val b = Seq((0L, 2.0), (2L, 6.0), (3L, 1.0), (4L, 9.0), (5L, 4.0),
      (6L, 8.0)).toDF("idx", "v")
    val x = Analytics.crossCorrelation(a, b, "idx", "v", maxLag = 2)
      .select("lag", "n_pairs", "xcorr")
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    // lag 0 overlap: idx 0,2,4,5 -> 4 pairs
    assert(x.find(_._1 == 0).get._2 === 4L)
    val y = Analytics.crossCorrelation(a.repartition(7),
      b.repartition(5), "idx", "v", maxLag = 2)
      .select("lag", "n_pairs", "xcorr")
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    assert(x === y)
  }

  test("holt: observation contract + partition-count independence") {
    val base = Seq(
      ("a", Option(1L), Option(10.0)),
      ("a", None, Option(99.0)),             // null time: excluded
      ("a", Option(2L), None),                // null measure: excluded
      ("a", Option(3L), Option(Double.NaN)),  // non-stabilizing
      ("a", Option(4L), Option(20.0)),
      ("b", Option(1L), Option(7.0)))
    val one = Analytics.holt(base.toDF("k", "ts", "v").coalesce(1),
      Seq("k"), "ts", "v", alpha = 0.5, beta = 0.25)
      .orderBy("k", "ts").select("k", "ts", "level", "trend")
      .as[(String, Long, Double, Double)].collect()
    val many = Analytics.holt(base.toDF("k", "ts", "v").repartition(7),
      Seq("k"), "ts", "v", alpha = 0.5, beta = 0.25)
      .orderBy("k", "ts").select("k", "ts", "level", "trend")
      .as[(String, Long, Double, Double)].collect()
    assert(one === many) // sorted fold: bitwise partition-independent
    assert(one.map(r => (r._1, r._2)).toSeq ===
      Seq(("a", 1L), ("a", 4L), ("b", 1L)))
    // t4 on series (10, 20): l=.5*20+.5*10=15, b=.25*5+.75*0=1.25
    assert(one(1)._3 === 15.0)
    assert(one(1)._4 === 1.25)
  }
}
