package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, TextAnalysis}

/** Edge cases of the session-7 analytics family: rolling z-score
  * guards, robust stats on tiny groups, vocabulary statistics.
  */
class RobustAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("rolling z-score: constant trailing window never divides by zero") {
    // 10 identical values then one outlier: the outlier's window is
    // constant (variance 0) => NOT flagged (no scale), no NaN/error
    val rows = (1 to 10).map(i =>
      (i.toLong, 1L, ts(f"2024-01-01 00:${i}%02d:00"), 5.0)) :+
      ((11L, 1L, ts("2024-01-01 00:11:00"), 500.0))
    val out = Analytics.rollingZScoreAnomalies(
      rows.toDF("event_id", "user_id", "ts", "value"),
      Seq("user_id"), "ts", "value", lookback = 24, zThreshold = 3.0,
      minObs = 2, tieBreak = Seq("event_id"))
    assert(out.count() === 0)
  }

  test("rolling z-score: flags the outlier once the window has spread") {
    val rows = (1 to 10).map(i =>
      (i.toLong, 1L, ts(f"2024-01-01 00:${i}%02d:00"),
        if (i % 2 == 0) 6.0 else 4.0)) :+
      ((11L, 1L, ts("2024-01-01 00:11:00"), 500.0))
    val out = Analytics.rollingZScoreAnomalies(
      rows.toDF("event_id", "user_id", "ts", "value"),
      Seq("user_id"), "ts", "value", lookback = 24, zThreshold = 3.0,
      minObs = 2, tieBreak = Seq("event_id")).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(11L))
    assert(out.head.getAs[Double]("z") > 3.0)
  }

  test("rolling z-score: minObs gates early rows; row excludes itself") {
    val rows = Seq(
      (1L, 1L, ts("2024-01-01 00:01:00"), 1.0),
      (2L, 1L, ts("2024-01-01 00:02:00"), 2.0),
      (3L, 1L, ts("2024-01-01 00:03:00"), 100.0))
    // minObs=2: row 3's window is {1.0, 2.0} (itself excluded) => z huge
    val out = Analytics.rollingZScoreAnomalies(
      rows.toDF("event_id", "user_id", "ts", "value"),
      Seq("user_id"), "ts", "value", lookback = 24, zThreshold = 3.0,
      minObs = 2, tieBreak = Seq("event_id")).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("robustStats: trimmed mean drops exactly the out-of-band tail") {
    val df = ((1 to 99).map(_.toDouble) :+ 100000.0)
      .map(v => ("g", v)).toDF("k", "v")
    val r = Analytics.robustStats(df, "k", "v").head
    // p95 band excludes the 100000 outlier; mean of the kept middle is
    // outlier-free (well under 100)
    assert(r.getAs[Double]("trimmed_avg_v") < 100.0)
    // interpolated median of {1..99, 100000}: (v[49]+v[50])/2 = 50.5
    assert(r.getAs[Double]("median_v") === 50.5)
  }

  test("zipfFit: an exact power law is recovered with slope -1, R² = 1") {
    // freq = 840 / rank for ranks 1..8 (840 = lcm(1..8), all integer):
    // ln freq = ln 840 - 1 * ln rank exactly
    val words = (1 to 8).map(r => s"w$r" -> 840 / r)
    val docs = words.flatMap { case (w, n) => Seq.fill(n)(w) }
      .grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val r = TextAnalysis.zipfFit(docs, "text", topK = 8)
      .select("k", "slope", "intercept", "r2")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 === 8L)
    assert(math.abs(r._2 - (-1.0)) < 1e-6)
    assert(math.abs(r._3 - math.log(840)) < 1e-6)
    assert(math.abs(r._4 - 1.0) < 1e-6)
  }

  test("zipfFit: flat frequencies give slope 0 and NULL R²; topK " +
      "bounds the fit; the guard is loud") {
    val docs = Seq("aa bb cc dd ee").toDF("text")
    val flat = TextAnalysis.zipfFit(docs, "text", topK = 5)
      .select("k", "slope", "r2").collect().head
    assert(flat.getLong(0) === 5L && flat.getDouble(1) === 0.0)
    assert(flat.isNullAt(2))
    // topK smaller than vocab: only the head is fitted
    val capped = TextAnalysis.zipfFit(
      Seq("x x x x y y z").toDF("text"), "text", topK = 3)
      .select("k").as[Long].head()
    assert(capped === 3L)
    assertThrows[IllegalArgumentException] {
      TextAnalysis.zipfFit(docs, "text", topK = 2)
    }
  }

  test("robustScale: hand-computed median/IQR scaling; constant bulk " +
      "gives NULL; outliers cannot move the scale") {
    // group a: 1..5 -> med 3, q1 2, q3 4, iqr 2
    val a = (1 to 5).map(v => ("a", v.toLong, v.toDouble))
    // group b: constant -> iqr 0 -> NULL scaled
    val b = (1 to 4).map(i => ("b", 10L + i, 7.0))
    val df = (a ++ b).toDF("g", "id", "v")
    val out = Analytics.robustScale(df, "g", "v")
      .select("g", "id", "scaled_v").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(("a", 1L)) === Some(-1.0))
    assert(out(("a", 3L)) === Some(0.0))
    assert(out(("a", 5L)) === Some(1.0))
    assert(out(("b", 11L)) === None)
    // one wild outlier: median/IQR barely move (vs mean/stddev)
    val c = ((1 to 9).map(v => ("c", v.toLong, v.toDouble)) :+
      (("c", 99L, 1e9))).toDF("g", "id", "v")
    val mid = Analytics.robustScale(c, "g", "v")
      .where(col("id") === 5L).select("scaled_v").as[Double].head()
    assert(math.abs(mid) < 0.2, s"median row must stay near 0, got $mid")
    // a transform NEVER drops rows: null group keys form their own
    // group and scale within it
    val withNull = (Seq(("a", 1L, 1.0), ("a", 2L, 3.0)) ++
      Seq((null: String, 3L, 1.0), (null: String, 4L, 5.0)))
      .toDF("g", "id", "v")
    val scaled = Analytics.robustScale(withNull, "g", "v")
    assert(scaled.count() === 4L, "null-key rows must survive")
    // null group {1, 5}: med 3, iqr 2 -> scaled(5) = 1.0
    assert(scaled.where(col("g").isNull && col("id") === 4L)
      .select("scaled_v").as[Double].head() === 1.0)
  }

  test("coOccurrencePairs: hand-computed supports and lifts; duplicate " +
      "(basket, item) rows collapse") {
    val rows = Seq((1L, "x"), (1L, "y"), (1L, "z"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "q"), (3L, "q"), (2L, "x"))
    val out = Analytics.coOccurrencePairs(rows.toDF("b", "i"), "b", "i",
      minSupport = 1)
      .select("item_a", "item_b", "n_baskets", "n_a", "n_b", "lift")
      .as[(String, String, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6)))
      .toMap
    assert(out.size === 4)
    assert(out(("x", "y")) === ((2L, 3L, 2L, 1.0))) // 2*3/(3*2)
    assert(out(("y", "z")) === ((1L, 2L, 1L, 1.5))) // 1*3/(2*1)
    assert(out(("q", "x")) === ((1L, 1L, 3L, 1.0))) // 1*3/(1*3)
    assert(out(("x", "z")) === ((1L, 3L, 1L, 1.0)))
  }

  test("coOccurrencePairs: minSupport prunes, maxBasketSize drops hub " +
      "baskets before the join, guards are loud") {
    val rows = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z")) ++ (1 to 10).map(i => (9L, s"h$i"))
    val df = rows.toDF("b", "i")
    val sup2 = Analytics.coOccurrencePairs(df, "b", "i", minSupport = 2)
      .select("item_a", "item_b").as[(String, String)].collect().toSet
    assert(sup2 === Set(("x", "y")))
    // the 10-item basket is excluded entirely at maxBasketSize = 5 —
    // none of its C(10,2) pairs appear, and its items leave the
    // marginals (x,y lift uses N = 3 kept baskets)
    val capped = Analytics.coOccurrencePairs(df, "b", "i",
      minSupport = 1, maxBasketSize = 5)
      .select("item_a").as[String].collect()
    assert(!capped.exists(_.startsWith("h")))
    assertThrows[IllegalArgumentException] {
      Analytics.coOccurrencePairs(df, "b", "i", minSupport = 0)
    }
  }

  test("coOccurrencePairs property: matches a straight-line reference " +
      "on seeded baskets, including all lifts") {
    val items = "abcdefgh"
    val baskets = (0 until 30).map { b =>
      val picks = (0 until 8).filter(i => ((b * 7 + i * 13) % 5) < 2)
        .map(i => items(i).toString)
      b.toLong -> picks
    }.filter(_._2.nonEmpty)
    val df = baskets.flatMap { case (b, is) => is.map((b, _)) }
      .toDF("b", "i")
    val got = Analytics.coOccurrencePairs(df, "b", "i", minSupport = 1)
      .select("item_a", "item_b", "n_baskets", "n_a", "n_b", "lift")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // straight-line reference
    val sets = baskets.map { case (_, is) => is.toSet }
    val nB = sets.size
    val itemCount = items.map(c => c.toString ->
      sets.count(_.contains(c.toString))).toMap
    val ref = (for {
      a <- items.map(_.toString); b <- items.map(_.toString)
      if a < b
      sup = sets.count(s => s.contains(a) && s.contains(b))
      if sup >= 1
    } yield (a, b) -> sup).toMap
    assert(got.keySet === ref.keySet)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    ref.foreach { case ((a, b), sup) =>
      val row = got((a, b))
      assert(row._3 === sup.toLong)
      assert(row._4 === itemCount(a).toLong &&
        row._5 === itemCount(b).toLong)
      assert(row._6 === r6(sup.toDouble * nB /
        (itemCount(a).toDouble * itemCount(b))))
    }
  }

  test("jsDivergence: identical slices give 0, disjoint slices give " +
      "exactly ln 2 (1 bit)") {
    val df = Seq(("a", "x y z x"), ("b", "x y z x"), ("c", "q r s"))
      .toDF("s", "text")
    val out = TextAnalysis.jsDivergence(df, "s", "text")
      .select("s_a", "s_b", "n_terms_shared", "jsd_nats", "jsd_bits")
      .as[(String, String, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out.size === 3)
    assert(out(("a", "b")) === ((3L, 0.0, 0.0)))
    val ln2r = BigDecimal(math.log(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("a", "c")) === ((0L, ln2r, 1.0)))
    assert(out(("b", "c")) === ((0L, ln2r, 1.0)))
  }

  test("jsDivergence: hand-computed two-slice overlap") {
    // A: x x y  (x 2/3, y 1/3) ; B: x y y y  (x 1/4, y 3/4)
    val df = Seq(("A", "x x y"), ("B", "x y y y")).toDF("s", "text")
    val r = TextAnalysis.jsDivergence(df, "s", "text")
      .select("n_a", "n_b", "n_terms_shared", "jsd_nats")
      .as[(Long, Long, Long, Double)].head()
    val (pax, pay, pbx, pby) = (2.0 / 3, 1.0 / 3, 0.25, 0.75)
    def c(p: Double, q: Double) = p * math.log(2 * p / (p + q))
    val want = 0.5 * (c(pax, pbx) + c(pay, pby) + c(pbx, pax) +
      c(pby, pay))
    assert(r._1 === 3L && r._2 === 4L && r._3 === 2L)
    assert(math.abs(r._4 - want) < 1e-6)
  }

  test("jsDivergence: null slices drop; partial overlap bounded in " +
      "(0, ln 2); repartition-invariant") {
    val df = Seq(("A", "x y"), ("B", "y z"), (null, "x y z"))
      .toDF("s", "text")
    val r = TextAnalysis.jsDivergence(df, "s", "text")
      .select("s_a", "s_b", "jsd_nats").as[(String, String, Double)]
      .collect()
    assert(r.length === 1 && r.head._1 === "A" && r.head._2 === "B")
    assert(r.head._3 > 0.0 && r.head._3 < math.log(2))
    val shuffled = TextAnalysis.jsDivergence(df.repartition(7), "s",
      "text").select("jsd_nats").as[Double].head()
    assert(shuffled === r.head._3)
  }

  test("vocabStats: hand-computed counts and hapax") {
    val df = Seq(
      ("a", "x x y"),
      ("a", "y z"),
      ("b", "q")).toDF("source", "text")
    val r = TextAnalysis.vocabStats(df, "source", "text")
      .orderBy("source").collect()
    // group a: tokens=5, types={x,y,z}=3, hapax={z}=1
    assert(r(0).getAs[Long]("n_tokens") === 5L)
    assert(r(0).getAs[Long]("n_types") === 3L)
    assert(r(0).getAs[Long]("n_hapax") === 1L)
    assert(r(0).getAs[Double]("type_token_ratio") === 0.6)
    // group b: 1/1/1
    assert(r(1).getAs[Long]("n_tokens") === 1L)
    assert(r(1).getAs[Long]("n_hapax") === 1L)
  }

  test("ppsSample refuses a fractional weight column loudly") {
    val df = Seq((1L, "g", 0.9), (2L, "g", 0.1)).toDF("id", "g", "w")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Sampling.ppsSample(df, col("g"), col("id"),
        col("w"), k = 1, seed = 1L)
    }
    assert(e.getMessage.contains("integral weight"))
  }

  // ---------- weighted quantiles ----------

  private def wq(rows: Seq[(String, Int, Int)],
      points: Seq[(String, Int, Int)]): Map[String, Seq[BigDecimal]] =
    Analytics.weightedQuantiles(
      rows.toDF("g", "v", "w"), "g", "v", "w", points)
      .collect().map(r => r.getString(0) ->
        (1 until r.length).map(i => BigDecimal(r.get(i).toString))).toMap

  test("weighted quantiles: unit weights reduce to ordinary quantiles") {
    val rows = (1 to 4).map(v => ("g", v, 1))
    val r = wq(rows, Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4)))
    assert(r("g") === Seq(BigDecimal(1), BigDecimal(2), BigDecimal(3)))
  }

  test("weighted quantiles: a heavy value dominates every point and " +
      "duplicate rows collapse like summed weights") {
    val rows = Seq(("g", 10, 1), ("g", 20, 98), ("g", 30, 1))
    val r = wq(rows, Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4)))
    assert(r("g") === Seq(20, 20, 20).map(BigDecimal(_)))
    // (20, 98) split into 98 unit rows: same pre-aggregated frame
    val split = Seq(("g", 10, 1), ("g", 30, 1)) ++
      (1 to 98).map(_ => ("g", 20, 1))
    assert(wq(split, Seq(("p50", 1, 2))) ===
      Map("g" -> Seq(BigDecimal(20))))
  }

  test("weighted quantiles: per-group independence, p0/p1 endpoints, " +
      "and input-order invariance") {
    val rows = Seq(("a", 1, 1), ("a", 5, 3), ("b", 7, 2), ("b", 2, 2))
    val pts = Seq(("lo", 0, 1), ("med", 1, 2), ("hi", 1, 1))
    val r = wq(rows, pts)
    assert(r("a") === Seq(1, 5, 5).map(BigDecimal(_)))
    assert(r("b") === Seq(2, 2, 7).map(BigDecimal(_)))
    assert(wq(scala.util.Random.shuffle(rows), pts) === r)
    intercept[IllegalArgumentException] {
      Analytics.weightedQuantiles(rows.toDF("g", "v", "w"), "g", "v", "w",
        Seq(("bad", 3, 2)))
    }
  }
}
