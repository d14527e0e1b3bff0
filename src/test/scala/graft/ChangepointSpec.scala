package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Round-14 analytics batch: single changepoint per key (ts19),
  * Markov transition matrix (w13), cohort retention (a64).
  */
class ChangepointSpec extends SparkTestBase {
  import spark.implicits._

  test("clean mean shift splits exactly at the boundary") {
    val rows = (1 to 10).map(i => ("k", i.toLong, i.toLong, 0.0)) ++
      (11 to 20).map(i => ("k", i.toLong, i.toLong, 100.0))
    val out = Analytics.changepoint(rows.toDF("k", "ts", "eid", "v"),
      Seq("k"), "ts", "v", minSeg = 3, tieBreak = Seq("eid"))
      .select("k", "n", "cp_ts", "n_left", "mean_left", "mean_right", "gain")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    assert(out.length === 1)
    val r = out.head
    assert(r._2 === 20L)
    assert(r._3 === 10L) // split AFTER the last 0.0
    assert(r._4 === 10L)
    assert(r._5 === 0.0)
    assert(r._6 === 100.0)
    // gain = total SSE (both segments are flat, so split SSE = 0)
    assert(math.abs(r._7 - (20 * 50.0 * 50.0)) < 1e-6)
  }

  test("flat series: gain 0, first eligible split (ties break by ts)") {
    val rows = (1 to 12).map(i => ("k", i.toLong, i.toLong, 7.5))
    val out = Analytics.changepoint(rows.toDF("k", "ts", "eid", "v"),
      Seq("k"), "ts", "v", minSeg = 4, tieBreak = Seq("eid"))
      .select("cp_ts", "gain").as[(Long, Double)].collect()
    assert(out.length === 1)
    assert(out.head._1 === 4L) // earliest t with both segments >= minSeg
    assert(out.head._2 === 0.0)
  }

  test("keys shorter than 2*minSeg emit nothing; others still do") {
    val rows = (1 to 9).map(i => ("short", i.toLong, i.toLong, i.toDouble)) ++
      (1 to 10).map(i => ("long", i.toLong, i.toLong, i.toDouble))
    val out = Analytics.changepoint(rows.toDF("k", "ts", "eid", "v"),
      Seq("k"), "ts", "v", minSeg = 5, tieBreak = Seq("eid"))
      .select("k").as[String].collect()
    assert(out.toSeq === Seq("long"))
  }

  test("partition-layout independent") {
    val df = spark.range(300).select(
      (col("id") % 3).as("k"), col("id").as("ts"), col("id").as("eid"),
      when(col("id") % 3 === col("id") % 7, col("id") * 2)
        .otherwise(col("id")).cast("double").as("v"))
    val a = Analytics.changepoint(df, Seq("k"), "ts", "v", 5, Seq("eid"))
      .orderBy("k").collect()
    val b = Analytics.changepoint(df.repartition(13), Seq("k"), "ts", "v",
      5, Seq("eid")).orderBy("k").collect()
    assert(a === b)
    assert(a.length === 3)
  }

  test("transitionMatrix: per-key lead pairs, conditional shares sum to 1") {
    // user A: a -> b -> a -> b ; user B: b -> b -> c
    val rows = Seq(
      ("A", 1L, "a"), ("A", 2L, "b"), ("A", 3L, "a"), ("A", 4L, "b"),
      ("B", 1L, "b"), ("B", 2L, "b"), ("B", 3L, "c"))
    val out = Analytics.transitionMatrix(
      rows.toDF("u", "ts", "st").withColumn("eid", col("ts")),
      Seq("u"), "ts", "st", tieBreak = Seq("eid"))
      .orderBy("from_state", "to_state")
      .select("from_state", "to_state", "n_transitions", "p")
      .as[(String, String, Long, Double)].collect()
    // a->b x2; b->a x1, b->b x1, b->c x1 (no cross-user pair B.c -> ...)
    assert(out.toSeq === Seq(
      ("a", "b", 2L, 1.0),
      ("b", "a", 1L, 1.0 / 3.0),
      ("b", "b", 1L, 1.0 / 3.0),
      ("b", "c", 1L, 1.0 / 3.0)))
  }

  test("transitionMatrix never pairs across key boundaries or layouts") {
    val df = spark.range(500).select(
      (col("id") % 19).as("u"), col("id").as("ts"), col("id").as("eid"),
      concat(lit("s"), col("id") % 4).as("st"))
    val a = Analytics.transitionMatrix(df, Seq("u"), "ts", "st",
      Seq("eid")).orderBy("from_state", "to_state").collect()
    val b = Analytics.transitionMatrix(df.repartition(7), Seq("u"), "ts",
      "st", Seq("eid")).orderBy("from_state", "to_state").collect()
    assert(a === b)
    // total transitions = rows - one tail per key
    assert(a.map(_.getLong(2)).sum === 500L - 19L)
  }

  test("decompositionStrength: clean components score 1, noise scores " +
      "0, degenerate denominators are null") {
    def frame(k: String, rows: Seq[(Double, Double, Double)]) =
      rows.map { case (t, s, r) => (k, t, s, r) }
        .toDF("k", "trend", "seasonal", "residual")
    // k1: zero residual, varying seasonal + trend -> both strengths 1
    val k1 = frame("k1", Seq((1.0, 2.0, 0.0), (2.0, -2.0, 0.0),
      (3.0, 2.0, 0.0), (4.0, -2.0, 0.0)))
    // k2: flat seasonal, noisy residual -> seasonal_strength exactly 0
    // (FPP: F_S compares SSE(resid) to SSE(seasonal+resid))
    val k2 = frame("k2", Seq((1.0, 0.0, 1.0), (2.0, 0.0, -1.0),
      (3.0, 0.0, 1.0), (4.0, 0.0, -1.0)))
    // k3: everything constant -> both denominators 0 -> nulls
    val k3 = frame("k3", Seq((5.0, 0.0, 0.0), (5.0, 0.0, 0.0)))
    val out = Analytics.decompositionStrength(
      k1.unionAll(k2).unionAll(k3), Seq("k"))
      .orderBy("k")
      .select("k", "trend_strength", "seasonal_strength")
      .as[(String, Option[Double], Option[Double])].collect()
    assert(out(0) === (("k1", Some(1.0), Some(1.0))))
    assert(out(1)._3 === Some(0.0)) // SSE_dt == SSE_r: no seasonality
    assert(out(1)._2.exists(v => v > 0.0 && v <= 1.0)) // trend explains
    assert(out(2) === (("k3", None, None)))
  }

  test("conformalInterval: rank-based q, coverage flags, clamped rank") {
    // calibration residuals |y - 10| = 1, 2, 3, 4 (n = 4)
    val cal = Seq((10.0, 11.0), (10.0, 12.0), (10.0, 7.0), (10.0, 14.0))
      .toDF("yhat", "y")
    val test = Seq((1L, 10.0, 12.9), (2L, 10.0, 13.1), (3L, 10.0, 7.0))
      .toDF("id", "yhat", "y")
    // alpha 20%: rank = ceil(5 * 0.8) = 4 -> q = 4th smallest = 4
    val out20 = Analytics.conformalInterval(cal, test, "yhat", "y", 20)
      .orderBy("id").select("lo", "hi", "covered")
      .as[(Double, Double, Boolean)].collect()
    assert(out20.toSeq === Seq((6.0, 14.0, true), (6.0, 14.0, true),
      (6.0, 14.0, true)))
    // alpha 50%: rank = ceil(5 * 0.5) = 3 -> q = 3 -> id2 (13.1) escapes
    val out50 = Analytics.conformalInterval(cal, test, "yhat", "y", 50)
      .orderBy("id").select("covered").as[Boolean].collect()
    assert(out50.toSeq === Seq(true, false, true))
    // alpha 1%: rank = ceil(5 * .99) = 5 > n, clamps to 4 -> q = 4
    val out1 = Analytics.conformalInterval(cal, test, "yhat", "y", 1)
      .orderBy("id").select("hi").as[Double].collect()
    assert(out1.forall(_ === 14.0))
  }


  test("domainCentroidMap: hand centroids, orthogonal vs aligned groups") {
    import graft.operators.Similarity
    // gA vectors average to (1, 0); gB to (0, 2); gC to (2, 0)
    val rows = Seq(
      ("gA", Seq(2.0f, 0.0f)), ("gA", Seq(0.0f, 0.0f)),
      ("gB", Seq(0.0f, 1.0f)), ("gB", Seq(0.0f, 3.0f)),
      ("gC", Seq(2.0f, 0.0f)))
      .toDF("g", "v")
    val out = Similarity.domainCentroidMap(rows, "g", "v")
      .orderBy("group_a", "group_b")
      .select("group_a", "group_b", "n_a", "n_b", "cos_sim")
      .as[(String, String, Long, Long, Double)].collect()
    assert(out.toSeq === Seq(
      ("gA", "gB", 2L, 2L, 0.0),   // orthogonal centroids
      ("gA", "gC", 2L, 1L, 1.0),   // colinear centroids
      ("gB", "gC", 2L, 1L, 0.0)))
  }

  test("domainCentroidMap raises on ragged lengths and null elements " +
      "instead of skewing denominators") {
    import graft.operators.Similarity
    val ragged = Seq(
      ("g1", Seq[Option[Float]](Some(1.0f), Some(2.0f))),
      ("g1", Seq[Option[Float]](Some(3.0f))),
      ("g2", Seq[Option[Float]](Some(1.0f), Some(1.0f))),
      ("g2", Seq[Option[Float]](Some(0.0f), Some(2.0f))))
      .toDF("g", "v")
    val e1 = intercept[Exception] {
      Similarity.domainCentroidMap(ragged, "g", "v").collect()
    }
    assert(e1.getMessage.contains("ragged") ||
      Option(e1.getCause).exists(_.getMessage.contains("ragged")))
    val holed = Seq(
      ("g1", Seq[Option[Float]](Some(1.0f), None)),
      ("g2", Seq[Option[Float]](Some(1.0f), Some(1.0f))))
      .toDF("g", "v")
    val e2 = intercept[Exception] {
      Similarity.domainCentroidMap(holed, "g", "v").collect()
    }
    assert(e2.getMessage.contains("dense") ||
      Option(e2.getCause).exists(_.getMessage.contains("dense")))
  }

  test("retentionMatrix: hand-computed cohorts, age 0 is always 1.0") {
    def ts(day: Int): java.sql.Timestamp =
      new java.sql.Timestamp(day * 86400000L)
    // u1 first on day0, back day1+day2; u2 first day0, back day2;
    // u3 first day1 only. Duplicate same-day events must not double.
    val rows = Seq(
      ("u1", ts(0)), ("u1", ts(0)), ("u1", ts(1)), ("u1", ts(2)),
      ("u2", ts(0)), ("u2", ts(2)),
      ("u3", ts(1)))
    val out = Analytics.retentionMatrix(rows.toDF("u", "t"), "u", "t")
      .orderBy("cohort", "age")
      .select("cohort", "age", "n_active", "cohort_size", "retention")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq(
      (0L, 0L, 2L, 2L, 1.0),
      (0L, 1L, 1L, 2L, 0.5),
      (0L, 2L, 2L, 2L, 1.0),
      (1L, 0L, 1L, 1L, 1.0)))
  }
}
