package graft

import java.sql.Timestamp
import graft.operators.Analytics

/** MASE (mean absolute scaled error of the seasonal-naive forecaster):
  * closed forms on periodic / trending series, the exclusion contracts,
  * and an independent straight-line reference.
  */
class MaseSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(i: Int): Timestamp = new Timestamp(i * 60000L)

  private def maseOf(vals: Seq[Double], season: Int)
      : Seq[(Long, Long, Long, Long, Double, Double, Double)] =
    Analytics.maseEval(
      vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, ts(i), v) }
        .toDF("user_id", "event_id", "ts", "value"),
      keyCols = Seq("user_id"), tsCol = "ts", measure = "value",
      season = season, tieBreak = Seq("event_id"))
      .select("user_id", "n", "n_naive", "n_seasonal", "mae_naive",
        "mae_seasonal", "mase")
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq

  test("perfectly periodic series: seasonal MAE and MASE are exactly 0") {
    val r = maseOf(Seq(1, 2, 3, 1, 2, 3, 1, 2, 3), season = 3)
    assert(r === Seq((1L, 9L, 8L, 6L, 1.25, 0.0, 0.0)))
  }

  test("linear trend: seasonal error is exactly `season`x the naive " +
      "error, so MASE = season") {
    // x_t = t: |x_t - x_{t-1}| = 1, |x_t - x_{t-m}| = m
    val r = maseOf((1 to 12).map(_.toDouble), season = 4)
    assert(r.size === 1)
    val (_, n, n1, nm, mae1, maem, mase) = r.head
    assert(n === 12L && n1 === 11L && nm === 8L)
    assert(mae1 === 1.0 && maem === 4.0 && mase === 4.0)
  }

  test("constant series is excluded (naive MAE 0 makes MASE undefined); " +
      "too-short series (no seasonal pairs) is excluded") {
    assert(maseOf(Seq.fill(10)(5.0), season = 3) === Seq.empty)
    assert(maseOf(Seq(1.0, 2.0, 3.0), season = 7) === Seq.empty)
  }

  test("matches a straight-line reference on irregular data, per key") {
    val vals = Seq(3.25, 1.5, 4.75, 1.0, 5.5, 9.25, 2.0, 6.5, 5.25, 3.5,
      8.75, 9.0, 7.25, 2.5)
    val m = 5
    def mae(diffs: Seq[Double]) = diffs.map(math.abs).sum / diffs.size
    val mae1 = mae(vals.sliding(2).map(p => p(1) - p(0)).toSeq)
    val maem = mae(vals.drop(m).zip(vals.dropRight(m)).map(p => p._1 - p._2))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = maseOf(vals, season = m)
    assert(r.size === 1)
    assert(r.head._5 === r6(mae1))
    assert(r.head._6 === r6(maem))
    assert(r.head._7 === r6(maem / mae1))
  }

  test("keys are independent and the season guard is loud") {
    val df = ((1 to 9).map(i => (1L, i.toLong, ts(i), i.toDouble)) ++
      (1 to 9).map(i => (2L, i.toLong, ts(i), (i % 3).toDouble)))
      .toDF("user_id", "event_id", "ts", "value")
    val r = Analytics.maseEval(df, Seq("user_id"), "ts", "value",
      season = 3, tieBreak = Seq("event_id"))
      .select("user_id", "mase").as[(Long, Double)].collect().toMap
    assert(r(1L) === 3.0) // linear trend: MASE = season
    assert(r(2L) === 0.0) // periodic: seasonal-naive is exact
    assertThrows[IllegalArgumentException] {
      Analytics.maseEval(df, Seq("user_id"), "ts", "value", season = 1)
    }
  }
}
