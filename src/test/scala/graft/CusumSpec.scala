package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Two-sided CUSUM change-point gate: the window-algebra closed form
  * must equal the sequential floor-at-zero recurrence exactly.
  */
class CusumSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def bd(s: String) = new java.math.BigDecimal(s)

  /** Straight-line reference: the textbook recurrence, exact decimal. */
  private def reference(xs: Seq[BigDecimal], target: BigDecimal,
      slack: BigDecimal): Seq[(BigDecimal, BigDecimal)] = {
    val kUp = target + slack
    val kDn = target - slack
    var sp = BigDecimal(0)
    var sn = BigDecimal(0)
    xs.map { x =>
      sp = (sp + (x - kUp)).max(0)
      sn = (sn + (kDn - x)).max(0)
      (sp, sn)
    }
  }

  private def run(values: Seq[Double], threshold: String = "0.01") = {
    val rows = values.zipWithIndex.map { case (v, i) =>
      (i.toLong, 1L, ts(f"2024-01-01 00:${i}%02d:00"), v)
    }
    Analytics.cusum(rows.toDF("event_id", "user_id", "ts", "value"),
      Seq("user_id"), "ts", "value", bd("10.00"), bd("2.00"),
      bd(threshold), tieBreak = Seq("event_id"))
  }

  test("closed form equals the sequential recurrence on a varied series") {
    val values = Seq(9.5, 14.0, 13.5, 8.0, 2.0, 3.0, 19.0, 18.5, 10.0,
      1.5, 25.0, 7.0, 7.0, 30.0, 4.0)
    // threshold tiny so every row with a positive score surfaces
    val got = run(values).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((BigDecimal(r.getAs[java.math.BigDecimal]("s_pos")),
          BigDecimal(r.getAs[java.math.BigDecimal]("s_neg")))))
      .toMap
    val want = reference(values.map(BigDecimal(_)),
      BigDecimal(10), BigDecimal(2))
    values.indices.foreach { i =>
      val (sp, sn) = want(i)
      if (sp > BigDecimal("0.01") || sn > BigDecimal("0.01")) {
        val (gp, gn) = got(i.toLong)
        assert(gp === sp, s"s_pos at row $i")
        assert(gn === sn, s"s_neg at row $i")
      } else assert(!got.contains(i.toLong), s"row $i should not alarm")
    }
  }

  test("slow upward drift alarms on s_pos where no single z-spike exists") {
    // mean shifts 10 -> 13 at index 10: each excursion is small (+1 over
    // the k=12 band) but accumulates; before the shift nothing fires
    val values = Seq.fill(10)(10.0) ++ Seq.fill(10)(13.0)
    val out = run(values, threshold = "5.00").collect()
    assert(out.nonEmpty, "drift must eventually alarm")
    assert(out.map(_.getAs[Long]("event_id")).min >= 15L,
      "alarm only after enough drift accumulates")
    assert(out.forall(_.getAs[String]("side") == "hi"))
  }

  test("downward drift alarms on s_neg; recovery resets the statistic") {
    // drop to 4 (4 under the k=8 lower band) for 4 rows, then recover:
    // s_neg rises to 16 then drains at 2/row once back on target
    val values = Seq.fill(5)(10.0) ++ Seq.fill(4)(4.0) ++ Seq.fill(10)(10.0)
    val out = run(values, threshold = "9.00").collect()
    assert(out.nonEmpty && out.forall(_.getAs[String]("side") == "lo"))
    // after recovery s_neg drains by 2/row from 16: rows 9..12 stay > 9
    val ids = out.map(_.getAs[Long]("event_id")).toSet
    assert(!ids.contains(4L), "pre-shift rows must not alarm")
    assert(ids.contains(8L), "peak of the excursion alarms")
    assert(!ids.contains(15L), "fully drained statistic stops alarming")
  }

  test("keys are independent and null/non-stabilizable rows are excluded") {
    val rows = Seq(
      (1L, 1L, ts("2024-01-01 00:01:00"), 100.0),
      (2L, 2L, ts("2024-01-01 00:01:00"), 10.0),
      (3L, 1L, null.asInstanceOf[java.sql.Timestamp], 500.0),
      (4L, 1L, ts("2024-01-01 00:02:00"), Double.NaN),
      (5L, 1L, ts("2024-01-01 00:03:00"), 100.0))
    val out = Analytics.cusum(
      rows.toDF("event_id", "user_id", "ts", "value"),
      Seq("user_id"), "ts", "value", bd("10.00"), bd("2.00"), bd("50.00"),
      tieBreak = Seq("event_id")).collect()
    // user 2 on-target: silent; user 1 rows 1 and 5 accumulate 88 each;
    // the null-ts and NaN rows neither alarm nor perturb the running sum
    assert(out.map(_.getAs[Long]("event_id")).sorted.toSeq === Seq(1L, 5L))
    assert(out.forall(_.getAs[Long]("user_id") == 1L))
    val last = out.maxBy(_.getAs[Long]("event_id"))
    assert(BigDecimal(last.getAs[java.math.BigDecimal]("s_pos")) ===
      BigDecimal(176))
  }

  // ---- Page–Hinkley (ts17) ----

  /** Textbook PH recurrence with the inclusive running mean, double
    * deviations quantized to 12 decimals like the operator. */
  private def phReference(xs: Seq[Double], delta: Double)
      : Seq[(BigDecimal, BigDecimal)] = {
    var s = BigDecimal(0)
    var mp = BigDecimal(0)
    var mn = BigDecimal(0)
    var minP: BigDecimal = null
    var minN: BigDecimal = null
    xs.zipWithIndex.map { case (x, i) =>
      s += BigDecimal(x)
      val mean = s.toDouble / (i + 1).toDouble // the operator's double div
      def q(d: Double) = BigDecimal(d).setScale(12,
        BigDecimal.RoundingMode.HALF_UP)
      mp += q(x - mean - delta)
      mn += q(mean - x - delta)
      // prefix min INCLUDES the current row (the frame has no virtual 0)
      minP = if (minP == null) mp else minP.min(mp)
      minN = if (minN == null) mn else minN.min(mn)
      (mp - minP, mn - minN)
    }
  }

  test("pageHinkley: a mean shift alarms on the hi side where the " +
      "stable prefix stays silent; scores match the recurrence") {
    val values = Seq.fill(20)(50.0) ++ Seq.fill(20)(58.0)
    val rows = values.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, ts(f"2024-01-01 00:${i}%02d:00"), v)
    }
    val df = rows.toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.pageHinkley(df, Seq("user_id"), "ts", "value",
      delta = 0.5, lambda = new java.math.BigDecimal("30.00"),
      tieBreak = Seq("event_id"))
      .orderBy("event_id").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("side") == "hi"))
    val ref = phReference(values, 0.5)
    val byId = out.map(r =>
      r.getAs[Long]("event_id") -> r.getAs[Double]("ph_pos")).toMap
    // every alarm row's score equals the recurrence, rounded 6
    byId.foreach { case (id, ph) =>
      val want = ref(id.toInt)._1.setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(ph - want) < 1e-9, s"row $id")
    }
    // the stable prefix never alarms at this lambda
    assert(byId.keys.min >= 20L)
  }

  test("pageHinkley: constant series never alarms; partition count " +
      "does not matter; null time/measure rows are excluded") {
    val flat = (0 until 30).map(i =>
      (1L, i.toLong, ts(f"2024-01-01 00:${i}%02d:00"), 42.0))
    val none = Analytics.pageHinkley(
      flat.toDF("user_id", "event_id", "ts", "value"),
      Seq("user_id"), "ts", "value", 0.1,
      new java.math.BigDecimal("1.00"), Seq("event_id"))
    assert(none.count() === 0L)
    val drift = (0 until 40).map(i =>
      (1L, i.toLong, ts(f"2024-01-01 00:${i}%02d:00"), 50.0 + i * 0.8))
    def run(parts: Int) = Analytics.pageHinkley(
      drift.toDF("user_id", "event_id", "ts", "value").repartition(parts),
      Seq("user_id"), "ts", "value", 0.5,
      new java.math.BigDecimal("10.00"), Seq("event_id"))
      .orderBy("event_id")
      .select("event_id", "ph_pos", "ph_neg", "side").collect().toSeq
    assert(run(1) === run(7))
  }
}
