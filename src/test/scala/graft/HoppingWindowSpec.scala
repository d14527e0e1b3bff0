package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Hopping-window aggregation: the window/slide expansion, bounds, and
  * exact-decimal averages.
  */
class HoppingWindowSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("every event lands in exactly window/slide windows that contain it") {
    val df = Seq(
      (1L, "a", ts("2024-05-01 00:07:00"), 10.0),
      (2L, "a", ts("2024-05-01 00:16:00"), 20.0),
      (3L, "b", ts("2024-05-01 00:31:00"), 30.0))
      .toDF("event_id", "event_type", "ts", "value")
    val out = Analytics.hoppingAvg(df, Seq("event_type"), "ts", "value",
      "30 minutes", "15 minutes")
    // 3 events × 2 windows each = 6 (event_type, window) memberships;
    // here each membership is its own group except none coincide
    val rows = out.collect()
    assert(rows.map(_.getAs[Long]("n")).sum === 6L)
    // window bounds are 30 min apart and aligned to the 15-min grid
    rows.foreach { r =>
      val s = r.getAs[Timestamp]("window_start").getTime
      val e = r.getAs[Timestamp]("window_end").getTime
      assert(e - s === 30L * 60 * 1000)
      assert(s % (15L * 60 * 1000) === 0)
    }
  }

  test("counts and averages match a hand-computed grid") {
    // 00:07 → windows [23:45, 00:15) is wrong side; [00:00, 00:30) and
    // [23:45..] — enumerate: starts 00:00 and 23:45
    val df = Seq(
      (1L, "a", ts("2024-05-01 00:07:00"), 10.0),
      (2L, "a", ts("2024-05-01 00:08:00"), 20.0),
      (3L, "a", ts("2024-05-01 00:16:00"), 40.0))
      .toDF("event_id", "event_type", "ts", "value")
    val out = Analytics.hoppingAvg(df, Seq("event_type"), "ts", "value",
      "30 minutes", "15 minutes")
      .select(col("window_start").cast("string").as("ws"),
        col("n"), col("avg_value"))
      .orderBy("ws").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      ("2024-04-30 23:45:00", 2L, 15.0), // events 1,2
      ("2024-05-01 00:00:00", 3L, 70.0 / 3), // all three
      ("2024-05-01 00:15:00", 1L, 40.0))) // event 3
  }

  test("null timestamps are excluded; null measures count in n only") {
    val df = Seq[(Long, String, Timestamp, java.lang.Double)](
      (1L, "a", ts("2024-05-01 00:07:00"), 10.0),
      (2L, "a", null, 99.0),
      (3L, "a", ts("2024-05-01 00:08:00"), null))
      .toDF("event_id", "event_type", "ts", "value")
    val out = Analytics.hoppingAvg(df, Seq("event_type"), "ts", "value",
      "30 minutes", "15 minutes").orderBy("window_start").collect()
    assert(out.length === 2, "null-ts row belongs to no window")
    // n counts rows, avg divides by non-null measures only
    assert(out.forall(r => r.getAs[Long]("n") === 2L &&
      r.getAs[Double]("avg_value") === 10.0))
  }
}
