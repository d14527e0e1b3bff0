package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

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
}
