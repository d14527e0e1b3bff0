package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Analytics

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("collapses unchanged runs and stamps validity intervals") {
    val log = Seq(
      (1L, "bronze", ts(0), 10L),
      (1L, "bronze", ts(5), 11L), // unchanged -> collapsed
      (1L, "silver", ts(10), 12L),
      (1L, "silver", ts(15), 13L), // unchanged -> collapsed
      (1L, "gold", ts(20), 14L),
      (2L, "bronze", ts(3), 20L)
    ).toDF("user_id", "tier", "ts", "event_id")
    val out = Analytics.scd2(log, Seq("user_id"), "ts", Seq("tier"),
      Seq("ts", "event_id"))
      .orderBy("user_id", "effective_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect()
    assert(out.toSeq === Seq(
      (1L, "bronze", ts(0), Some(ts(10)), false),
      (1L, "silver", ts(10), Some(ts(20)), false),
      (1L, "gold", ts(20), None, true),
      (2L, "bronze", ts(3), None, true)))
  }

  test("null-safe change detection: null->value and value->null are changes") {
    val log = Seq(
      (1L, Option.empty[String], ts(0), 1L),
      (1L, Option.empty[String], ts(1), 2L), // null->null: no change
      (1L, Some("a"), ts(2), 3L),
      (1L, Option.empty[String], ts(3), 4L)
    ).toDF("user_id", "tier", "ts", "event_id")
    val out = Analytics.scd2(log, Seq("user_id"), "ts", Seq("tier"),
      Seq("ts", "event_id"))
      .orderBy("effective_from")
      .select("tier", "is_current").as[(Option[String], Boolean)].collect()
    assert(out.toSeq === Seq(
      (None, false), (Some("a"), false), (None, true)))
  }

  test("same-timestamp events order by the tie-breaker deterministically") {
    val log = Seq(
      (1L, "x", ts(0), 2L),
      (1L, "y", ts(0), 1L) // same ts: event_id 1 comes first
    ).toDF("user_id", "tier", "ts", "event_id")
    val out = Analytics.scd2(log, Seq("user_id"), "ts", Seq("tier"),
      Seq("ts", "event_id"))
      .orderBy("effective_from", "tier")
      .select("tier", "is_current").as[(String, Boolean)].collect().toSet
    assert(out === Set(("y", false), ("x", true)))
  }

  test("multi-attribute tracking: any attribute change opens a version") {
    val log = Seq(
      (1L, "a", 1, ts(0), 1L),
      (1L, "a", 2, ts(1), 2L), // second attr changed
      (1L, "a", 2, ts(2), 3L) // unchanged
    ).toDF("user_id", "tier", "level", "ts", "event_id")
    val out = Analytics.scd2(log, Seq("user_id"), "ts",
      Seq("tier", "level"), Seq("ts", "event_id"))
    assert(out.count() === 2)
  }
}
