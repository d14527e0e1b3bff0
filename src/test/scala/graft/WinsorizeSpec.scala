package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Per-group winsorization: thresholds are the group's discrete
  * quantiles (actual data values), clamping is per group, nulls pass
  * through, and the big side never reshuffles (broadcast clamp).
  */
class WinsorizeSpec extends SparkTestBase {
  import spark.implicits._

  test("clamps into the group's discrete [p5, p95] envelope") {
    // group a: 1..100 → p05 = 5, p95 = 95 (quantile_disc picks members)
    val df = (1 to 100).map(i => (i.toLong, "a", i.toDouble))
      .toDF("id", "g", "v")
    val out = Analytics.winsorize(df, "g", "v", outCol = "w")
      .select("id", "w").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.take(4).forall(_._2 == 5.0), "below p05 clamps up")
    assert(out.slice(4, 95).forall { case (id, w) => w == id.toDouble },
      "interior values untouched")
    assert(out.drop(95).forall(_._2 == 95.0), "above p95 clamps down")
  }

  test("groups clamp independently; null values stay null") {
    val df = Seq[(Long, String, java.lang.Double)](
      (1L, "lo", 1.0), (2L, "lo", 2.0), (3L, "lo", 3.0),
      (4L, "hi", 100.0), (5L, "hi", 200.0), (6L, "hi", 300.0),
      (7L, "hi", null))
      .toDF("id", "g", "v")
    val out = Analytics.winsorize(df, "g", "v", lo = 0.0, hi = 1.0)
      .select("id", "value_w").orderBy("id").collect()
    // lo=0/hi=1 → clamp to group min/max → identity on non-nulls
    val expect = Seq(1.0, 2.0, 3.0, 100.0, 200.0, 300.0)
    (0 until 6).foreach(i => assert(out(i).getDouble(1) === expect(i)))
    assert(out(6).isNullAt(1), "null measure stays null")
  }

  test("every output is a member of the group's value set") {
    val rnd = new scala.util.Random(3)
    val df = Seq.tabulate(500)(i =>
      (i.toLong, s"g${i % 3}", rnd.nextDouble() * 1000))
      .toDF("id", "g", "v")
    val vals = df.groupBy("g").agg(collect_set("v").as("vs"))
    val joined = Analytics.winsorize(df, "g", "v").join(vals, "g")
      .select(array_contains(col("vs"), col("value_w")).as("ok"))
      .collect()
    assert(joined.forall(_.getBoolean(0)),
      "winsorized values must be actual group members (quantile_disc)")
  }

  test("the frame side is clamped via broadcast, not reshuffled") {
    val df = (1 to 50).map(i => (i.toLong, "a", i.toDouble))
      .toDF("id", "g", "v")
    val plan = Analytics.winsorize(df, "g", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"thresholds must broadcast:\n$plan")
  }
}
