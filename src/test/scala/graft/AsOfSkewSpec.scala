package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Skew hardening for the as-of auto() path: a hot key that would land
  * on one reducer of the merge exec's exchange re-routes through the
  * map-side broadcast strategy, output identical.
  */
class AsOfSkewSpec extends SparkTestBase {
  import spark.implicits._

  // 60% of left rows on ONE key — the shape that puts >half the merge
  // exec's work on a single task
  private def leftDf = spark.range(100000).select(
    when(col("id") % 10 < 6, lit("HOT"))
      .otherwise(concat(lit("k"), (col("id") % 997).cast("string")))
      .as("k"),
    (col("id") * 1000L).as("t"),
    col("id").as("x"))

  private def rightDf = spark.range(20000).select(
    when(col("id") % 10 < 6, lit("HOT"))
      .otherwise(concat(lit("k"), (col("id") % 997).cast("string")))
      .as("k"),
    (col("id") * 5000L).as("rt"),
    (col("id") * 2L).as("v"))

  test("hot key through auto(): broadcast re-route, output == merge, " +
      "nulls and cold keys intact") {
    val plain = AsOfJoin.merge(leftDf, rightDf, "t", "rt",
      by = Seq("k" -> "k"), valueCols = Seq("v" -> "v"))
      .select("k", "t", "x", "v")
      .as[(String, Long, Long, Option[Long])].collect().toSet
    // broadcastThreshold=1 forces the big-right planning branch; the
    // sampler then detects HOT (60% of rows) and splits the plan
    val skewed = AsOfJoin.auto(leftDf, rightDf, "t", "rt",
      by = Seq("k" -> "k"), valueCols = Seq("v" -> "v"),
      broadcastThreshold = 1L, skewSampleFraction = 0.02)
    val plan = skewed.queryExecution.executedPlan.toString
    // both branches present: the cold tail keeps the merge exec, the
    // hot key rides a broadcast (its work spreads over all left
    // partitions instead of one reducer)
    assert(plan.contains("AsOfMergeJoin"), s"cold branch missing:\n$plan")
    assert(plan.toLowerCase.contains("broadcast"),
      s"hot branch not broadcast:\n$plan")
    val got = skewed.select("k", "t", "x", "v")
      .as[(String, Long, Long, Option[Long])].collect().toSet
    assert(got === plain)
    // a null-keyed left row survives on the cold branch (outer semantics)
    val lNull = leftDf.unionByName(
      Seq((null.asInstanceOf[String], 1L, -1L)).toDF("k", "t", "x"))
    val withNull = AsOfJoin.auto(lNull, rightDf, "t", "rt",
      by = Seq("k" -> "k"), valueCols = Seq("v" -> "v"),
      broadcastThreshold = 1L, skewSampleFraction = 0.02)
    assert(withNull.where(col("k").isNull).count() === 1L)
    assert(withNull.count() === 100001L)
  }

  test("mergeSalted == merge exactly; auto falls back to it when the " +
      "hot right history exceeds the broadcast row cap") {
    val plain = AsOfJoin.merge(leftDf, rightDf, "t", "rt",
      by = Seq("k" -> "k"), valueCols = Seq("v" -> "v"))
      .select("k", "t", "x", "v")
      .as[(String, Long, Long, Option[Long])].collect().toSet
    val salted = AsOfJoin.mergeSalted(leftDf, rightDf, "t", "rt",
      by = Seq("k" -> "k"), valueCols = Seq("v" -> "v"), salt = 8)
      .select("k", "t", "x", "v")
      .as[(String, Long, Long, Option[Long])].collect().toSet
    assert(salted === plain)
    // cap of 1 row forces the salted path for the HOT key; output still
    // identical, and no broadcast of the hot branch appears
    val viaAuto = AsOfJoin.auto(leftDf, rightDf, "t", "rt",
      by = Seq("k" -> "k"), valueCols = Seq("v" -> "v"),
      broadcastThreshold = 1L, skewSampleFraction = 0.02,
      hotBroadcastMaxRows = 1L)
    assert(viaAuto.select("k", "t", "x", "v")
      .as[(String, Long, Long, Option[Long])].collect().toSet === plain)
    val plan = viaAuto.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("broadcastexchange"),
      s"salted fallback must not broadcast the deep hot history:\n$plan")
  }

  test("skew probe is driver-bounded: a high-cardinality key space " +
      "collects ≤ 1/hotKeyFraction rows, and results cache per plan") {
    import graft.operators.SkewProbe
    // 200k rows over ~50k distinct keys, one planted hot key at 30%
    val wide = spark.range(200000).select(
      when(col("id") % 10 < 3, lit("HOT"))
        .otherwise(concat(lit("u"), (col("id") % 49999).cast("string")))
        .as("k"),
      col("id").as("x"))
    val frac = 0.2
    val (sampled, hotFrame) =
      SkewProbe.probeFrames(wide, col("k"), 0.05, frac)
    try {
      // the frame the driver collects is bounded by construction —
      // NOT by the number of distinct sampled keys (~tens of thousands)
      val n = hotFrame.count()
      assert(n <= math.ceil(1.0 / frac).toLong, s"collected $n rows")
      assert(hotFrame.collect().map(_.getString(0)).toSet === Set("HOT"))
    } finally { sampled.unpersist(false); () }
    // uniform keys: the bounded frame is empty, not ~50k rows
    val uniform = spark.range(200000).select(
      concat(lit("u"), (col("id") % 49999).cast("string")).as("k"))
    val (s2, h2) = SkewProbe.probeFrames(uniform, col("k"), 0.05, frac)
    try assert(h2.count() === 0L) finally { s2.unpersist(false); () }
    // driver-lifetime cache: the second call returns the cached result
    // (same instance) instead of re-sampling
    val a = SkewProbe.hotKeys(wide, "k", 0.05, frac)
    val b = SkewProbe.hotKeys(wide, "k", 0.05, frac)
    assert(a === Seq("HOT"))
    assert(a eq b)
  }

  test("no hot key detected: auto() keeps the single merge plan") {
    val uniform = spark.range(50000).select(
      concat(lit("k"), (col("id") % 997).cast("string")).as("k"),
      (col("id") * 1000L).as("t"), col("id").as("x"))
    val planned = AsOfJoin.auto(uniform, rightDf, "t", "rt",
      by = Seq("k" -> "k"), valueCols = Seq("v" -> "v"),
      broadcastThreshold = 1L, skewSampleFraction = 0.02)
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"))
    assert(!plan.toLowerCase.contains("broadcastexchange"),
      s"uniform keys must not split the plan:\n$plan")
  }
}
