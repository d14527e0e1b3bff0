package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Per-key DEPTH scale probe — the axis the sf0.01→sf0.1 sweep cannot
  * see. `tools/scalecheck.py` grows row count 10× but key cardinality
  * grows with it, so per-key series stay shallow; an operator that is
  * quadratic IN KEY DEPTH (the r13 smoother-fold defect) sails through
  * that sweep and dies on the first years-deep sensor key in
  * production. This main synthesizes ONE key whose series is `n` then
  * `10·n` observations, times every per-key sequential/fold operator at
  * both depths, and prints one JSON line of
  * `{"op": {"small": s, "big": s, "ratio": r}}` — linear folds land
  * near ~10× (usually far less: fixed overheads amortize), a per-key
  * quadratic lands near ~100×. Driven by
  * `tools/scalecheck.py --longkey`, which flags ratios past its bound.
  *
  * Env: SPARK_GRAFT_LONGKEY_N (base depth, default 20000) — the 10×
  * depth must stay under mannKendall's loud 1M/key bound.
  */
object LongKeyCheck {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_LONGKEY_N", "20000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // one deep key: ts strictly increasing (seconds), deterministic
    // pseudo-series measure with repeated values (exercises tie paths)
    def series(depth: Int): DataFrame =
      spark.range(depth.toLong).select(
        lit(1L).as("k"),
        timestamp_seconds(lit(1700000000L) + col("id")).as("ts"),
        col("id").as("eid"),
        ((col("id") * 131 % 997).cast("double") / lit(4.0)).as("v"))

    // KM wants subjects: one cohort, `depth` subjects over `depth`
    // distinct times (the curve's own length is the fold depth)
    def subjects(depth: Int): DataFrame =
      spark.range(depth.toLong).select(
        lit("c").as("cohort"), col("id").as("t"),
        (col("id") % 5 =!= 0).as("ev"))

    val ops: Seq[(String, Int => DataFrame)] = Seq(
      "ewma" -> (d => Analytics.ewma(series(d), Seq("k"), "ts", "v", 0.3,
        tieBreak = Seq("eid"))),
      "holt" -> (d => Analytics.holt(series(d), Seq("k"), "ts", "v",
        0.3, 0.1, tieBreak = Seq("eid"))),
      "holt_winters" -> (d => Analytics.holtWinters(series(d), Seq("k"),
        "ts", "v", 0.3, 0.1, 0.05, period = 24, tieBreak = Seq("eid"))),
      "kaplan_meier" -> (d => Analytics.kaplanMeier(subjects(d),
        Seq("cohort"), "t", "ev")),
      "mann_kendall" -> (d => Analytics.mannKendall(series(d), "k", "ts",
        "v", "eid")),
      "cusum" -> (d => Analytics.cusum(series(d), Seq("k"), "ts", "v",
        new java.math.BigDecimal("120.00"), new java.math.BigDecimal("5.00"),
        new java.math.BigDecimal("400.00"), tieBreak = Seq("eid"))),
      "page_hinkley" -> (d => Analytics.pageHinkley(series(d), Seq("k"),
        "ts", "v", 2.0, new java.math.BigDecimal("300.00"),
        tieBreak = Seq("eid"))),
      "rolling_z" -> (d => Analytics.rollingZScoreAnomalies(series(d),
        Seq("k"), "ts", "v", lookback = 48, zThreshold = 3.0,
        tieBreak = Seq("eid"))),
      "autocorrelation" -> (d => Analytics.autocorrelation(series(d),
        Seq("k"), "ts", "v", maxLag = 5, tieBreak = Seq("eid"))),
      "ljung_box" -> (d => Analytics.ljungBox(series(d), Seq("k"), "ts",
        "v", maxLag = 5, tieBreak = Seq("eid"))),
      "nelson_aalen" -> (d => Analytics.nelsonAalen(subjects(d),
        Seq("cohort"), "t", "ev")),
      // PAV is the newest member of the per-key-fold family (r15); its
      // pooling stack is O(m) pushes/merges — depth tier keeps it honest
      "isotonic" -> (d => Analytics.isotonicFit(series(d), Seq("k"),
        "ts", "v", tieBreak = Seq("eid")))
    )

    def time(fn: Int => DataFrame, depth: Int): Double = {
      val t0 = System.nanoTime()
      fn(depth).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Locale.ROOT formatting: f"%.3f" renders comma decimals on some
    // JVM locales and breaks the JSON consumer (the Bench artifact had
    // the same latent bug — ADVICE r13)
    def num(v: Double, places: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${places}f",
        Double.box(v))
    val entries = ops.map { case (name, fn) =>
      time(fn, math.max(200, n / 10)) // warmup: JIT + codegen at tiny depth
      val small = time(fn, n)
      val big = time(fn, 10 * n)
      val ratio = if (small > 0) big / small else -1.0
      "  \"" + name + "\": {\"small\": " + num(small, 3) +
        ", \"big\": " + num(big, 3) + ", \"ratio\": " + num(ratio, 2) + "}"
    }
    println("{\"n\": " + n + ", \"ops\": {\n" + entries.mkString(",\n") +
      "\n}}")
    spark.stop()
  }
}
