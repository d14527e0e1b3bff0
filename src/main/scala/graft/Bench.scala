package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/whole-stage-codegen warmup at the smallest scale factor so the
    // timed runs measure engine throughput, not first-call JVM compilation
    // (cold-vs-warm delta is ~3s/query for codegen-heavy plans).
    val warmDir = {
      val w = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (w.exists) w.toString else sfDir
    }
    // Optional comma-separated query filter + repeat count for profiling
    // single queries (SPARK_GRAFT_ONLY=j4_overlap SPARK_GRAFT_REPS=3).
    // Default reps=2: min-of-N so one contended run can't poison the
    // artifact (timed run 1 doubles as extra warmup for run 2).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val picked = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) }
    // A query failing warmup is NOT swallowed — it will surface in the
    // timed loop's error capture below (warmup errors alone are ignored
    // so a flaky first-touch doesn't double-report).
    picked.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => }
    }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // JSON-safe error capture: escape backslash, quote, and ALL control
    // chars — a tab or stray \r in a Spark message would otherwise break
    // the one-line JSON artifact exactly when a failure needed reporting
    def jsonEscape(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def record(name: String, e: Throwable): Unit =
      errors.getOrElseUpdate(name, jsonEscape(
        e.getClass.getSimpleName + ": " +
          Option(e.getMessage).getOrElse("").linesIterator.take(1)
            .mkString.take(200)))
    // A failed rep records its error and yields no time: a query that
    // threw must not land a near-zero elapsed in the min or the total
    // (ADVICE r3) — only queries that actually ran report numbers.
    val results: Seq[(String, Double)] = picked.toSeq.flatMap {
      case (name, fn) =>
        val times = (1 to reps).flatMap { _ =>
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable => record(name, e); None }
        }
        if (times.isEmpty) None else Some(name -> times.min)
    }
    // End-to-end benches of the reference's ACTUAL pipelines (fm/load
    // as-of merge, SPP/weather interval merge, historical-weather union)
    // over sf-scaled energy-feed fixtures — not just the TPC-H analogs.
    // Jobs archive their sources, so each timed run gets fresh fixtures
    // (generation is NOT in the timed window). Disable: SPARK_GRAFT_JOBS=0.
    val jobResults: Seq[(String, Double)] =
      if (sys.env.getOrElse("SPARK_GRAFT_JOBS", "1") == "0" || only.isDefined)
        Seq.empty
      else {
        val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
          .map(_.group(1).toDouble).getOrElse(0.01)
        // min-of-N like the queries: jobs archive their sources, so each
        // rep gets a fresh fixture root (generation stays untimed). One
        // contended run must not poison the artifact (BENCH_r03's job_*
        // entries read 30 s for jobs that run in ~2 s warm).
        val perJob = scala.collection.mutable.LinkedHashMap
          .empty[String, List[Double]]
        def timed(name: String)(body: => Unit): Unit = {
          val t0 = System.nanoTime()
          try {
            body
            val dt = (System.nanoTime() - t0) / 1e9
            perJob(name) = dt :: perJob.getOrElse(name, Nil)
          } catch { case e: Throwable => record(name, e) }
        }
        val jobReps = math.max(1, math.min(reps, 2))
        (1 to jobReps).foreach { _ =>
          val root = java.nio.file.Files
            .createTempDirectory("graft_bench_energy").toString
          jobs.EnergyFixtures.generateAll(spark, root, sfNum)
          timed("job_fm_load_merge") {
            jobs.Jobs.fmLoadMerge(spark, s"$root/fuel_mix", s"$root/load",
              s"$root/arch_fm", s"$root/arch_load", s"$root/lake_fm_load")
          }
          timed("job_spp_weather_merge") {
            jobs.Jobs.sppWeatherMerge(spark, s"$root/spp", s"$root/weather",
              s"$root/arch_spp", s"$root/arch_weather", s"$root/lake_spp_weather")
          }
          timed("job_hist_weather_union") {
            jobs.Jobs.historicalWeatherUnion(spark, s"$root/hist_weather",
              s"$root/lake_hist", csvOutDir = Some(s"$root/hist_csv"))
          }
        }
        perJob.toSeq.map { case (n, ts) => n -> ts.min }
      }
    val all = results ++ jobResults
    val total = if (all.nonEmpty) all.map(_._2).sum else 0.0
    val errs = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    def jsonLine(fmt: Double => String, sf: String): String = {
      val qs = all.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sf"}"""
    }
    // Two copies of the ONE-line contract: a full-precision line for
    // whole-stdout parsers, then a compact 2-decimal line LAST so it fits
    // entirely inside a trailing 2000-char stdout capture (the r1-r3
    // artifacts stored only a tail and the full line overflowed it).
    println(jsonLine(_.toString, sfDir))
    println(jsonLine(v => f"$v%.2f", new java.io.File(sfDir).getName))
    spark.stop()
    // a silent catch here would let a broken query report as success with a
    // near-zero time — non-empty error set fails the whole run visibly
    if (errors.nonEmpty) {
      System.err.println(s"BENCH FAILED: ${errors.size} queries threw: " +
        errors.keys.mkString(", "))
      sys.exit(1)
    }
  }
}
