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
    val results = picked.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // record the failure instead of benching it as ~0 s; keep the
        // first message line (truncated)
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable => record(name, e)
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    // End-to-end benches of the reference's ACTUAL pipelines (fm/load
    // as-of merge, SPP/weather interval merge, historical-weather union)
    // over sf-scaled energy-feed fixtures — not just the TPC-H analogs.
    // Jobs archive their sources, so each timed run gets fresh fixtures
    // (generation is NOT in the timed window). Disable: SPARK_GRAFT_JOBS=0.
    val jobResults: Map[String, Double] =
      if (sys.env.getOrElse("SPARK_GRAFT_JOBS", "1") == "0" || only.isDefined)
        Map.empty
      else {
        val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
          .map(_.group(1).toDouble).getOrElse(0.01)
        val root = java.nio.file.Files
          .createTempDirectory("graft_bench_energy").toString
        def timed(name: String)(body: => Unit): (String, Double) = {
          val t0 = System.nanoTime()
          try body catch { case e: Throwable => record(name, e) }
          name -> (System.nanoTime() - t0) / 1e9
        }
        jobs.EnergyFixtures.generateAll(spark, root, sfNum)
        Map(
          timed("job_fm_load_merge") {
            jobs.Jobs.fmLoadMerge(spark, s"$root/fuel_mix", s"$root/load",
              s"$root/arch_fm", s"$root/arch_load", s"$root/lake_fm_load")
          },
          timed("job_spp_weather_merge") {
            jobs.Jobs.sppWeatherMerge(spark, s"$root/spp", s"$root/weather",
              s"$root/arch_spp", s"$root/arch_weather", s"$root/lake_spp_weather")
          },
          timed("job_hist_weather_union") {
            jobs.Jobs.historicalWeatherUnion(spark, s"$root/hist_weather",
              s"$root/lake_hist", csvOutDir = Some(s"$root/hist_csv"))
          })
      }
    val qs = (results ++ jobResults).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val all = results ++ jobResults
    val total = if (all.nonEmpty) all.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
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
