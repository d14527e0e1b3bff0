package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf-scaled generators for the reference's energy feed CSVs
  * (FIXTURES.md §A: ercot load / fuel mix / SPP / live weather / historical
  * weather), so the six reference pipeline compositions in [[Jobs]] can be
  * BENCHMARKED end-to-end at the same scale factors as the TPC-H-ish
  * analogs — the reference's actual workloads, not just their stand-ins.
  *
  * Everything derives from splitmix64/xxhash64 of the row index: same sf →
  * byte-identical CSVs, no RNG state. Dirt is seeded at the reference
  * feeds' observed rates (FIXTURES.md: ~5% null cells, ~5% exact dups,
  * ~2% unparseable strings) so the cleaning path does real work.
  */
object EnergyFixtures {

  /** epoch-seconds of 2024-01-01 00:00:00 UTC — fixture time origin */
  private val T0 = 1704067200L
  private val Zones = Seq("LZ_HOUSTON", "LZ_WEST", "LZ_SOUTH", "LZ_NORTH")

  /** Deterministic double in [0, 1) keyed on (id, salt). */
  private def u(id: Column, salt: Int): Column =
    pmod(xxhash64(id, lit(salt)), lit(1000000L)).cast("double") / 1000000.0

  /** `ts` (epoch seconds) → "yyyy-MM-dd HH:mm:ss" (UTC wall clock). */
  private def fmtUtc(sec: Column): Column =
    date_format(timestamp_seconds(sec), "yyyy-MM-dd HH:mm:ss")

  /** `ts` → "yyyy-MM-dd HH:mm:ss-05:00": the reference's offset-bearing
    * form (SPP/weather feeds, parsed with pattern `yyyy-MM-dd HH:mm:ssXXX`).
    * Same instant, rendered as UTC-5 wall clock + explicit offset.
    */
  private def fmtOffset(sec: Column): Column =
    concat(date_format(timestamp_seconds(sec - 5 * 3600), "yyyy-MM-dd HH:mm:ss"),
      lit("-05:00"))

  /** ~`rate`% of rows get `dirty` instead of `clean` (unparseable / null). */
  private def dirt(id: Column, salt: Int, rate: Double,
      clean: Column, dirty: Column): Column =
    when(u(id, salt) < rate, dirty).otherwise(clean)

  /** Append ~5% exact-duplicate rows (re-delivered feed lines). */
  private def withDups(df: DataFrame, id: Column): DataFrame =
    df.unionAll(df.where(u(id, 99) < 0.05))

  /** a3: fuel mix — 5-min cadence, 8 MW measures, one file set. */
  def fuelMix(spark: SparkSession, dir: String, rows: Long): Unit = {
    val base = spark.range(rows).select(
      (dirt(col("id"), 1, 0.02,
        fmtUtc(lit(T0) + col("id") * 300), lit("not-a-date")).as("Time") +:
        measures(col("id"))): _*)
    writeCsv(withDups(base, xxhash64(col("Time"))), dir)
  }

  private def measures(id: Column): Seq[Column] = Seq(
    ("Coal and Lignite", 8000.0, 4000.0), ("Hydro", 100.0, 300.0),
    ("Nuclear", 5000.0, 200.0), ("Power Storage", 0.0, 500.0),
    ("Solar", 0.0, 8000.0), ("Wind", 2000.0, 18000.0),
    ("Natural Gas", 8000.0, 25000.0), ("Other", 50.0, 100.0))
    .zipWithIndex.map { case ((name, lo, span), i) =>
      dirt(id, 10 + i, 0.005,
        format_string("%.2f", lit(lo) + u(id, 20 + i) * span),
        when(u(id, 40 + i) < 0.5, lit("garbage")).otherwise(lit(null)))
        .as(name)
    }

  /** a1: hourly load with 1-hour intervals. */
  def load(spark: SparkSession, dir: String, rows: Long): Unit = {
    val hour = lit(T0) + col("id") * 3600
    val base = spark.range(rows).select(
      dirt(col("id"), 2, 0.02, fmtUtc(hour), lit("not-a-date")).as("Time"),
      fmtUtc(hour).as("Interval Start"),
      fmtUtc(hour + 3600).as("Interval End"),
      dirt(col("id"), 3, 0.03,
        format_string("%.2f", lit(30000.0) + u(col("id"), 4) * 45000.0),
        when(u(col("id"), 5) < 0.5, lit("garbage")).otherwise(lit(null)))
        .as("Load"))
    writeCsv(withDups(base, xxhash64(col("Time"))), dir)
  }

  /** a4: 15-min settlement point prices, 4 zones, offset timestamps. */
  def spp(spark: SparkSession, dir: String, intervals: Long): Unit = {
    val zone = element_at(typedlit(Zones), (pmod(col("id"), lit(4)) + 1).cast("int"))
    val start = lit(T0) + (col("id") / 4).cast("long") * 900
    val base = spark.range(intervals * 4).select(
      zone.as("Location"),
      lit("LZ").as("Location Type"),
      lit("RTM").as("Market"),
      // occasionally negative prices, rarely garbage
      dirt(col("id"), 6, 0.02,
        format_string("%.2f", u(col("id"), 7) * 120.0 - 10.0), lit("garbage"))
        .as("SPP"),
      fmtOffset(start + 900).as("Time"), // posted at interval end
      fmtOffset(start).as("Interval Start"),
      fmtOffset(start + 900).as("Interval End"))
    writeCsv(withDups(base, xxhash64(col("Location"), col("Interval Start"))), dir)
  }

  /** a5: quarter-hourly live weather, 4 zones; `Date` falls INSIDE the
    * SPP intervals, landing exactly on an interval boundary every 8th
    * reading (the inclusive-bound edge case, SURVEY §7.4.6).
    */
  def weather(spark: SparkSession, dir: String, readings: Long): Unit = {
    val id = col("id")
    val zone = element_at(typedlit(Zones), (pmod(id, lit(4)) + 1).cast("int"))
    val slot = (id / 4).cast("long")
    val offset = when(pmod(slot, lit(8)) === 0, lit(0L)) // exact boundary
      .otherwise((u(id, 8) * 899).cast("long") + 1)
    val t = lit(T0) + slot * 900 + offset
    def m(name: String, lo: Double, span: Double, salt: Int): Column =
      dirt(id, salt, 0.03, format_string("%.2f", lit(lo) + u(id, salt + 50) * span),
        when(u(id, salt + 60) < 0.5, lit("garbage")).otherwise(lit(null)))
        .as(name)
    val base = spark.range(readings * 4).select(
      zone.as("Location"),
      m("Temperature", 40.0, 60.0, 9), m("Temp_min", 30.0, 50.0, 10),
      m("Temp_max", 50.0, 60.0, 11), m("Pressure", 990.0, 40.0, 12),
      m("Humidity", 20.0, 80.0, 13), m("Wind Speed", 0.0, 40.0, 14),
      fmtOffset(t).as("Date"))
    writeCsv(withDups(base, xxhash64(col("Location"), col("Date"))), dir)
  }

  /** a6: hourly historical weather — one CSV per zone (SET1 union). */
  def historicalWeather(spark: SparkSession, dir: String,
      hoursPerZone: Long): Unit = {
    val cols = Seq("temperature_2m", "relative_humidity_2m", "dew_point_2m",
      "precipitation", "rain", "snowfall", "cloud_cover", "cloud_cover_low",
      "cloud_cover_mid", "cloud_cover_high", "wind_speed_10m",
      "wind_speed_100m", "wind_direction_10m", "wind_direction_100m",
      "wind_gusts_10m")
    Zones.zipWithIndex.foreach { case (z, zi) =>
      val id = col("id")
      val base = spark.range(hoursPerZone).select(
        (lit(z).as("zone") +:
          format_string("%.4f", lit(29.0) + u(id, 15) * 3.0).as("latitude") +:
          format_string("%.4f", lit(-98.0) + u(id, 16) * 4.0).as("longitude") +:
          fmtUtc(lit(T0) + id * 3600).as("date") +:
          cols.zipWithIndex.map { case (c, i) =>
            dirt(id, 70 + i + zi, 0.02,
              format_string("%.2f", u(id, 100 + i + zi) * 100.0), lit(null)).as(c)
          }): _*)
      // one FLAT file per zone: folderHasFiles/csvFolderRaw scan files
      // directly in the dir, not subdirectories
      writeCsvFlat(base, dir, s"zone_$z.csv")
    }
  }

  /** Write as a single flat `dir/name` CSV (Spark writes a directory; the
    * lone part file is moved up and the directory removed).
    */
  private def writeCsvFlat(df: DataFrame, dir: String, name: String): Unit = {
    val spark = df.sparkSession
    val tmp = s"$dir/_tmp_$name"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .find(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
    val dst = new org.apache.hadoop.fs.Path(dir, name)
    fs.delete(dst, false)
    if (!fs.rename(part.getPath, dst))
      throw new java.io.IOException(s"rename ${part.getPath} -> $dst failed")
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  /** One-call generation of every feed at a TPC-H-ish scale factor:
    * sf0.1 ≈ 50k 5-min fuel-mix rows (~6 months), hourly load, 15-min
    * SPP/weather over the same span, 4 hourly historical-weather files.
    */
  def generateAll(spark: SparkSession, root: String, sf: Double): Unit = {
    val fmRows = math.max((sf * 500000).toLong, 1000L)
    val hours = fmRows * 300 / 3600
    val quarters = fmRows * 300 / 900
    fuelMix(spark, s"$root/fuel_mix", fmRows)
    load(spark, s"$root/load", hours)
    spp(spark, s"$root/spp", quarters)
    weather(spark, s"$root/weather", quarters)
    historicalWeather(spark, s"$root/hist_weather", hours)
  }

  private def writeCsv(df: DataFrame, dir: String): Unit =
    df.coalesce(4).write.mode("overwrite")
      .option("header", "true").csv(dir)
}
