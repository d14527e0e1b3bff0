package graft.schemas

import org.apache.spark.sql.types._

/** Explicit StructType constants for every feed in the reference's curated
  * layer (SURVEY.md §1.1). The reference infers everything as string and
  * repairs types per-job (`pyspark_ercot_load_latest_BQ_archive_csv.py:37,58-66`);
  * we declare the curated schemas up front and keep a repair path
  * ([[graft.operators.Normalize]]) that accepts all-string input, since that
  * is a capability the reference exercises.
  */
object Schemas {

  private def ts(n: String) = StructField(n, TimestampType)
  private def dec(n: String) = StructField(n, DecimalType(10, 2))
  private def flt(n: String) = StructField(n, FloatType)
  private def str(n: String) = StructField(n, StringType)

  /** ercot_load (latest & historical) — ref `...load_latest...py:58-66`. */
  val load: StructType = StructType(Seq(
    ts("time"), ts("interval_start"), ts("interval_end"), dec("load")))

  /** ercot_load_forecast — ref `...load_forecast...py:60-69`. */
  val loadForecast: StructType = StructType(Seq(
    ts("time"), ts("interval_start"), ts("interval_end"), ts("publish_time"),
    dec("north"), dec("south"), dec("west"), dec("houston"),
    dec("system_total")))

  /** ercot fuel mix — ref `...merge_fm_load...py:96`. */
  val fuelMix: StructType = StructType(Seq(
    ts("time"), dec("coal_and_lignite"), dec("hydro"), dec("nuclear"),
    dec("power_storage"), dec("solar"), dec("wind"), dec("natural_gas"),
    dec("other")))

  /** fuel_mix ⋈asof load — ref `...merge_fm_load...py:91-99`. */
  val fmLoadMerged: StructType = StructType(
    fuelMix.fields.toSeq ++ Seq(ts("interval_start"), ts("interval_end"),
      dec("load")))

  /** 15-min settlement point prices (raw headers) — ref `ercot_spp_csv.py:25-30`. */
  val sppRaw: StructType = StructType(Seq(
    str("Location"), str("Location Type"), str("Market"), str("SPP"),
    str("Time"), str("Interval Start"), str("Interval End")))

  /** live weather (raw headers) — ref `open_weather_live_data.py:58-67`. */
  val weatherLiveRaw: StructType = StructType(Seq(
    str("Location"), str("Temperature"), str("Temp_min"), str("Temp_max"),
    str("Pressure"), str("Humidity"), str("Wind Speed"), str("Date")))

  /** spp ⋈interval weather — ref `test_pyspark_merge_spp_weather.py:62-75`. */
  val sppWeatherMerged: StructType = StructType(Seq(
    str("Location"), flt("Temperature"), flt("Temp_min"), flt("Temp_max"),
    flt("Pressure"), flt("Humidity"), flt("Wind_Speed"),
    ts("Weather_Timestamp"), flt("SPP"), ts("Price_Time"),
    ts("Price_Interval_Start"), ts("Price_Interval_End")))

  /** historical hourly weather — ref `mergeHistoricalWeather.py:71-91`
    * (the repo's single explicitly-declared schema).
    */
  val historicalWeather: StructType = StructType(
    Seq(str("zone"), flt("latitude"), flt("longitude"), ts("date")) ++
      Seq("temperature_2m", "relative_humidity_2m", "dew_point_2m",
        "precipitation", "rain", "snowfall", "cloud_cover",
        "cloud_cover_low", "cloud_cover_mid", "cloud_cover_high",
        "wind_speed_10m", "wind_speed_100m", "wind_direction_10m",
        "wind_direction_100m", "wind_gusts_10m").map(flt))

  /** All-string twin of a schema — the shape every raw CSV scan produces
    * (ref reads with header=true and no schema, so all columns are strings).
    */
  def rawStrings(s: StructType): StructType =
    StructType(s.fields.map(f => StructField(f.name, StringType, nullable = true)))

  /** Cast map for [[graft.operators.Normalize.castColumns]]: every non-string
    * column of the curated schema, keyed by name — the "repair" plan that
    * turns a raw all-string scan into the curated types.
    */
  def castsOf(s: StructType): Map[String, DataType] =
    s.fields.collect {
      case f if f.dataType != StringType => f.name -> f.dataType
    }.toMap
}
