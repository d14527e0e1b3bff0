package graft.jobs

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Runnable end-to-end demo of the reference pipelines on dirty synthetic
  * CSVs (FIXTURES.md family A): single-folder ELT, as-of merge, interval
  * merge, union job, plus the Structured-Streaming AvailableNow drain.
  * Usage: `sbt "runMain graft.jobs.PipelineDemo"`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def tmp(): Path = Files.createTempDirectory("graft_demo")
    def write(dir: Path, name: String, content: String): Unit =
      Files.writeString(dir.resolve(name), content)

    val loadCsv =
      """Time,Interval Start,Interval End,Load
        |2024-05-01 00:00:00,2024-05-01 00:00:00,2024-05-01 01:00:00,42000.55
        |2024-05-01 01:00:00,2024-05-01 01:00:00,2024-05-01 02:00:00,45123.10
        |2024-05-01 01:00:00,2024-05-01 01:00:00,2024-05-01 02:00:00,45123.10
        |2024-05-01 02:00:00,2024-05-01 02:00:00,2024-05-01 03:00:00,
        |not-a-date,2024-05-01 03:00:00,2024-05-01 04:00:00,47000.00
        |2024-05-01 05:00:00,2024-05-01 05:00:00,2024-05-01 06:00:00,51000.10
        |""".stripMargin
    val fmCsv =
      """Time,Coal and Lignite,Hydro,Nuclear,Power Storage,Solar,Wind,Natural Gas,Other
        |2024-05-01 00:02:00,9000.1,200.2,5000.0,10.5,3000.0,12000.0,20000.0,100.0
        |2024-05-01 01:03:00,9200.1,220.2,5000.0,12.5,3200.0,12200.0,20200.0,102.0
        |""".stripMargin
    val loadCasts: Map[String, DataType] = Map(
      "time" -> TimestampType, "interval_start" -> TimestampType,
      "interval_end" -> TimestampType, "load" -> DecimalType(10, 2))

    // 1. single-folder ELT (dirty rows vanish, dedup, archive)
    val src1 = tmp(); write(src1, "load_1.csv", loadCsv)
    val r1 = Jobs.singleFolderElt(spark, src1.toString, tmp().toString,
      tmp().resolve("lake").toString, loadCasts, dedup = true)
    println(s"[demo] singleFolderElt rows=${r1.get} (6 raw -> 3 clean)")

    // 2. fuel-mix asof load merge
    val fmDir = tmp(); write(fmDir, "fm_1.csv", fmCsv)
    val loadDir = tmp(); write(loadDir, "load_1.csv", loadCsv)
    val r2 = Jobs.fmLoadMerge(spark, fmDir.toString, loadDir.toString,
      tmp().toString, tmp().toString, tmp().resolve("lake").toString)
    println(s"[demo] fmLoadMerge rows=${r2.get} (backward as-of, exact-match, dropna)")

    // 3. spp interval-join weather merge
    val sppDir = tmp()
    write(sppDir, "spp_1.csv",
      """Location,Location Type,Market,SPP,Time,Interval Start,Interval End
        |LZ_WEST,Load Zone,REAL_TIME_15_MIN,21.55,2024-05-01 00:30:00-05:00,2024-05-01 00:15:00-05:00,2024-05-01 00:30:00-05:00
        |""".stripMargin)
    val wDir = tmp()
    write(wDir, "weather_1.csv",
      """Location,Temperature,Temp_min,Temp_max,Pressure,Humidity,Wind Speed,Date
        |LZ_WEST,75.2,70.0,80.0,1013.0,55.0,12.5,2024-05-01 00:15:00-05:00
        |LZ_WEST,75.4,70.0,80.0,1013.0,54.0,12.0,2024-05-01 00:31:00-05:00
        |""".stripMargin)
    val r3 = Jobs.sppWeatherMerge(spark, sppDir.toString, wDir.toString,
      tmp().toString, tmp().toString, tmp().resolve("lake").toString)
    println(s"[demo] sppWeatherMerge rows=${r3.get} (closed-interval containment)")

    // 4. streaming AvailableNow drain, run twice (exactly-once)
    val src4 = tmp(); write(src4, "load_1.csv", loadCsv)
    val lake4 = tmp().resolve("lake").toString
    val ckpt = tmp().toString
    val rawSchema = StructType(Seq("Time", "Interval Start", "Interval End",
      "Load").map(StructField(_, StringType)))
    graft.streaming.AvailableNowJobs.singleFolderElt(spark, src4.toString,
      tmp().toString, lake4, ckpt, rawSchema, loadCasts)
    graft.streaming.AvailableNowJobs.singleFolderElt(spark, src4.toString,
      tmp().toString, lake4, ckpt, rawSchema, loadCasts)
    println(s"[demo] streaming AvailableNow x2 rows=${spark.read.parquet(lake4).count()} (no double-processing)")

    spark.stop()
  }
}
