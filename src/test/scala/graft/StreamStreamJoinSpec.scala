package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.IntervalJoin

/** Stream-stream point-in-interval join: the reference's weather⋈prices
  * merge (J1) with BOTH sides continuous. The same
  * `IntervalJoin.pointInInterval` composition works unchanged — Spark
  * accepts stream-stream equi joins whose residual bounds event-time
  * ranges, with watermarks limiting buffered state on both sides.
  */
class StreamStreamJoinSpec extends SparkTestBase {

  test("both sides streaming: equi + BETWEEN joins within watermark bounds") {
    val wDir = Files.createTempDirectory("ss_weather")
    val pDir = Files.createTempDirectory("ss_prices")
    Files.writeString(wDir.resolve("w1.csv"),
      """location,w_ts,temp
        |LZ_WEST,2024-05-01 00:20:00,75.2
        |LZ_WEST,2024-05-01 00:50:00,76.0
        |LZ_SOUTH,2024-05-01 00:20:00,80.1
        |""".stripMargin)
    Files.writeString(pDir.resolve("p1.csv"),
      """location,start,end,spp
        |LZ_WEST,2024-05-01 00:15:00,2024-05-01 00:30:00,21.5
        |LZ_WEST,2024-05-01 00:45:00,2024-05-01 01:00:00,22.0
        |""".stripMargin)

    val wSchema = StructType(Seq(StructField("location", StringType),
      StructField("w_ts", TimestampType), StructField("temp", DoubleType)))
    val pSchema = StructType(Seq(StructField("location", StringType),
      StructField("start", TimestampType), StructField("end", TimestampType),
      StructField("spp", DoubleType)))

    val weather = spark.readStream.option("header", "true")
      .schema(wSchema).csv(wDir.toString)
      .withWatermark("w_ts", "1 hour")
    val prices = spark.readStream.option("header", "true")
      .schema(pSchema).csv(pDir.toString)
      .withColumnRenamed("location", "p_location")
      .withWatermark("start", "1 hour")

    val joined = IntervalJoin.pointInInterval(
      weather, prices,
      col("w_ts"), col("start"), col("end"),
      Seq((col("location"), col("p_location"))))
      .select(col("location"), col("w_ts"), col("temp"), col("spp"))

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join_out").start()
    q.processAllAvailable()

    // late-arriving price interval (within watermark) still matches a
    // buffered weather row from the earlier batch
    Files.writeString(pDir.resolve("p2.csv"),
      """location,start,end,spp
        |LZ_SOUTH,2024-05-01 00:15:00,2024-05-01 00:30:00,30.0
        |""".stripMargin)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ss_join_out")
      .select("temp", "spp").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(got === Set((75.2, 21.5), (76.0, 22.0), (80.1, 30.0)))
  }
}
