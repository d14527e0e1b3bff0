package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Analytics
import graft.streaming.PageHinkleyStream

/** Streaming Page–Hinkley: watermark-sealed drift alarms equal the
  * batch operator (ts17's window closed form) bit-for-bit on the
  * sealed range, from O(1) per-key state.
  */
class PageHinkleyStreamSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_id", LongType),
    StructField("ts", TimestampType), StructField("value", DoubleType)))

  private def mm(i: Int) = "%02d".format(i)

  test("stream alarms equal the batch Page-Hinkley on the sealed range") {
    val dir = Files.createTempDirectory("ph_src")
    // user 1: flat, then an upward mean shift the self-referenced mean
    // lags behind; user 2: the mirrored downward shift; user 3: flat
    val rows =
      (1 to 20).map(i => s"1,$i,2024-05-01 00:${mm(i)}:00,5.0") ++
      (21 to 40).map(i => s"1,$i,2024-05-01 00:${mm(i)}:00,9.0") ++
      (1 to 20).map(i => s"2,${100 + i},2024-05-01 00:${mm(i)}:00,5.0") ++
      (21 to 40).map(i => s"2,${100 + i},2024-05-01 00:${mm(i)}:00,1.0") ++
      (1 to 30).map(i => s"3,${200 + i},2024-05-01 00:${mm(i)}:00,5.0") ++
      // poisoned rows: excluded by the shared observation contract
      Seq("1,60,2024-05-01 00:41:00,NaN",
        "1,61,2024-05-01 00:42:00,",
        "1,62,2024-05-01 00:43:00,1.0E17")
    Files.writeString(dir.resolve("b1.csv"),
      "user_id,event_id,ts,value\n" + rows.mkString("\n") + "\n")

    val lambda = new java.math.BigDecimal("15.00")

    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
    val alarms = PageHinkleyStream.alarms(spark, stream, "ts", "value",
      delta = 0.25, lambda = lambda, watermark = "10 minutes")
    val q = alarms.toDF().writeStream.outputMode("append")
      .format("memory").queryName("ph_out").start()
    q.processAllAvailable()
    Files.writeString(dir.resolve("b2.csv"),
      "user_id,event_id,ts,value\n99,999,2024-05-01 06:00:00,5.0\n")
    q.processAllAvailable()
    Files.writeString(dir.resolve("b3.csv"),
      "user_id,event_id,ts,value\n99,1000,2024-05-01 06:00:01,5.0\n")
    q.processAllAvailable()
    q.stop()

    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("event_id"), col("value"),
        col("ph_pos"), col("ph_neg"), col("side"))
      .orderBy("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getString(5))).toSeq

    val got = shape(spark.table("ph_out"))
    val batchDf = spark.read.option("header", "true").schema(schema)
      .csv(dir.toString)
      .where(col("user_id") =!= 99L)
    val want = shape(Analytics.pageHinkley(batchDf, Seq("user_id"),
      "ts", "value", delta = 0.25, lambda = lambda,
      tieBreak = Seq("event_id")))

    assert(got.nonEmpty, "expected alarms")
    assert(got === want)
    assert(got.exists(_._6 == "hi") && got.exists(_._6 == "lo"),
      "both drift directions must fire")
    assert(!got.exists(_._1 == 3L), "the flat key never alarms")
  }

  test("parameter contracts are enforced") {
    val df = spark.readStream.option("header", "true").schema(schema)
      .csv(Files.createTempDirectory("ph_empty").toString)
    intercept[IllegalArgumentException] {
      PageHinkleyStream.alarms(spark, df, "ts", "value",
        delta = 0.5, lambda = new java.math.BigDecimal("10.001"))
    }
    intercept[IllegalArgumentException] {
      PageHinkleyStream.alarms(spark, df, "ts", "value",
        delta = -0.1, lambda = new java.math.BigDecimal("10.00"))
    }
  }
}
