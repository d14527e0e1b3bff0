package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Analytics

/** OHLC bars are stream-transferable through the windowed variant: the
  * SAME operator call over a watermarked stream emits, in append mode,
  * exactly the batch bars for every window the watermark has closed —
  * and the windowed variant agrees with the long-bucket ohlcBars.
  */
class OhlcStreamSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("ts", TimestampType), StructField("value", DoubleType)))

  test("streamed OHLC equals the batch operator on closed windows") {
    val dir = Files.createTempDirectory("ohlc_src")
    val rows = (0 until 50).map { i =>
      val mm = "%02d".format(i % 60)
      s"$i,${i % 3},2024-05-01 00:$mm:${"%02d".format((i * 7) % 60)},${(i * 13 % 40)}.5"
    }
    Files.writeString(dir.resolve("b1.csv"),
      "event_id,user_id,ts,value\n" + rows.mkString("\n") + "\n")

    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
      .withWatermark("ts", "10 minutes")
    val q = Analytics.ohlcBarsWindowed(stream, Seq("user_id"), "ts",
      "value", "15 minutes", tieBreak = Seq("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ohlc_out").start()
    q.processAllAvailable()
    // a far-future tick closes every batch-1 window
    Files.writeString(dir.resolve("b2.csv"),
      "event_id,user_id,ts,value\n999,9,2024-05-01 06:00:00,1.0\n")
    q.processAllAvailable()
    q.stop()

    val sealedUpTo = java.sql.Timestamp.valueOf("2024-05-01 01:00:00")
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .where(col("window_end") <= lit(sealedUpTo))
      .select("window_start", "user_id", "open", "high", "low", "close", "n")
      .orderBy("window_start", "user_id").collect().toSeq

    val got = shape(spark.table("ohlc_out"))
    val batch = spark.read.option("header", "true").schema(schema)
      .csv(dir.toString).where(col("event_id") =!= 999L)
    val want = shape(Analytics.ohlcBarsWindowed(batch, Seq("user_id"),
      "ts", "value", "15 minutes", tieBreak = Seq("event_id")))
    assert(got.nonEmpty, "expected closed windows")
    assert(got === want)

    // the windowed variant is the long-bucket operator in disguise:
    // window_start == bucket · width for epoch-aligned widths
    val viaBuckets = Analytics.ohlcBars(batch, Seq("user_id"), "ts",
      "value", bucketMicros = 15L * 60 * 1000000, tieBreak = Seq("event_id"))
      .withColumn("window_start",
        timestamp_micros(col("bucket") * (15L * 60 * 1000000)))
      .select("window_start", "user_id", "open", "high", "low", "close", "n")
      .where(col("window_start") < lit(sealedUpTo))
      .orderBy("window_start", "user_id").collect().toSeq
    assert(viaBuckets === want)
  }
}
