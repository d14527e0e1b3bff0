package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Analytics
import graft.streaming.AnomalyStream

/** Streaming rolling z-score anomalies: watermark-sealed scoring equals
  * the batch operator on the sealed range; exactly-once emission.
  */
class AnomalyStreamSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_id", LongType),
    StructField("ts", TimestampType), StructField("value", DoubleType)))

  test("stream flags exactly the batch operator's anomalies on the sealed range") {
    val dir = Files.createTempDirectory("anom_src")
    // user 1: a steady alternating series, one spike at 00:21, then a
    // normal tail; user 2: constant (never flaggable — zero variance)
    val rows = (1 to 20).map(i =>
      s"1,$i,2024-05-01 00:${"%02d".format(i)}:00,${if (i % 2 == 0) 6.0 else 4.0}") ++
      Seq("1,21,2024-05-01 00:21:00,500.0") ++
      (22 to 25).map(i => s"1,$i,2024-05-01 00:${"%02d".format(i)}:00,5.0") ++
      (1 to 10).map(i => s"2,${100 + i},2024-05-01 00:${"%02d".format(i)}:00,7.0") ++
      // poisoned rows: NaN, null, and a DECIMAL(18,2)-overflow value —
      // the shared observation contract excludes all three from BOTH
      // paths (neither window occupants nor candidates; never fatal)
      Seq("1,60,2024-05-01 00:26:00,NaN",
        "1,61,2024-05-01 00:27:00,",
        "1,62,2024-05-01 00:28:00,1.0E17")
    Files.writeString(dir.resolve("b1.csv"),
      "user_id,event_id,ts,value\n" + rows.mkString("\n") + "\n")

    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
    val anomalies = AnomalyStream.anomalies(spark, stream, "ts", "value",
      lookback = 24, zThreshold = 3.0, minObs = 8,
      watermark = "10 minutes")
    val q = anomalies.toDF().writeStream.outputMode("append")
      .format("memory").queryName("anom_out").start()
    q.processAllAvailable()

    // advance the watermark far past every batch-1 event, then a
    // marker batch fires the event-time timeouts that seal the tail
    Files.writeString(dir.resolve("b2.csv"),
      "user_id,event_id,ts,value\n99,999,2024-05-01 06:00:00,0.0\n")
    q.processAllAvailable()
    Files.writeString(dir.resolve("b3.csv"),
      "user_id,event_id,ts,value\n99,1000,2024-05-01 06:00:01,0.0\n")
    q.processAllAvailable()
    q.stop()

    val got = spark.table("anom_out")
      .select("user_id", "event_id", "value", "z")
      .orderBy("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq

    // batch reference over the same sealed rows (all of batch 1)
    val batchDf = spark.read.option("header", "true").schema(schema)
      .csv(dir.toString)
      .where(col("user_id") =!= 99L)
    val want = Analytics.rollingZScoreAnomalies(batchDf, Seq("user_id"),
      "ts", "value", lookback = 24, zThreshold = 3.0, minObs = 8,
      tieBreak = Seq("event_id"))
      .select("user_id", "event_id", "value", "z")
      .orderBy("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq

    assert(got.nonEmpty, "expected at least one anomaly")
    assert(got === want)
    // the spike is in, with a bit-identical z to the batch chain
    assert(got.exists(_._2 == 21L))
  }
}
