package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Analytics
import graft.streaming.CusumStream

/** Streaming CUSUM: watermark-sealed drift alarms equal the batch
  * operator (ts2's closed form) bit-for-bit on the sealed range, from
  * O(1) per-key state.
  */
class CusumStreamSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_id", LongType),
    StructField("ts", TimestampType), StructField("value", DoubleType)))

  private def mm(i: Int) = "%02d".format(i)

  test("stream alarms equal the batch CUSUM on the sealed range") {
    val dir = Files.createTempDirectory("cusum_src")
    // user 1: flat at target, then a slow +2 mean shift (each step adds
    // 1.5 to W⁺) — the drift a z-score gate never flags; user 2: the
    // mirrored downward shift; user 3: flat forever (no alarms)
    val rows =
      (1 to 20).map(i => s"1,$i,2024-05-01 00:${mm(i)}:00,5.0") ++
      (21 to 35).map(i => s"1,$i,2024-05-01 00:${mm(i)}:00,7.0") ++
      (1 to 20).map(i => s"2,${100 + i},2024-05-01 00:${mm(i)}:00,5.0") ++
      (21 to 35).map(i => s"2,${100 + i},2024-05-01 00:${mm(i)}:00,2.5") ++
      (1 to 30).map(i => s"3,${200 + i},2024-05-01 00:${mm(i)}:00,5.0") ++
      // poisoned rows: NaN, null, DECIMAL(18,2) overflow — excluded by
      // the shared observation contract on BOTH paths, never fatal
      Seq("1,60,2024-05-01 00:36:00,NaN",
        "1,61,2024-05-01 00:37:00,",
        "1,62,2024-05-01 00:38:00,1.0E17")
    Files.writeString(dir.resolve("b1.csv"),
      "user_id,event_id,ts,value\n" + rows.mkString("\n") + "\n")

    val target = new java.math.BigDecimal("5.00")
    val slack = new java.math.BigDecimal("0.50")
    val threshold = new java.math.BigDecimal("10.00")

    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
    val alarms = CusumStream.alarms(spark, stream, "ts", "value",
      target, slack, threshold, watermark = "10 minutes")
    val q = alarms.toDF().writeStream.outputMode("append")
      .format("memory").queryName("cusum_out").start()
    q.processAllAvailable()

    // advance the watermark past every batch-1 event, then a marker
    // batch fires the event-time timeouts that seal the tail
    Files.writeString(dir.resolve("b2.csv"),
      "user_id,event_id,ts,value\n99,999,2024-05-01 06:00:00,5.0\n")
    q.processAllAvailable()
    Files.writeString(dir.resolve("b3.csv"),
      "user_id,event_id,ts,value\n99,1000,2024-05-01 06:00:01,5.0\n")
    q.processAllAvailable()
    q.stop()

    val got = spark.table("cusum_out")
      .select(col("user_id"), col("event_id"), col("value"),
        col("s_pos").cast("decimal(38,2)").cast("string").as("sp"),
        col("s_neg").cast("decimal(38,2)").cast("string").as("sn"),
        col("side"))
      .orderBy("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getString(3), r.getString(4), r.getString(5))).toSeq

    val batchDf = spark.read.option("header", "true").schema(schema)
      .csv(dir.toString)
      .where(col("user_id") =!= 99L)
    val want = Analytics.cusum(batchDf, Seq("user_id"), "ts", "value",
      target, slack, threshold, tieBreak = Seq("event_id"))
      .select(col("user_id"), col("event_id"), col("value"),
        col("s_pos").cast("decimal(38,2)").cast("string").as("sp"),
        col("s_neg").cast("decimal(38,2)").cast("string").as("sn"),
        col("side"))
      .orderBy("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getString(3), r.getString(4), r.getString(5))).toSeq

    assert(got.nonEmpty, "expected alarms")
    assert(got === want)
    assert(got.exists(_._6 == "hi") && got.exists(_._6 == "lo"),
      "both drift directions must fire")
    assert(!got.exists(_._1 == 3L), "the flat key never alarms")
  }

  test("parameter scale contract is enforced") {
    val df = spark.readStream.option("header", "true").schema(schema)
      .csv(Files.createTempDirectory("cusum_empty").toString)
    intercept[IllegalArgumentException] {
      CusumStream.alarms(spark, df, "ts", "value",
        new java.math.BigDecimal("5.001"), // scale 3 breaks cents
        new java.math.BigDecimal("0.50"),
        new java.math.BigDecimal("10.00"))
    }
  }
}
