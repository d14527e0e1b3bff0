package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Analytics
import graft.streaming.HoltStream

/** Streaming Holt: watermark-sealed level/trend points equal the batch
  * fold (ts8) bit-for-bit on the sealed range, from two-double state.
  */
class HoltStreamSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_id", LongType),
    StructField("ts", TimestampType), StructField("value", DoubleType)))

  private def mm(i: Int) = "%02d".format(i)

  test("stream holt equals the batch fold on the sealed range, bit-exact") {
    val dir = Files.createTempDirectory("holt_src")
    val rows =
      (1 to 25).map(i => s"1,$i,2024-05-01 00:${mm(i)}:00,${i * 7 % 23}.${mm(i * 13 % 100)}") ++
      (1 to 18).map(i => s"2,${100 + i},2024-05-01 00:${mm(i)}:00,${i * 11 % 17}.${mm(i * 37 % 100)}") ++
      Seq("1,60,2024-05-01 00:36:00,NaN",
        "1,61,2024-05-01 00:37:00,",
        "1,62,2024-05-01 00:38:00,1.0E17")
    Files.writeString(dir.resolve("b1.csv"),
      "user_id,event_id,ts,value\n" + rows.mkString("\n") + "\n")

    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
    val pts = HoltStream.smoothed(spark, stream, "ts", "value",
      alpha = 0.5, beta = 0.25, watermark = "10 minutes")
    val q = pts.toDF().writeStream.outputMode("append")
      .format("memory").queryName("holt_out").start()
    q.processAllAvailable()
    Files.writeString(dir.resolve("b2.csv"),
      "user_id,event_id,ts,value\n99,999,2024-05-01 06:00:00,5.0\n")
    q.processAllAvailable()
    Files.writeString(dir.resolve("b3.csv"),
      "user_id,event_id,ts,value\n99,1000,2024-05-01 06:00:01,5.0\n")
    q.processAllAvailable()
    q.stop()

    val got = spark.table("holt_out")
      .where(col("user_id") =!= 99L)
      .select("user_id", "event_id", "value", "level", "trend")
      .orderBy("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(4)))).toSeq

    val batchDf = spark.read.option("header", "true").schema(schema)
      .csv(dir.toString)
      .where(col("user_id") =!= 99L)
    val want = Analytics.holt(batchDf, Seq("user_id"), "ts", "value",
      alpha = 0.5, beta = 0.25, tieBreak = Seq("event_id"))
      .select("user_id", "event_id", "value", "level", "trend")
      .orderBy("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(4)))).toSeq

    assert(got.size === 43,
      s"expected all non-poisoned rows sealed, got ${got.size}")
    assert(got === want)
  }

  test("state carries level AND trend across micro-batches") {
    val dir = Files.createTempDirectory("holt_src2")
    Files.writeString(dir.resolve("b1.csv"),
      "user_id,event_id,ts,value\n" +
        "1,1,2024-05-01 00:01:00,10.0\n1,2,2024-05-01 00:02:00,20.0\n")
    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
    val q = HoltStream.smoothed(spark, stream, "ts", "value",
      alpha = 0.5, beta = 0.5, watermark = "1 minute")
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("holt_out2").start()
    q.processAllAvailable()
    Files.writeString(dir.resolve("b2.csv"),
      "user_id,event_id,ts,value\n1,3,2024-05-01 00:03:00,30.0\n")
    q.processAllAvailable()
    Files.writeString(dir.resolve("b3.csv"),
      "user_id,event_id,ts,value\n1,9,2024-05-01 09:00:00,0.0\n")
    q.processAllAvailable()
    Files.writeString(dir.resolve("b4.csv"),
      "user_id,event_id,ts,value\n1,10,2024-05-01 09:00:01,0.0\n")
    q.processAllAvailable()
    q.stop()
    // x = 10, 20, 30 with alpha=beta=0.5 (the SmoothingSpec vector):
    // (l,b) = (10,0), (15,2.5), (23.75,5.625)
    val got = spark.table("holt_out2")
      .where(col("event_id") < 9)
      .orderBy("event_id").select("level", "trend")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(got === Seq((10.0, 0.0), (15.0, 2.5), (23.75, 5.625)))
  }

  test("parameter contracts are enforced") {
    val df = spark.readStream.option("header", "true").schema(schema)
      .csv(Files.createTempDirectory("holt_empty").toString)
    intercept[IllegalArgumentException] {
      HoltStream.smoothed(spark, df, "ts", "value", alpha = 0.0,
        beta = 0.5)
    }
    intercept[IllegalArgumentException] {
      HoltStream.smoothed(spark, df, "ts", "value", alpha = 0.5,
        beta = 1.5)
    }
  }
}
