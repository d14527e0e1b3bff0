package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Analytics
import graft.streaming.EwmaStream

/** Streaming EWMA: watermark-sealed smoothed points equal the batch
  * fold (ts3) bit-for-bit on the sealed range, from one-double state.
  */
class EwmaStreamSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_id", LongType),
    StructField("ts", TimestampType), StructField("value", DoubleType)))

  private def mm(i: Int) = "%02d".format(i)

  test("stream ewma equals the batch fold on the sealed range, bit-exact") {
    val dir = Files.createTempDirectory("ewma_src")
    // two keys with different shapes, values with awkward binary
    // fractions (x.x1, x.37) so any op-order drift would show; poisoned
    // rows excluded by the shared observation contract on BOTH paths
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
    val pts = EwmaStream.smoothed(spark, stream, "ts", "value",
      alpha = 0.25, watermark = "10 minutes")
    val q = pts.toDF().writeStream.outputMode("append")
      .format("memory").queryName("ewma_out").start()
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

    val got = spark.table("ewma_out")
      .where(col("user_id") =!= 99L)
      .select("user_id", "event_id", "value", "ewma")
      .orderBy("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))).toSeq

    val batchDf = spark.read.option("header", "true").schema(schema)
      .csv(dir.toString)
      .where(col("user_id") =!= 99L)
    val want = Analytics.ewma(batchDf, Seq("user_id"), "ts", "value",
      alpha = 0.25, tieBreak = Seq("event_id"))
      .select("user_id", "event_id", "value", "ewma")
      .orderBy("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))).toSeq

    assert(got.size === 43, s"expected all non-poisoned rows sealed, got ${got.size}")
    assert(got === want)
  }

  test("state carries the fold across micro-batches (no window re-read)") {
    val dir = Files.createTempDirectory("ewma_src2")
    Files.writeString(dir.resolve("b1.csv"),
      "user_id,event_id,ts,value\n" +
        "1,1,2024-05-01 00:01:00,10.0\n1,2,2024-05-01 00:02:00,20.0\n")
    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
    val q = EwmaStream.smoothed(spark, stream, "ts", "value", 0.5,
      watermark = "1 minute")
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("ewma_out2").start()
    q.processAllAvailable()
    // second file arrives later — the first rows are already sealed and
    // their fold result must persist in state, not be recomputed
    Files.writeString(dir.resolve("b2.csv"),
      "user_id,event_id,ts,value\n1,3,2024-05-01 00:03:00,40.0\n")
    q.processAllAvailable()
    Files.writeString(dir.resolve("b3.csv"),
      "user_id,event_id,ts,value\n1,9,2024-05-01 09:00:00,0.0\n")
    q.processAllAvailable()
    Files.writeString(dir.resolve("b4.csv"),
      "user_id,event_id,ts,value\n1,10,2024-05-01 09:00:01,0.0\n")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ewma_out2")
      .where(col("event_id") < 9)
      .orderBy("event_id").select("ewma")
      .collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(10.0, 15.0, 27.5))
  }

  test("alpha contract is enforced") {
    val df = spark.readStream.option("header", "true").schema(schema)
      .csv(Files.createTempDirectory("ewma_empty").toString)
    intercept[IllegalArgumentException] {
      EwmaStream.smoothed(spark, df, "ts", "value", alpha = 0.0)
    }
  }
}
