package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Analytics
import graft.streaming.Scd2Stream

/** Streaming SCD2 maintenance: closed versions emit exactly once when a
  * sealed later change supersedes them; the open version stays in
  * state; within-watermark out-of-order changes land where the batch
  * operator puts them.
  */
class Scd2StreamSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType),
    StructField("event_id", LongType), StructField("tier", StringType)))

  test("closed versions match the batch operator's non-current rows") {
    val dir = Files.createTempDirectory("scd2_src")
    // out-of-order WITHIN the batch: user 1's silver change arrives
    // before its bronze start; user 2 never changes (one open version)
    Files.writeString(dir.resolve("b1.csv"),
      """user_id,ts,event_id,tier
        |1,2024-05-01 00:20:00,3,silver
        |1,2024-05-01 00:00:00,1,bronze
        |1,2024-05-01 00:10:00,2,bronze
        |2,2024-05-01 00:05:00,4,basic
        |""".stripMargin)

    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
    val closed = Scd2Stream.closedVersions(spark, stream, "ts",
      "event_id", "tier", watermark = "10 minutes")
    val q = closed.toDF().writeStream.outputMode("append")
      .format("memory").queryName("scd2_out").start()
    q.processAllAvailable()

    // advance the watermark far past everything, then a marker batch
    // fires the event-time timeouts deterministically
    Files.writeString(dir.resolve("b2.csv"),
      """user_id,ts,event_id,tier
        |9,2024-05-01 06:00:00,8,x
        |""".stripMargin)
    q.processAllAvailable()
    Files.writeString(dir.resolve("b3.csv"),
      """user_id,ts,event_id,tier
        |9,2024-05-01 06:00:01,9,x
        |""".stripMargin)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("scd2_out")
      .where(col("user_id") < 9)
      .select("user_id", "attr", "effective_from", "effective_to")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toString, r.getTimestamp(3).toString)).toSet

    // the batch operator over the same change log: its non-current rows
    // are exactly the closed versions the stream must have emitted
    val batchLog = spark.read.option("header", "true").schema(schema)
      .csv(dir.toString).where(col("user_id") < 9)
    val batch = Analytics.scd2(batchLog, Seq("user_id"), "ts",
      Seq("tier"), Seq("ts", "event_id"))
      .where(!col("is_current"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toString, r.getTimestamp(3).toString)).toSet
    assert(streamed === batch)
    assert(streamed === Set(
      (1L, "bronze", "2024-05-01 00:00:00.0", "2024-05-01 00:20:00.0")))
  }

  test("a change arriving in a later batch closes the open version once sealed") {
    val dir = Files.createTempDirectory("scd2_late")
    Files.writeString(dir.resolve("b1.csv"),
      """user_id,ts,event_id,tier
        |1,2024-05-01 00:00:00,1,bronze
        |""".stripMargin)
    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
    val closed = Scd2Stream.closedVersions(spark, stream, "ts",
      "event_id", "tier", watermark = "5 minutes")
    val q = closed.toDF().writeStream.outputMode("append")
      .format("memory").queryName("scd2_late_out").start()
    q.processAllAvailable()
    assert(spark.table("scd2_late_out").count() === 0, "nothing sealed yet")

    Files.writeString(dir.resolve("b2.csv"),
      """user_id,ts,event_id,tier
        |1,2024-05-01 01:00:00,2,gold
        |""".stripMargin)
    q.processAllAvailable()
    Files.writeString(dir.resolve("b3.csv"),
      """user_id,ts,event_id,tier
        |1,2024-05-01 02:00:00,3,gold
        |""".stripMargin)
    q.processAllAvailable()
    Files.writeString(dir.resolve("b4.csv"),
      """user_id,ts,event_id,tier
        |1,2024-05-01 03:00:00,4,gold
        |""".stripMargin)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("scd2_late_out")
      .select("user_id", "attr", "effective_to")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toString))
    // bronze closed at the gold change; the unchanged gold rows
    // collapsed; gold itself stays open (in state, not emitted)
    assert(rows.toSeq === Seq((1L, "bronze", "2024-05-01 01:00:00.0")))
  }
}
