package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.Sessionize

/** Stateful streaming sessionization (flatMapGroupsWithState +
  * event-time timeout): sessions close on intra-batch gaps immediately and
  * on watermark passage for the trailing open session.
  */
class SessionizeStreamSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  test("gap sessionization over two micro-batches, watermark flushes tail") {
    val dir = Files.createTempDirectory("sess_src")
    // batch 1: user 1 has two sessions separated by a >10min gap (first
    // closes intra-batch); user 2 has one session left open.
    Files.writeString(dir.resolve("b1.csv"),
      """user_id,ts,value
        |1,2024-05-01 00:00:00,1.0
        |1,2024-05-01 00:05:00,2.0
        |1,2024-05-01 01:00:00,5.0
        |2,2024-05-01 00:30:00,7.0
        |""".stripMargin)

    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
    val sessions = Sessionize.sessions(spark, stream, "ts", "value",
      gapSeconds = 600, watermark = "10 minutes")
    val q = sessions.toDF().writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    q.processAllAvailable()

    // Intra-batch gap closed user 1's first session; the post-batch
    // watermark (01:00 − 10 min = 00:50) passed user 2's timeout
    // (00:30 + 10 min), so the no-data micro-batch flushed it too. User
    // 1's second session (timeout 01:10) is still open.
    val afterB1 = spark.table("sess_out").orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4)))
    assert(afterB1.toSeq === Seq(
      (1L, "2024-05-01 00:00:00.0", "2024-05-01 00:05:00.0", 2L, 3.0),
      (2L, "2024-05-01 00:30:00.0", "2024-05-01 00:30:00.0", 1L, 7.0)))

    // batch 2: a much-later event advances the watermark far past every
    // open session's end + gap → both tails flush via timeout; the new
    // event opens a fresh session that stays open (not emitted).
    Files.writeString(dir.resolve("b2.csv"),
      """user_id,ts,value
        |3,2024-05-01 06:00:00,9.0
        |""".stripMargin)
    q.processAllAvailable()
    // state timeouts fire on the NEXT batch after the watermark advances;
    // an empty marker batch triggers them deterministically
    Files.writeString(dir.resolve("b3.csv"),
      """user_id,ts,value
        |3,2024-05-01 06:00:01,0.0
        |""".stripMargin)
    q.processAllAvailable()
    q.stop()

    val all = spark.table("sess_out").orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4)))
    assert(all.toSeq === Seq(
      (1L, "2024-05-01 00:00:00.0", "2024-05-01 00:05:00.0", 2L, 3.0),
      (1L, "2024-05-01 01:00:00.0", "2024-05-01 01:00:00.0", 1L, 5.0),
      (2L, "2024-05-01 00:30:00.0", "2024-05-01 00:30:00.0", 1L, 7.0)))
  }

  test("within-watermark late events merge into the right session, never split") {
    val dir = Files.createTempDirectory("sess_ooo")
    Files.writeString(dir.resolve("b1.csv"),
      """user_id,ts,value
        |1,2024-05-01 12:00:00,1.0
        |1,2024-05-01 12:05:00,2.0
        |""".stripMargin)
    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
    // generous watermark so the arrivals below are NOT late-dropped
    val sessions = Sessionize.sessions(spark, stream, "ts", "value",
      gapSeconds = 1800, watermark = "6 hours")
    val q = sessions.toDF().writeStream.outputMode("append")
      .format("memory").queryName("sess_ooo_out").start()
    q.processAllAvailable()
    // out-of-order: 10:00 precedes [12:00,12:05] by > gap → its own
    // session, NOT folded forward; nothing emits yet (not sealed)
    Files.writeString(dir.resolve("b2.csv"),
      """user_id,ts,value
        |1,2024-05-01 10:00:00,7.0
        |""".stripMargin)
    q.processAllAvailable()
    assert(spark.table("sess_ooo_out").count() === 0)
    // a second late event at 10:20 must MERGE into the retained 10:00
    // session (the old eager-emit design would have split it)
    Files.writeString(dir.resolve("b3.csv"),
      """user_id,ts,value
        |1,2024-05-01 10:20:00,3.0
        |""".stripMargin)
    q.processAllAvailable()
    // advancing the watermark far past both sessions seals and emits them
    Files.writeString(dir.resolve("b4.csv"),
      """user_id,ts,value
        |1,2024-05-01 20:00:00,9.0
        |""".stripMargin)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_ooo_out")
      .orderBy("session_start")
      .select("session_start", "session_end", "n_events", "total_value")
      .collect().map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      ("2024-05-01 10:00:00.0", "2024-05-01 10:20:00.0", 2L, 10.0),
      ("2024-05-01 12:00:00.0", "2024-05-01 12:05:00.0", 2L, 3.0)))
  }

  test("late event beyond watermark is dropped, not merged") {
    val dir = Files.createTempDirectory("sess_late")
    Files.writeString(dir.resolve("b1.csv"),
      """user_id,ts,value
        |1,2024-05-01 02:00:00,1.0
        |""".stripMargin)
    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
    val sessions = Sessionize.sessions(spark, stream, "ts", "value",
      gapSeconds = 600, watermark = "10 minutes")
    val q = sessions.toDF().writeStream.outputMode("append")
      .format("memory").queryName("sess_late_out").start()
    q.processAllAvailable()
    // watermark is now 01:50; an event at 00:00 is >watermark late
    Files.writeString(dir.resolve("b2.csv"),
      """user_id,ts,value
        |1,2024-05-01 00:00:00,99.0
        |1,2024-05-01 03:00:00,2.0
        |""".stripMargin)
    q.processAllAvailable()
    Files.writeString(dir.resolve("b3.csv"),
      """user_id,ts,value
        |1,2024-05-01 09:00:00,3.0
        |""".stripMargin)
    q.processAllAvailable()
    Files.writeString(dir.resolve("b4.csv"),
      """user_id,ts,value
        |1,2024-05-01 09:00:01,0.0
        |""".stripMargin)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_late_out").orderBy("session_start")
      .collect().map(r => (r.getTimestamp(1).toString, r.getLong(3), r.getDouble(4)))
    // the 99.0 late event appears in no session
    assert(rows.forall(_._3 != 99.0))
    assert(rows.map(_._1).contains("2024-05-01 02:00:00.0"))
    assert(rows.map(_._1).contains("2024-05-01 03:00:00.0"))
  }
}
