package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.IntervalJoin
import graft.streaming.StreamIntervalJoin

/** Stream-stream point-in-interval join: batch J1 parity under
  * out-of-order arrival, closed bounds, and the maxDuration
  * state-bound contract.
  */
class StreamIntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val pSchema = StructType(Seq(StructField("key", LongType),
    StructField("ts", TimestampType), StructField("payload", StringType)))
  private val iSchema = StructType(Seq(StructField("zone", LongType),
    StructField("start", TimestampType), StructField("end", TimestampType),
    StructField("price", DoubleType)))

  test("matches batch pointInInterval; closed bounds; out-of-order input") {
    val pDir = Files.createTempDirectory("ss_ivl_p")
    val iDir = Files.createTempDirectory("ss_ivl_i")
    // batch 1: two points, one interval; point at the CLOSED end bound
    Files.writeString(pDir.resolve("p1.csv"),
      """key,ts,payload
        |1,2024-05-01 00:10:00,a
        |1,2024-05-01 00:30:00,b
        |""".stripMargin)
    Files.writeString(iDir.resolve("i1.csv"),
      """zone,start,end,price
        |1,2024-05-01 00:00:00,2024-05-01 00:30:00,7.5
        |""".stripMargin)

    val pStream = spark.readStream.option("header", "true")
      .schema(pSchema).csv(pDir.toString)
    val iStream = spark.readStream.option("header", "true")
      .schema(iSchema).csv(iDir.toString)

    val q = StreamIntervalJoin.pointInInterval(
      pStream, "key", "ts",
      iStream, "zone", "start", "end",
      watermark = "30 minutes", maxDuration = "1 hour",
      select = Seq(col("p.key"), col("p.ts"), col("p.payload"),
        col("i.start"), col("i.price")))
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_ivl_out").start()
    q.processAllAvailable()

    // batch 2: a LATE point and a LATE overlapping interval, both within
    // the watermark — they must still match (both directions)
    Files.writeString(pDir.resolve("p2.csv"),
      """key,ts,payload
        |1,2024-05-01 00:20:00,late_p
        |2,2024-05-01 00:25:00,c
        |""".stripMargin)
    Files.writeString(iDir.resolve("i2.csv"),
      """zone,start,end,price
        |1,2024-05-01 00:15:00,2024-05-01 00:45:00,9.0
        |2,2024-05-01 00:25:00,2024-05-01 00:40:00,3.0
        |""".stripMargin)
    q.processAllAvailable()

    // advance the watermark far enough to seal everything
    Files.writeString(pDir.resolve("p3.csv"),
      """key,ts,payload
        |9,2024-05-01 03:00:00,tick
        |""".stripMargin)
    Files.writeString(iDir.resolve("i3.csv"),
      """zone,start,end,price
        |9,2024-05-01 03:00:00,2024-05-01 03:01:00,0.0
        |""".stripMargin)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ss_ivl_out")
      .where(col("key") =!= 9)
      .select("key", "payload", "price")
      .as[(Long, String, Double)].collect().toSet

    // batch J1 over the SAME union of data (closed bounds both ends)
    val allP = Seq((1L, "2024-05-01 00:10:00", "a"),
      (1L, "2024-05-01 00:30:00", "b"), (1L, "2024-05-01 00:20:00", "late_p"),
      (2L, "2024-05-01 00:25:00", "c"))
      .toDF("key", "ts", "payload")
      .withColumn("ts", col("ts").cast(TimestampType))
    val allI = Seq((1L, "2024-05-01 00:00:00", "2024-05-01 00:30:00", 7.5),
      (1L, "2024-05-01 00:15:00", "2024-05-01 00:45:00", 9.0),
      (2L, "2024-05-01 00:25:00", "2024-05-01 00:40:00", 3.0))
      .toDF("zone", "start", "end", "price")
      .withColumn("start", col("start").cast(TimestampType))
      .withColumn("end", col("end").cast(TimestampType))
    val batch = IntervalJoin.pointInInterval(allP, allI,
      col("ts"), col("start"), col("end"),
      equi = Seq(col("key") -> col("zone")))
      .select("key", "payload", "price")
      .as[(Long, String, Double)].collect().toSet

    assert(got === batch)
    // spot facts: point b sits ON the closed end of interval 1 AND inside
    // interval 2; the late point matches both; c matches zone 2's start
    assert(got.contains((1L, "b", 7.5)) && got.contains((1L, "b", 9.0)))
    assert(got.contains((1L, "late_p", 7.5)) && got.contains((1L, "late_p", 9.0)))
    assert(got.contains((2L, "c", 3.0)))
  }

  test("left_outer: unmatched points emit null-padded exactly once") {
    val pDir = Files.createTempDirectory("ss_ivl_lo_p")
    val iDir = Files.createTempDirectory("ss_ivl_lo_i")
    Files.writeString(pDir.resolve("p1.csv"),
      """key,ts,payload
        |1,2024-05-01 00:10:00,matched
        |2,2024-05-01 00:10:00,orphan
        |""".stripMargin)
    Files.writeString(iDir.resolve("i1.csv"),
      """zone,start,end,price
        |1,2024-05-01 00:00:00,2024-05-01 00:30:00,7.5
        |""".stripMargin)
    val q = StreamIntervalJoin.pointInInterval(
      spark.readStream.option("header", "true").schema(pSchema)
        .csv(pDir.toString), "key", "ts",
      spark.readStream.option("header", "true").schema(iSchema)
        .csv(iDir.toString), "zone", "start", "end",
      watermark = "10 minutes", maxDuration = "1 hour",
      select = Seq(col("p.payload"), col("i.price")),
      joinType = "left_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_ivl_lo").start()
    q.processAllAvailable()
    // advance the watermark so the orphan's no-match is provable
    Files.writeString(pDir.resolve("p2.csv"),
      """key,ts,payload
        |9,2024-05-01 06:00:00,tick
        |""".stripMargin)
    Files.writeString(iDir.resolve("i2.csv"),
      """zone,start,end,price
        |9,2024-05-01 06:00:00,2024-05-01 06:01:00,0.0
        |""".stripMargin)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ss_ivl_lo")
      .where(col("payload") =!= "tick")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    assert(got === Set(("matched", Some(7.5)), ("orphan", None)))
  }

  test("maxDuration is a contract: matches past the bound are not emitted") {
    val pDir = Files.createTempDirectory("ss_ivl_p2")
    val iDir = Files.createTempDirectory("ss_ivl_i2")
    // a 3-hour interval, one point 2h in (past the 1h maxDuration),
    // one point 30min in (inside it)
    Files.writeString(pDir.resolve("p1.csv"),
      """key,ts,payload
        |1,2024-05-01 02:00:00,past_bound
        |1,2024-05-01 00:30:00,inside
        |""".stripMargin)
    Files.writeString(iDir.resolve("i1.csv"),
      """zone,start,end,price
        |1,2024-05-01 00:00:00,2024-05-01 03:00:00,1.0
        |""".stripMargin)
    val q = StreamIntervalJoin.pointInInterval(
      spark.readStream.option("header", "true").schema(pSchema)
        .csv(pDir.toString), "key", "ts",
      spark.readStream.option("header", "true").schema(iSchema)
        .csv(iDir.toString), "zone", "start", "end",
      watermark = "10 minutes", maxDuration = "1 hour",
      select = Seq(col("p.payload")))
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_ivl_bound").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ss_ivl_bound").as[String].collect().toSet
    assert(got === Set("inside"),
      "a point past maxDuration after the interval start must not emit")
  }
}
