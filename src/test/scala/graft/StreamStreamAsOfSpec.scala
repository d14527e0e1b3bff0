package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamAsOf

/** Stream-stream backward as-of: both sides continuous, out-of-order
  * within the watermark, each left event emitted exactly once with the
  * batch AsOfJoin answer.
  */
class StreamStreamAsOfSpec extends SparkTestBase {
  import spark.implicits._

  private val lSchema = StructType(Seq(StructField("key", LongType),
    StructField("ts", TimestampType), StructField("payload", StringType)))
  private val rSchema = StructType(Seq(StructField("key", LongType),
    StructField("ts", TimestampType), StructField("value", DoubleType)))

  test("matches batch backward as-of; exactly-once under out-of-order input") {
    val lDir = Files.createTempDirectory("ss_asof_l")
    val rDir = Files.createTempDirectory("ss_asof_r")
    // batch 1: later left first, one right in between
    Files.writeString(lDir.resolve("l1.csv"),
      """key,ts,payload
        |1,2024-05-01 00:25:00,p2
        |2,2024-05-01 00:15:00,p3
        |""".stripMargin)
    Files.writeString(rDir.resolve("r1.csv"),
      """key,ts,value
        |1,2024-05-01 00:20:00,20.0
        |""".stripMargin)

    val lStream = spark.readStream.option("header", "true")
      .schema(lSchema).csv(lDir.toString)
    val rStream = spark.readStream.option("header", "true")
      .schema(rSchema).csv(rDir.toString)

    val q = StreamAsOf.backward(spark,
      lStream, "key", "ts", "payload",
      rStream, "key", "ts", "value",
      watermark = "30 minutes") // batch-2 late rows stay within the bound
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_asof_out").start()
    q.processAllAvailable()

    // batch 2: an EARLIER left and an EARLIER right arrive late (within
    // the watermark) — they must still join correctly
    Files.writeString(lDir.resolve("l2.csv"),
      """key,ts,payload
        |1,2024-05-01 00:10:00,p1
        |""".stripMargin)
    Files.writeString(rDir.resolve("r2.csv"),
      """key,ts,value
        |1,2024-05-01 00:05:00,5.0
        |""".stripMargin)
    q.processAllAvailable()
    // nothing emits yet: the watermark hasn't sealed any left row
    assert(spark.table("ss_asof_out").count() === 0)

    // batch 3: far-future events on BOTH sides advance the shared
    // watermark past every buffered left -> everything flushes
    Files.writeString(lDir.resolve("l3.csv"),
      """key,ts,payload
        |9,2024-05-01 03:00:00,advance
        |""".stripMargin)
    Files.writeString(rDir.resolve("r3.csv"),
      """key,ts,value
        |9,2024-05-01 03:00:00,0.0
        |""".stripMargin)
    q.processAllAvailable()
    q.processAllAvailable() // one extra cycle for event-time timeouts
    q.stop()

    val got = spark.table("ss_asof_out")
      .where($"payload" =!= "advance")
      .select($"payload", $"asof_value")
      .as[(String, Option[Double])].collect().toSet

    // batch oracle over the same rows
    val lBatch = Seq((1L, "2024-05-01 00:25:00", "p2"),
      (2L, "2024-05-01 00:15:00", "p3"),
      (1L, "2024-05-01 00:10:00", "p1"))
      .toDF("key", "ts", "payload")
      .select($"key", $"ts".cast("timestamp").as("ts"), $"payload")
    val rBatch = Seq((1L, "2024-05-01 00:20:00", 20.0),
      (1L, "2024-05-01 00:05:00", 5.0))
      .toDF("key", "ts", "value")
      .select($"key", $"ts".cast("timestamp").as("ts"), $"value")
    val want = graft.operators.AsOfJoin.backward(
      lBatch, rBatch.withColumnRenamed("ts", "rts"), "ts", "rts",
      by = Seq(("key", "key")), valueCols = Seq(("value", "asof_value")))
      .select($"payload", $"asof_value")
      .as[(String, Option[Double])].collect().toSet

    assert(want === Set(("p1", Some(5.0)), ("p2", Some(20.0)), ("p3", None)))
    assert(got === want, "stream answer must equal batch as-of")
    // exactly-once: no duplicate payloads
    val all = spark.table("ss_asof_out").where($"payload" =!= "advance")
    assert(all.count() === 3)
  }

  test("non-integral key column fails at plan time, not silently empty") {
    val lDir = Files.createTempDirectory("ss_asof_strk_l")
    val rDir = Files.createTempDirectory("ss_asof_strk_r")
    val strSchema = StructType(Seq(StructField("key", StringType),
      StructField("ts", TimestampType), StructField("payload", StringType)))
    val lStream = spark.readStream.option("header", "true")
      .schema(strSchema).csv(lDir.toString)
    val rStream = spark.readStream.option("header", "true")
      .schema(rSchema).csv(rDir.toString)
    val e = intercept[IllegalArgumentException] {
      StreamAsOf.backward(spark,
        lStream, "key", "ts", "payload",
        rStream, "key", "ts", "value", watermark = "10 minutes")
    }
    assert(e.getMessage.contains("must be integral"))
  }

  test("carry idle TTL drops quiet keys' state; default retains carry") {
    def run(ttl: Option[Long]): Long = {
      val lDir = Files.createTempDirectory("ss_asof_ttl_l")
      val rDir = Files.createTempDirectory("ss_asof_ttl_r")
      val name = s"ss_asof_ttl_${ttl.isDefined}"
      Files.writeString(rDir.resolve("r1.csv"),
        """key,ts,value
          |1,2024-05-01 00:00:00,1.0
          |""".stripMargin)
      Files.writeString(lDir.resolve("l1.csv"),
        """key,ts,payload
          |1,2024-05-01 00:01:00,p1
          |""".stripMargin)
      val lStream = spark.readStream.option("header", "true")
        .schema(lSchema).csv(lDir.toString)
      val rStream = spark.readStream.option("header", "true")
        .schema(rSchema).csv(rDir.toString)
      val q = StreamAsOf.backward(spark,
        lStream, "key", "ts", "payload",
        rStream, "key", "ts", "value",
        watermark = "10 minutes", carryIdleMs = ttl)
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      q.processAllAvailable()
      // key 9 advances the watermark (BOTH sides — the global watermark
      // is the min across streams) far past key 1's last activity + TTL;
      // key 1 becomes carry-only after its left seals, then its idle
      // timeout fires on a later batch
      Seq("01:00", "02:00", "03:00").zipWithIndex.foreach { case (h, i) =>
        Files.writeString(rDir.resolve(s"adv$i.csv"),
          s"""key,ts,value
             |9,2024-05-01 $h:00,0.0
             |""".stripMargin)
        Files.writeString(lDir.resolve(s"adv$i.csv"),
          s"""key,ts,payload
             |9,2024-05-01 $h:00,advance
             |""".stripMargin)
        q.processAllAvailable()
      }
      val stateRows = q.lastProgress.stateOperators
        .map(_.numRowsTotal).sum
      q.stop()
      assert(spark.table(name).where($"payload" === "p1").count() === 1,
        "TTL must not affect already-sealed results")
      stateRows
    }
    val withTtl = run(Some(60000L)) // 1 min event-time idle horizon
    val without = run(None)
    assert(withTtl < without,
      s"idle TTL must drop quiet key state (ttl=$withTtl, default=$without)")
    assert(without === 2, "default retains the quiet key's carry (by design)")
    assert(withTtl === 1, "only the active key survives the TTL")
  }
}
