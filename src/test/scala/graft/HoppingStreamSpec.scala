package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Analytics

/** The hoppingAvg expression is stream-transferable verbatim: the SAME
  * operator call over a watermarked stream emits, in append mode,
  * exactly the batch operator's rows for every window the watermark has
  * closed.
  */
class HoppingStreamSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("event_type", StringType),
    StructField("ts", TimestampType), StructField("value", DoubleType)))

  test("streamed hopping windows equal the batch operator on closed windows") {
    val dir = Files.createTempDirectory("hop_src")
    val rows = (0 until 40).map { i =>
      val mm = "%02d".format(i)
      s"$i,${if (i % 3 == 0) "click" else "view"},2024-05-01 00:$mm:30,${i % 7}.25"
    }
    Files.writeString(dir.resolve("b1.csv"),
      "event_id,event_type,ts,value\n" + rows.mkString("\n") + "\n")

    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
      .withWatermark("ts", "10 minutes")
    // the batch operator, applied verbatim to a streaming frame
    val agg = Analytics.hoppingAvg(stream, Seq("event_type"), "ts",
      "value", "30 minutes", "15 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("hop_out").start()
    q.processAllAvailable()
    // advance the watermark well past batch 1 so its windows close
    Files.writeString(dir.resolve("b2.csv"),
      "event_id,event_type,ts,value\n999,click,2024-05-01 06:00:00,1.0\n")
    q.processAllAvailable()
    q.stop()

    val sealedUpTo = java.sql.Timestamp.valueOf("2024-05-01 01:00:00")
    val got = spark.table("hop_out")
      .where(col("window_end") <= lit(sealedUpTo))
      .select("window_start", "event_type", "n", "avg_value")
      .orderBy("window_start", "event_type").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq

    val batch = spark.read.option("header", "true").schema(schema)
      .csv(dir.toString).where(col("event_id") =!= 999L)
    val want = Analytics.hoppingAvg(batch, Seq("event_type"), "ts",
      "value", "30 minutes", "15 minutes")
      .where(col("window_end") <= lit(sealedUpTo))
      .select("window_start", "event_type", "n", "avg_value")
      .orderBy("window_start", "event_type").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq

    assert(got.nonEmpty, "expected closed windows")
    assert(got === want)
  }
}
