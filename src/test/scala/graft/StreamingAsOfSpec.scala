package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.AsOfJoin

/** Continuous as-of enrichment: the reference's fm⋈load merge as a
  * stream-static join. `broadcastBackward` is map-only on the left/fact
  * side (the right side collapses to broadcast per-key sorted arrays), so
  * it composes with a streaming left out of the box — each micro-batch is
  * enriched without shuffling the stream.
  */
class StreamingAsOfSpec extends SparkTestBase {

  test("streaming left side enriched by broadcast as-of, per micro-batch") {
    val dir = Files.createTempDirectory("stream_asof")
    Files.writeString(dir.resolve("b1.csv"),
      """k,ts,mw
        |a,2024-05-01 00:30:00,100.0
        |a,2024-05-01 01:30:00,110.0
        |b,2024-05-01 00:45:00,120.0
        |""".stripMargin)
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("ts", TimestampType), StructField("mw", DoubleType)))
    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)

    import spark.implicits._
    val loads = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-05-01 00:00:00"), 42000.0),
      ("a", java.sql.Timestamp.valueOf("2024-05-01 01:00:00"), 45000.0),
      ("b", java.sql.Timestamp.valueOf("2024-05-01 00:40:00"), 47000.0)
    ).toDF("kk", "lt", "load")

    val enriched = AsOfJoin.broadcastBackward(stream, loads, "ts", "lt",
      by = Seq(("k", "kk")), valueCols = Seq(("load", "load")))
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("asof_out").start()
    q.processAllAvailable()

    // second batch picks the later right row for the later left time
    Files.writeString(dir.resolve("b2.csv"),
      """k,ts,mw
        |a,2024-05-01 02:30:00,130.0
        |b,2024-05-01 00:10:00,140.0
        |""".stripMargin)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("asof_out")
      .select($"mw", $"load").collect()
      .map(r => r.getDouble(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got === Map(
      100.0 -> Some(42000.0), // a@00:30 -> load@00:00
      110.0 -> Some(45000.0), // a@01:30 -> load@01:00
      120.0 -> Some(47000.0), // b@00:45 -> load@00:40
      130.0 -> Some(45000.0), // a@02:30 -> latest a load
      140.0 -> None))         // b@00:10 precedes every b load
  }
}
