package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.streaming.AvailableNowJobs

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private val rawSchema = StructType(Seq(
    StructField("Time", StringType), StructField("Interval Start", StringType),
    StructField("Interval End", StringType), StructField("Load", StringType)))

  private val casts: Map[String, DataType] = Map(
    "time" -> TimestampType, "interval_start" -> TimestampType,
    "interval_end" -> TimestampType, "load" -> DecimalType(10, 2))

  test("AvailableNow ELT drains folder, archives source, appends lake; " +
    "second drain is exactly-once (no reprocessing)") {
    val src = Files.createTempDirectory("stream_src")
    val arch = Files.createTempDirectory("stream_arch")
    val lake = Files.createTempDirectory("stream_lake").resolve("t").toString
    val ckpt = Files.createTempDirectory("stream_ckpt").toString
    Files.writeString(src.resolve("load_1.csv"),
      """Time,Interval Start,Interval End,Load
        |2024-05-01 00:00:00,2024-05-01 00:00:00,2024-05-01 01:00:00,42000.55
        |bad,2024-05-01 01:00:00,2024-05-01 02:00:00,45000.00
        |2024-05-01 02:00:00,2024-05-01 02:00:00,2024-05-01 03:00:00,47000.00
        |""".stripMargin)

    AvailableNowJobs.singleFolderElt(spark, src.toString, arch.toString,
      lake, ckpt, rawSchema, casts)
    val out1 = spark.read.parquet(lake)
    assert(out1.count() === 2) // bad-ts row dropped by cast+na.drop
    assert(out1.schema("load").dataType === DecimalType(10, 2))

    // drain again with no new files: count unchanged (checkpoint dedup)
    AvailableNowJobs.singleFolderElt(spark, src.toString, arch.toString,
      lake, ckpt, rawSchema, casts)
    assert(spark.read.parquet(lake).count() === 2)

    // new file arrives → only it is processed
    Files.writeString(src.resolve("load_2.csv"),
      """Time,Interval Start,Interval End,Load
        |2024-05-01 03:00:00,2024-05-01 03:00:00,2024-05-01 04:00:00,48000.00
        |""".stripMargin)
    AvailableNowJobs.singleFolderElt(spark, src.toString, arch.toString,
      lake, ckpt, rawSchema, casts)
    assert(spark.read.parquet(lake).count() === 3)
  }

  test("streaming dedup within watermark drops re-delivered keys") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("stream_dedup")
    Files.writeString(dir.resolve("e.csv"),
      """ts,k,v
        |2024-05-01 00:10:00,a,1.0
        |2024-05-01 00:10:00,a,1.0
        |2024-05-01 00:20:00,b,2.0
        |2024-05-01 00:25:00,a,3.0
        |""".stripMargin)
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("k", StringType), StructField("v", DoubleType)))
    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
    val deduped = graft.streaming.AvailableNowJobs.dedupStream(
      stream, "ts", Seq("k"), watermark = "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()
    // exact (k, ts) duplicate collapsed; same key at a later ts kept
    val rows = spark.table("dedup_out").orderBy("ts", "k")
      .select(col("k"), col("v")).collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq === Seq(("a", 1.0), ("b", 2.0), ("a", 3.0)))
  }

  test("windowed streaming aggregation over a file stream (A5 upgrade)") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("stream_agg")
    Files.writeString(dir.resolve("e.csv"),
      """ts,value
        |2024-05-01 00:10:00,10.0
        |2024-05-01 00:20:00,20.0
        |2024-05-01 01:10:00,30.0
        |""".stripMargin)
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("value", DoubleType)))
    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
    val agg = AvailableNowJobs.windowedAvg(stream, "ts", "value")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("win_out")
      .orderBy("window_start")
      .select(col("avg_value"), col("n")).collect()
    assert(rows.map(r => (r.getDouble(0), r.getLong(1))).toSeq ===
      Seq((15.0, 2L), (30.0, 1L)))
  }

  test("streaming training-data intake: quality gate + fingerprint dedup") {
    // the batch quality/dedup operators compose unchanged over a stream:
    // repetition stats + fingerprint are stateless expressions, the
    // dedup is watermarked dropDuplicates on the fingerprint
    val dir = java.nio.file.Files.createTempDirectory("stream_intake")
    java.nio.file.Files.writeString(dir.resolve("b1.csv"),
      """ts,doc_id,text
        |2024-05-01 00:00:00,1,a decent document with words
        |2024-05-01 00:00:01,2,spam spam spam spam spam spam
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.option("header", "true").schema(schema)
      .csv(dir.toString)
      .withColumn("rep",
        graft.functions.GraftFunctions.repetitionStats(col("text")))
      .where(col("rep.top_bigram_frac") < 0.9) // kills the spam doc
      .withColumn("fp", graft.operators.TextAnalysis.fingerprint(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("fp") // doc 3 is a case/ws variant of doc 1
      .select("doc_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_intake").start()
    q.processAllAvailable()
    // batch 2: a case/whitespace variant of doc 1 arrives later — the
    // fingerprint dedup state drops it
    java.nio.file.Files.writeString(dir.resolve("b2.csv"),
      """ts,doc_id,text
        |2024-05-01 00:00:02,3,A  Decent   document with words
        |""".stripMargin)
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("stream_intake").as[Long].collect().toSet
    assert(kept === Set(1L), s"expected only doc 1 to survive, got $kept")
  }
}
