package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions.{cmEstimate, cmMerge}
import graft.streaming.SketchFeed

/** Streaming Count-Min sketch-per-window maintenance: estimates equal
  * exact counts in the collision-free regime, late data merges into its
  * window, any-span queries merge stored rows.
  */
class SketchFeedSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("item", StringType)))

  test("windows fill from the stream; late rows merge; spans re-aggregate") {
    val root = Files.createTempDirectory("cmfeed")
    val src = root.resolve("src")
    Files.createDirectory(src)
    val table = root.resolve("tbl").toString

    // batch 1: two hours of traffic
    Files.writeString(src.resolve("b1.csv"),
      """ts,item
        |2024-05-01 00:10:00,a
        |2024-05-01 00:20:00,a
        |2024-05-01 00:30:00,b
        |2024-05-01 01:10:00,a
        |2024-05-01 01:40:00,c
        |""".stripMargin)
    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(src.toString)
    // continuous trigger: the spec feeds a second batch after the
    // first processAllAvailable (AvailableNow would terminate)
    val q = SketchFeed.startCountMin(spark, stream, "ts", "item",
      windowSeconds = 3600L, depth = 4, width = 256,
      table = table, checkpoint = root.resolve("ckpt").toString,
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("500 milliseconds"))
    q.processAllAvailable()

    def est(item: String): Seq[(Long, Long)] =
      graft.sources.VersionedTable.read(spark, table)
        .select(col("w_start"), cmEstimate(col("sk"), lit(item)).as("e"))
        .orderBy("w_start").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq

    val h0 = java.sql.Timestamp.valueOf("2024-05-01 00:00:00")
      .getTime * 1000L
    val h1 = h0 + 3600L * 1000000L
    assert(est("a") === Seq((h0, 2L), (h1, 1L)))
    assert(est("b") === Seq((h0, 1L), (h1, 0L)))

    // batch 2: more hour-1 traffic plus a LATE hour-0 row — both merge
    // into their windows' stored sketches
    Files.writeString(src.resolve("b2.csv"),
      """ts,item
        |2024-05-01 01:50:00,a
        |2024-05-01 00:55:00,a
        |""".stripMargin)
    q.processAllAvailable()
    q.stop()
    assert(est("a") === Seq((h0, 3L), (h1, 2L)))
    assert(est("c") === Seq((h0, 0L), (h1, 1L)))

    // any-span query: merge the stored rows, estimate over both hours
    val total = graft.sources.VersionedTable.read(spark, table)
      .agg(cmEstimate(cmMerge(col("sk")), lit("a")))
      .head.getLong(0)
    assert(total === 5L)
  }

  test("theta feed: per-window distinct counts, idempotent duplicates, " +
      "late merge, and cross-window set algebra") {
    import graft.functions.GraftFunctions.{thetaEstimate, thetaMerge, thetaSetOp}
    val root = Files.createTempDirectory("thetafeed")
    val src = root.resolve("src")
    Files.createDirectory(src)
    val table = root.resolve("tbl").toString

    Files.writeString(src.resolve("b1.csv"),
      """ts,item
        |2024-05-01 00:10:00,a
        |2024-05-01 00:20:00,a
        |2024-05-01 00:30:00,b
        |2024-05-01 01:10:00,a
        |2024-05-01 01:40:00,c
        |""".stripMargin)
    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(src.toString)
    val q = SketchFeed.startTheta(spark, stream, "ts", "item",
      windowSeconds = 3600L, k = 512,
      table = table, checkpoint = root.resolve("ckpt").toString,
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("500 milliseconds"))
    q.processAllAvailable()

    def dist(): Seq[(Long, Double)] =
      graft.sources.VersionedTable.read(spark, table)
        .select(col("w_start"), thetaEstimate(col("sk")).as("e"))
        .orderBy("w_start").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq

    val h0 = java.sql.Timestamp.valueOf("2024-05-01 00:00:00")
      .getTime * 1000L
    val h1 = h0 + 3600L * 1000000L
    assert(dist() === Seq((h0, 2.0), (h1, 2.0))) // {a,b} / {a,c}

    // duplicates add no mass (idempotent); late hour-0 'd' merges in
    Files.writeString(src.resolve("b2.csv"),
      """ts,item
        |2024-05-01 01:50:00,a
        |2024-05-01 00:55:00,d
        |""".stripMargin)
    q.processAllAvailable()
    q.stop()
    assert(dist() === Seq((h0, 3.0), (h1, 2.0))) // {a,b,d} / {a,c}

    // any-span distinct + cross-window set algebra over stored rows
    val stored = graft.sources.VersionedTable.read(spark, table)
    assert(stored.agg(thetaEstimate(thetaMerge(col("sk"))))
      .head.getDouble(0) === 4.0) // {a,b,c,d}
    val pair = stored.where(col("w_start") === h0).select(col("sk").as("x"))
      .crossJoin(stored.where(col("w_start") === h1).select(col("sk").as("y")))
    assert(pair.select(thetaEstimate(
      thetaSetOp(col("x"), col("y"), "intersect"))).head.getDouble(0)
      === 1.0) // only 'a' is in both hours
  }
}
