package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Left-outer stream-stream join: watermark-proven null emission, and
  * the marker-row hazard that silently suppresses it.
  *
  * Found in round 15: a watermark-advancing marker row carrying NULL in
  * a timestamp column that the join CONDITION references (here `i_end`)
  * stalls Spark's outer-join null emission — unmatched left rows that
  * become evictable in the same micro-batch as the null-ts marker never
  * produce their null-padded row (inner joins are unaffected, which is
  * why j1s passed for a full round while the same harness broke j1so).
  * `SparkEntry.markerLike` therefore fills EVERY timestamp column with
  * the marker time; this spec pins the good path at minimal scale.
  */
class StreamOuterJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("left-outer stream-stream join emits null rows for points " +
      "evicted in different watermark rounds (non-null-ts markers)") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    val root = JFiles.createTempDirectory("graft_scratch").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def ship(sub: String, batches: Seq[DataFrame]): DataFrame = {
      val src = root + "/" + sub
      JFiles.createDirectories(JPaths.get(src))
      batches.zipWithIndex.foreach { case (df, i) =>
        val tmp = root + s"/${sub}_tmp$i"
        df.coalesce(1).write.parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        JFiles.move(part.toPath, JPaths.get(src, s"b$i.parquet"))
        JPaths.get(src, s"b$i.parquet").toFile
          .setLastModified(1000000L * (i + 1))
        ()
      }
      spark.readStream.schema(batches.head.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    }
    // the shape that exposed the hazard (sf0.001 key 2): an early
    // unmatched point (evicted in watermark round 1, long before the
    // markers) and a late unmatched point past the interval's
    // maxDuration bound (evictable only once the markers advance the
    // watermark) — BOTH must surface as null-padded rows
    val pts = Seq(
        (2L, ts("1995-10-29 00:00:00")), (2L, ts("2001-10-19 00:00:00")))
      .toDF("k", "p_ts")
    val iv = Seq(
        (2L, ts("2001-07-11 00:00:00"), ts("2001-08-10 00:00:00")))
      .toDF("k", "i_start", "i_end")
    val far1 = ts("2001-10-21 00:00:00"); val far2 = ts("2001-10-21 00:01:00")
    // non-null in EVERY timestamp column, like SparkEntry.markerLike
    def mkP(t: java.sql.Timestamp) = Seq((-1L, t)).toDF("k", "p_ts")
    def mkI(t: java.sql.Timestamp) =
      Seq((-1L, t, t)).toDF("k", "i_start", "i_end")
    val pStream = ship("p", Seq(pts, mkP(far1), mkP(far2)))
    val iStream = ship("i", Seq(iv, mkI(far1), mkI(far2)))
    val out = graft.streaming.StreamIntervalJoin.pointInInterval(
      pStream, "k", "p_ts", iStream, "k", "i_start", "i_end",
      watermark = "1 hour", maxDuration = "31 days",
      select = Seq(col("p.k"), col("p.p_ts"), col("i.i_start")),
      joinType = "left_outer")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("scratch_oj")
      .option("checkpointLocation", root + "/ckpt").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("scratch_oj").where(col("k") >= 0)
      .orderBy("p_ts").collect()
    spark.catalog.dropTempView("scratch_oj")
    assert(rows.length === 2,
      s"expected 2 null-padded rows, got:\n${rows.mkString("\n")}")
    assert(rows.forall(_.isNullAt(2)), "both points are unmatched")
  }
}
