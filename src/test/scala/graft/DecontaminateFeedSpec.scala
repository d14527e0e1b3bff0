package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.streaming.DecontaminateFeed

/** Streaming decontamination gate: scores match the batch report,
  * verdicts threshold correctly, restarts process only new files, and
  * scoring without an indexed bench fails loudly.
  */
class DecontaminateFeedSpec extends SparkTestBase {
  import spark.implicits._

  test("ingest-time scores equal the batch report; restart-safe; " +
      "unindexed dir refuses") {
    val root = Files.createTempDirectory("deconfeed")
    val dir = root.resolve("idx").toString
    val srcDir = root.resolve("src")
    Files.createDirectory(srcDir)
    val ckpt = root.resolve("ckpt").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    def stream = spark.readStream.option("header", "true")
      .schema(schema).csv(srcDir.toString)

    // scoring before indexBench must fail with guidance
    val e = intercept[IllegalArgumentException] {
      DecontaminateFeed.startScore(spark, stream, dir, "id", "text",
        checkpoint = ckpt)
    }
    assert(e.getMessage.contains("indexBench"))

    val bench = Seq((1L, "alpha beta gamma delta epsilon"))
      .toDF("id", "text")
    DecontaminateFeed.indexBench(spark, bench, "text", dir, n = 3)

    // doc 10: fully contaminated (identical text -> overlap 1.0);
    // doc 11: disjoint (overlap 0.0)
    Files.writeString(srcDir.resolve("b1.csv"),
      "id,text\n10,alpha beta gamma delta epsilon\n" +
        "11,one two three four five six\n")
    val q1 = DecontaminateFeed.startScore(spark, stream, dir, "id",
      "text", maxOverlap = 0.5, checkpoint = ckpt,
      trigger = Trigger.ProcessingTime("500 milliseconds"))
    q1.processAllAvailable()
    q1.stop()
    def rows(): Seq[(Long, Double, Long, Boolean)] =
      DecontaminateFeed.readDecisions(spark, dir)
        .orderBy("doc_id")
        .as[(Long, Double, Long, Boolean)].collect().toSeq
    assert(rows() === Seq((10L, 1.0, 3L, false), (11L, 0.0, 4L, true)))

    // restart with the same checkpoint: only the new file is scored
    Files.writeString(srcDir.resolve("b2.csv"),
      "id,text\n12,zeta alpha beta gamma delta epsilon\n")
    val q2 = DecontaminateFeed.startScore(spark, stream, dir, "id",
      "text", maxOverlap = 0.5, checkpoint = ckpt,
      trigger = Trigger.ProcessingTime("500 milliseconds"))
    q2.processAllAvailable()
    q2.stop()
    // doc 12 has 4 shingles, 3 of which (alpha.., beta.., gamma..) hit
    assert(rows() === Seq((10L, 1.0, 3L, false), (11L, 0.0, 4L, true),
      (12L, 0.75, 4L, false)))
  }
}
