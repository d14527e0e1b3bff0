package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.{Bm25Index, TextAnalysis}
import graft.streaming.Bm25Feed

/** Streaming BM25 index maintenance: streamed docs refresh postings,
  * df, and corpus totals exactly-once; a reloaded handle's search
  * equals the from-scratch retrieval join over the full corpus;
  * restarts process only new files; replayed epochs cannot
  * double-count df.
  */
class Bm25FeedSpec extends SparkTestBase {
  import spark.implicits._

  private def docText(id: Long): String = {
    val tail = if (id % 3 == 0) "beta gamma beta" else "delta"
    s"alpha $tail ${id % 11}"
  }

  private def corpus(n: Int) = spark.range(n).select(
    col("id").as("doc_id"),
    concat_ws(" ", lit("alpha"),
      when(col("id") % 3 === 0, "beta gamma beta").otherwise("delta"),
      (col("id") % 11).cast("string")).as("text"))

  test("streamed docs keep the index fresh exactly-once across restarts") {
    val root = Files.createTempDirectory("bm25feed")
    val dir = root.resolve("idx").toString
    val srcDir = root.resolve("src")
    Files.createDirectory(srcDir)
    val ckpt = root.resolve("ckpt").toString

    Bm25Index.build(spark, corpus(100), "doc_id", "text", dir)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def stream = spark.readStream.option("header", "true")
      .option("sep", "\t").schema(schema).csv(srcDir.toString)

    def tsv(ids: Seq[Long]): String =
      "doc_id\ttext\n" + ids.map(i => s"$i\t${docText(i)}").mkString("\n") + "\n"

    Files.writeString(srcDir.resolve("b1.tsv"), tsv(Seq(100L, 101L)))
    val q1 = Bm25Feed.startAppend(spark, stream, dir, "doc_id", "text",
      ckpt, trigger = Trigger.ProcessingTime("500 milliseconds"))
    q1.processAllAvailable()
    q1.stop()

    var expectedN = 102
    val queries = Seq((1L, "beta 3"), (2L, "alpha 7")).toDF("qid", "qtext")
    def search(): Set[(Long, Long, Double, Int)] = {
      val h = Bm25Index.load(spark, dir, "doc_id")
      assert(h.n === expectedN.toDouble)
      Bm25Index.search(h, queries, "qid", "qtext", k = 6,
        maxDfRatio = 1.0)
        .select("qid", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    }
    def adHoc(n: Int): Set[(Long, Long, Double, Int)] =
      TextAnalysis.bm25Retrieval(corpus(n), "doc_id", "text", queries,
        "qid", "qtext", k = 6, maxDfRatio = 1.0)
        .select("qid", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet

    assert(search() === adHoc(102),
      "post-batch search == from-scratch over base + streamed docs")

    // restart with the same checkpoint: only the new file is processed
    Files.writeString(srcDir.resolve("b2.tsv"), tsv(Seq(102L, 103L)))
    val q2 = Bm25Feed.startAppend(spark, stream, dir, "doc_id", "text",
      ckpt, trigger = Trigger.ProcessingTime("500 milliseconds"))
    q2.processAllAvailable()
    q2.stop()

    expectedN = 104
    assert(search() === adHoc(104),
      "restart processes only b2 — no double-count of b1's df/stats")

    // a crashed-and-replayed batch cannot double-count: re-applying
    // batch 0's docs under its committed epoch is a no-op
    Bm25Index.appendRows(spark, dir,
      Seq((100L, docText(100L)), (101L, docText(101L)))
        .toDF("doc_id", "text"),
      "doc_id", "text", txn = Some((Bm25Feed.WriterId, 0L)))
    assert(search() === adHoc(104))
  }
}
