package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.AnnIndex
import graft.streaming.AnnFeed

/** Streaming ANN index maintenance: streamed rows are indexed with the
  * stored quantizer, visible to a reloaded handle, survive restarts,
  * and a replayed epoch cannot double-index.
  */
class AnnFeedSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8

  private def corpus(n: Int) = spark.range(n).select(
    col("id"),
    transform(sequence(lit(0), lit(dim - 1)),
      i => (shiftrightunsigned(xxhash64(col("id") * dim + i), 11)
        .cast("double") / (1L << 53).toDouble) - 0.5).as("v"))

  test("streamed appends keep the persisted index fresh exactly-once " +
      "across restarts") {
    val root = Files.createTempDirectory("annfeed")
    val dir = root.resolve("idx").toString
    val srcDir = root.resolve("src")
    Files.createDirectory(srcDir)
    val ckpt = root.resolve("ckpt").toString

    val base = corpus(100)
    AnnIndex.build(spark, base, "id", "v", dir, nlist = 4, iters = 3)

    // Double.toString round-trips exactly, so the streamed vector 1000
    // is bit-identical to corpus row 0's vector
    val v0 = base.where(col("id") === 0).select("v").as[Seq[Double]].head()
    def csvLine(id: Long, vec: Seq[Double]): String =
      s"$id,${vec.mkString(";")}"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("vs", StringType)))
    def stream = spark.readStream.option("header", "true")
      .schema(schema).csv(srcDir.toString)
      .select(col("id"),
        split(col("vs"), ";").cast("array<double>").as("v"))

    Files.writeString(srcDir.resolve("b1.csv"),
      "id,vs\n" + csvLine(1000L, v0) + "\n")
    val q1 = AnnFeed.startAppend(spark, stream, dir, "id", "v", ckpt,
      trigger = Trigger.ProcessingTime("500 milliseconds"))
    q1.processAllAvailable()
    q1.stop()

    // a handle loaded AFTER the batch sees the streamed row — and it
    // wins the search for its own duplicate (cosine ~ 1)
    val h1 = AnnIndex.load(spark, dir, "id", "v")
    assert(h1.corpus.count() === 101L)
    val q = base.where(col("id") === 0)
      .select(col("id").as("qid"), col("v").as("qv"))
    val top = AnnIndex.topK(h1, q, "qid", "qv", k = 1, nprobe = 4)
      .select("id", "sim").as[(Long, Double)].head()
    assert(top._1 === 1000L, "the streamed duplicate must be top-1")
    assert(top._2 > 0.999999)

    // restart with the same checkpoint: only the new file is processed
    Files.writeString(srcDir.resolve("b2.csv"),
      "id,vs\n" + csvLine(1001L, v0.map(-_)) + "\n" +
        csvLine(1002L, v0.map(_ * 0.5)) + "\n")
    val q2 = AnnFeed.startAppend(spark, stream, dir, "id", "v", ckpt,
      trigger = Trigger.ProcessingTime("500 milliseconds"))
    q2.processAllAvailable()
    q2.stop()

    val h2 = AnnIndex.load(spark, dir, "id", "v")
    assert(h2.corpus.count() === 103L,
      "restart must process only the new batch — no b1 re-index")
    assert(h2.corpus.where(col("id").isin(1000L, 1001L, 1002L))
      .count() === 3L)
    assert(h2.corpusVersion > h1.corpusVersion)

    // a crashed-and-replayed batch cannot double-index: re-applying
    // batch 0's rows under its already-committed epoch is a no-op
    AnnIndex.appendRows(spark, dir, Seq((1000L, v0)).toDF("id", "v"),
      "id", "v", txn = Some((AnnFeed.WriterId, 0L)))
    assert(AnnIndex.load(spark, dir, "id", "v").corpus.count() === 103L)
    h1.release()
    h2.release()
  }
}
