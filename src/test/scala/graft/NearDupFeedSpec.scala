package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.VersionedTable
import graft.streaming.NearDupFeed

/** Streaming near-dup gate: within-batch and cross-batch duplicates
  * flagged against the persisted LSH index, uniques accepted, restart
  * processes only new files, and a replayed epoch changes nothing.
  */
class NearDupFeedSpec extends SparkTestBase {
  import spark.implicits._

  test("single-batch gate decisions equal the batch minhashPairs " +
      "min-partner mapping at a lossy threshold") {
    // synthetic corpus with planted near-dups: every doc i gets a twin
    // i+1000 with the last 2 of its 12 tokens dropped (high Jaccard);
    // unrelated docs share no shingles
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu",
      "xi", "omicron", "pi", "rho", "sigma", "tau", "upsilon")
    def text(i: Int): String =
      (0 until 12).map(j => words((i * 7 + j * 3) % words.length) +
        (i % 5)).mkString(" ")
    val base = (0 until 30).map(i => (i.toLong, text(i)))
    val twins = (0 until 30).map(i =>
      (i + 1000L, text(i).split(" ").dropRight(2).mkString(" ")))
    val docs = (base ++ twins).toDF("doc_id", "text")

    val root = Files.createTempDirectory("neardup_eq")
    val dir = root.resolve("idx").toString
    val srcDir = root.resolve("src")
    Files.createDirectory(srcDir)
    docs.coalesce(1).write.parquet(root.resolve("tmp").toString)
    val part = root.resolve("tmp").toFile.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, srcDir.resolve("b1.parquet"))
    val stream = spark.readStream.schema(docs.schema)
      .parquet(srcDir.toString)
    val q = NearDupFeed.startGate(spark, stream, dir, "doc_id", "text",
      n = 3, numHashes = 128, bands = 16, threshold = 0.5,
      checkpoint = root.resolve("ckpt").toString)
    q.awaitTermination(120000)
    val decisions = NearDupFeed.readDecisions(spark, dir)
      .select("doc_id", "dup_of")
      .as[(Long, Option[Long])].collect().toMap

    // the batch operator with identical parameters: dup_of(d) must be
    // the smallest partner below d among verified pairs
    val pairs = graft.operators.Dedup.minhashPairs(docs, "doc_id",
      "text", n = 3, numHashes = 128, bands = 16, threshold = 0.5)
      .select("doc_id", "doc_id_2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "the planted twins must produce pairs")
    val expect = (base ++ twins).map(_._1).map { d =>
      val partners = pairs.collect {
        case (a, b) if b == d && a < d => a
        case (a, b) if a == d && b < d => b
      }
      d -> (if (partners.isEmpty) None else Some(partners.min))
    }.toMap
    assert(decisions === expect,
      "online gate must equal the batch operator's min-partner mapping")
  }

  private val textA =
    "the quick brown fox jumps over the lazy dog again and again today"
  private val textB =
    "completely different content about spark distributed joins and shuffles"
  private val textC =
    "a third unrelated corpus line with many novel tokens in this row"

  test("within-batch and cross-restart near-dups are flagged; uniques " +
      "are accepted into the index; replayed epochs are no-ops") {
    val root = Files.createTempDirectory("neardup")
    val dir = root.resolve("idx").toString
    val srcDir = root.resolve("src")
    Files.createDirectory(srcDir)
    val ckpt = root.resolve("ckpt").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    def stream = spark.readStream.option("header", "true")
      .schema(schema).csv(srcDir.toString)

    def decisions(): Seq[(Long, Option[Long])] =
      NearDupFeed.readDecisions(spark, dir)
        .select("doc_id", "dup_of").orderBy("doc_id")
        .as[(Long, Option[Long])].collect().toSeq

    // batch 1: doc 3 duplicates doc 1 WITHIN the batch
    Files.writeString(srcDir.resolve("b1.csv"),
      s"id,text\n1,$textA\n2,$textB\n3,$textA\n")
    val q1 = NearDupFeed.startGate(spark, stream, dir, "id", "text",
      checkpoint = ckpt,
      trigger = Trigger.ProcessingTime("500 milliseconds"))
    q1.processAllAvailable()
    q1.stop()
    assert(decisions() === Seq((1L, None), (2L, None), (3L, Some(1L))))
    val sim3 = NearDupFeed.readDecisions(spark, dir)
      .where(col("doc_id") === 3L).select("sim").as[Double].head()
    assert(sim3 === 1.0, "identical text must verify at Jaccard 1.0")

    // batch 2 after a RESTART: doc 4 duplicates doc 2 ACROSS batches
    // (via the persisted index), doc 5 is new
    Files.writeString(srcDir.resolve("b2.csv"),
      s"id,text\n4,$textB\n5,$textC\n")
    val q2 = NearDupFeed.startGate(spark, stream, dir, "id", "text",
      checkpoint = ckpt,
      trigger = Trigger.ProcessingTime("500 milliseconds"))
    q2.processAllAvailable()
    q2.stop()
    assert(decisions() === Seq((1L, None), (2L, None), (3L, Some(1L)),
      (4L, Some(2L)), (5L, None)))

    // only accepted docs live in the index — duplicates never index
    val indexed = VersionedTable.read(spark, NearDupFeed.shinglesTable(dir))
      .select("doc_id").as[Long].collect().toSet
    assert(indexed === Set(1L, 2L, 5L))

    // crash-retry: re-applying batch 2 under its committed epoch (1)
    // recomputes the same decisions and every append is skipped
    NearDupFeed.applyBatch(spark,
      Seq((4L, textB), (5L, textC)).toDF("id", "text"), dir,
      "id", "text", n = 3, numHashes = 128, bands = 16, rows = 8,
      threshold = 0.7, epoch = 1L)
    assert(decisions().size === 5)
    assert(VersionedTable.read(spark, NearDupFeed.bucketsTable(dir))
      .where(col("doc_id") === 5L).count() === 16L,
      "doc 5 must have exactly one bucket row per band — no replay dup")

    // compaction between stopped-stream batches is invisible: the next
    // batch dedups against the compacted index identically
    NearDupFeed.compactIndex(spark, dir, numFiles = 2)
    Files.writeString(srcDir.resolve("b3.csv"),
      s"id,text\n6,$textC\n7,seven brand new words never indexed before\n")
    val q3 = NearDupFeed.startGate(spark, stream, dir, "id", "text",
      checkpoint = ckpt,
      trigger = Trigger.ProcessingTime("500 milliseconds"))
    q3.processAllAvailable()
    q3.stop()
    assert(decisions().takeRight(2) === Seq((6L, Some(5L)), (7L, None)),
      "post-compaction probes must still find the indexed docs")
  }
}
