package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.{Bm25Index, TextAnalysis}
import graft.sources.VersionedTable

class Bm25IndexSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int) = spark.range(n).select(
    col("id").as("doc_id"),
    concat_ws(" ", lit("alpha"),
      when(col("id") % 3 === 0, "beta gamma beta").otherwise("delta"),
      (col("id") % 11).cast("string")).as("text"))

  private val queries = Seq(
    (100L, "beta 3"), (200L, "alpha 7"), (300L, "gamma delta")
  ).toDF("qid", "qtext")

  private def adHoc(docs: org.apache.spark.sql.DataFrame) =
    TextAnalysis.bm25Retrieval(docs, "doc_id", "text", queries,
      "qid", "qtext", k = 4, maxDfRatio = 1.0)
      .select("qid", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet

  test("build + search reproduces the ad-hoc retrieval join exactly") {
    val dir = Files.createTempDirectory("graft_bm25i").toString + "/idx"
    val docs = corpus(200)
    Bm25Index.build(spark, docs, "doc_id", "text", dir)
    val h = Bm25Index.load(spark, dir, "doc_id")
    val got = Bm25Index.search(h, queries, "qid", "qtext", k = 4,
      maxDfRatio = 1.0)
      .select("qid", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === adHoc(docs))
  }

  test("appendRows merges df/stats subtotals: post-append search " +
      "equals ad-hoc over the union (idf and avgdl refreshed)") {
    val dir = Files.createTempDirectory("graft_bm25i2").toString + "/idx"
    val a = corpus(120)
    val b = corpus(200).where(col("doc_id") >= 120)
    Bm25Index.build(spark, a, "doc_id", "text", dir)
    val v0 = Bm25Index.load(spark, dir, "doc_id").version
    val v1 = Bm25Index.appendRows(spark, dir, b, "doc_id", "text")
    assert(v1 > v0, "append must commit a new postings version")
    val h = Bm25Index.load(spark, dir, "doc_id")
    assert(h.n === 200.0, "N reflects both appends")
    val got = Bm25Index.search(h, queries, "qid", "qtext", k = 4,
      maxDfRatio = 1.0)
      .select("qid", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === adHoc(corpus(200)),
      "index over A then append B == from-scratch over A∪B")
  }

  test("txn append is idempotent: a replayed epoch changes nothing") {
    val dir = Files.createTempDirectory("graft_bm25i3").toString + "/idx"
    Bm25Index.build(spark, corpus(50), "doc_id", "text", dir)
    val b = corpus(80).where(col("doc_id") >= 50)
    Bm25Index.appendRows(spark, dir, b, "doc_id", "text",
      txn = Some(("w1", 1L)))
    val h1 = Bm25Index.load(spark, dir, "doc_id")
    val r1 = Bm25Index.search(h1, queries, "qid", "qtext", k = 4,
      maxDfRatio = 1.0).collect().toSet
    // replay the same epoch (crash-recovery path)
    Bm25Index.appendRows(spark, dir, b, "doc_id", "text",
      txn = Some(("w1", 1L)))
    val h2 = Bm25Index.load(spark, dir, "doc_id")
    assert(h2.version === h1.version, "replay must not commit")
    assert(h2.n === 80.0)
    assert(Bm25Index.search(h2, queries, "qid", "qtext", k = 4,
      maxDfRatio = 1.0).collect().toSet === r1)
  }

  test("stop-term pruning uses the CURRENT doc count after appends") {
    // 'alpha' is in every doc; with maxDfRatio 0.5 it must stay pruned
    // after appends too (df and N grow together)
    val dir = Files.createTempDirectory("graft_bm25i4").toString + "/idx"
    Bm25Index.build(spark, corpus(60), "doc_id", "text", dir)
    Bm25Index.appendRows(spark, dir,
      corpus(100).where(col("doc_id") >= 60), "doc_id", "text")
    val h = Bm25Index.load(spark, dir, "doc_id")
    val got = Bm25Index.search(h,
      Seq((1L, "alpha")).toDF("qid", "qtext"), "qid", "qtext", k = 5,
      maxDfRatio = 0.5).count()
    assert(got === 0L, "an all-corpus term stays stop-pruned")
  }

  test("a tokenless batch is a no-op append; non-integral ids and " +
      "empty corpora are rejected loudly") {
    val dir = Files.createTempDirectory("graft_bm25i6").toString + "/idx"
    Bm25Index.build(spark, corpus(30), "doc_id", "text", dir)
    val h0 = Bm25Index.load(spark, dir, "doc_id")
    // all-whitespace text passes null filters but yields no tokens —
    // must not write a (0, NULL) stats row
    val v = Bm25Index.appendRows(spark, dir,
      Seq((999L, "   "), (998L, "")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(v === h0.version, "tokenless batch must not commit")
    assert(Bm25Index.load(spark, dir, "doc_id").n === 30.0)
    val eId = intercept[IllegalArgumentException] {
      Bm25Index.build(spark,
        Seq(("a1", "text here")).toDF("doc_id", "text"),
        "doc_id", "text", dir + "2")
    }
    assert(eId.getMessage.contains("must be integral"))
    val eEmpty = intercept[IllegalArgumentException] {
      Bm25Index.build(spark,
        Seq((1L, "  ")).toDF("doc_id", "text"), "doc_id", "text",
        dir + "3")
    }
    assert(eEmpty.getMessage.contains("no indexable"))
  }

  test("staleness stamp tracks the source lake table") {
    val tmp = Files.createTempDirectory("graft_bm25i5").toString
    val dir = tmp + "/idx"
    val src = tmp + "/src"
    val docs = corpus(40)
    VersionedTable.create(spark, src, StructType(docs.schema.fields))
    VersionedTable.append(spark, docs, src)
    val srcV = VersionedTable.latest(spark, src)._1
    Bm25Index.build(spark, docs, "doc_id", "text", dir,
      sourceVersion = Some(srcV))
    assert(!Bm25Index.isStale(spark, dir, src))
    VersionedTable.append(spark,
      corpus(50).where(col("doc_id") >= 40), src)
    assert(Bm25Index.isStale(spark, dir, src))
  }
}
