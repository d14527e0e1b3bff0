package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class Bm25RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark engine"),
    (2L, "spark is fine"),
    (3L, "nothing relevant at all here"),
    (4L, "engine room")
  ).toDF("doc_id", "text")

  test("per-query scores equal the single-query operator") {
    val queries = Seq((10L, "spark"), (20L, "engine")).toDF("qid", "qtext")
    val out = TextAnalysis.bm25Retrieval(docs, "doc_id", "text",
      queries, "qid", "qtext", k = 10, maxDfRatio = 1.0)
      .select("qid", "doc_id", "score")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for ((qid, term) <- Seq(10L -> "spark", 20L -> "engine")) {
      val single = TextAnalysis.bm25(docs, "doc_id", "text", Seq(term))
        .select("doc_id", "score").as[(Long, Double)].collect().toMap
      for ((d, s) <- single)
        assert(math.abs(out((qid, d)) - s) < 1e-6,
          s"qid=$qid doc=$d: join=${out((qid, d))} single=$s")
    }
    assert(!out.keySet.exists(_._2 == 3L), "doc without query terms absent")
  }

  test("rank order is (score desc, doc asc) and k caps candidates") {
    val queries = Seq((1L, "spark engine")).toDF("qid", "qtext")
    val out = TextAnalysis.bm25Retrieval(docs, "doc_id", "text",
      queries, "qid", "qtext", k = 2, maxDfRatio = 1.0)
      .orderBy("rank")
      .select("doc_id", "score", "rank").as[(Long, Double, Int)].collect()
    assert(out.length === 2, "k = 2 keeps exactly two")
    assert(out.map(_._3).toSeq === Seq(1, 2))
    assert(out(0)._2 >= out(1)._2, "scores descend")
  }

  test("stop-term pruning drops terms with df above the ratio") {
    // "common" is in every doc (df = 4/4); maxDfRatio 0.5 prunes it,
    // so a query of only that term retrieves nothing
    val d = Seq(
      (1L, "common alpha"), (2L, "common beta"),
      (3L, "common gamma"), (4L, "common delta")
    ).toDF("doc_id", "text")
    val q = Seq((1L, "common"), (2L, "alpha common")).toDF("qid", "qtext")
    val out = TextAnalysis.bm25Retrieval(d, "doc_id", "text",
      q, "qid", "qtext", k = 10, maxDfRatio = 0.5)
      .select("qid", "doc_id").as[(Long, Long)].collect()
    assert(!out.exists(_._1 == 1L), "all-stop-term query retrieves nothing")
    assert(out.filter(_._1 == 2L).map(_._2).toSet === Set(1L),
      "surviving rare term still retrieves its doc")
  }

  test("query-side repetition does not change scores (distinct terms)") {
    val q1 = Seq((1L, "spark")).toDF("qid", "qtext")
    val q2 = Seq((1L, "spark spark spark")).toDF("qid", "qtext")
    def run(q: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bm25Retrieval(docs, "doc_id", "text", q,
        "qid", "qtext", k = 10, maxDfRatio = 1.0)
        .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(run(q1) === run(q2))
  }

  test("qidCol == idCol is rejected loudly (output needs both columns)") {
    val q = Seq((9L, "spark")).toDF("doc_id", "qtext")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bm25Retrieval(docs, "doc_id", "text", q,
        "doc_id", "qtext", k = 3)
    }
    assert(e.getMessage.contains("qidCol must differ"))
  }

  test("deterministic across repartitioning") {
    val d = spark.range(300).select(col("id").as("doc_id"),
      concat_ws(" ", lit("alpha"),
        when(col("id") % 3 === 0, "beta gamma beta").otherwise("delta"),
        (col("id") % 11).cast("string")).as("text"))
    val q = spark.range(20).select(col("id").as("qid"),
      when(col("id") % 2 === 0, "beta 3").otherwise("alpha 7").as("qtext"))
    def run(p: Int) = TextAnalysis.bm25Retrieval(
      d.repartition(p), "doc_id", "text", q.repartition(p),
      "qid", "qtext", k = 4, maxDfRatio = 1.0)
      .select("qid", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(run(1) === run(7))
  }
}
