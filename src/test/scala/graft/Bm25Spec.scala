package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  test("matches the closed form on a hand-computed corpus") {
    val docs = Seq(
      (1L, "spark spark engine"),
      (2L, "spark is fine"),
      (3L, "nothing relevant at all here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", "text", Seq("spark"))
      .select("doc_id", "score", "n_hits").as[(Long, Double, Int)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // N=3, df=2, idf = ln(1 + 1.5/2.5); avgdl = (3+3+5)/3
    val idf = math.log(1.0 + 1.5 / 2.5)
    val avgdl = 11.0 / 3.0
    def s(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
    assert(math.abs(out(1L)._1 - s(2, 3)) < 1e-12)
    assert(math.abs(out(2L)._1 - s(1, 3)) < 1e-12)
    assert(!out.contains(3L), "no query term, no row")
    assert(out(1L)._2 === 1)
  }

  test("term saturation and length normalization behave as BM25 should") {
    val docs = Seq(
      (1L, "term filler filler filler"),
      (2L, "term term filler filler"),
      (3L, "term term term filler"),
      (4L, "term " + Seq.fill(40)("pad").mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", "text", Seq("term"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // more occurrences help, with diminishing returns
    assert(out(2L) > out(1L) && out(3L) > out(2L))
    assert(out(3L) - out(2L) < out(2L) - out(1L), "saturation")
    // same tf in a much longer doc scores lower
    assert(out(4L) < out(1L), "length normalization")
  }

  test("deterministic across repartitioning") {
    val docs = spark.range(400).select(col("id").as("doc_id"),
      concat_ws(" ", lit("alpha"),
        when(col("id") % 3 === 0, "beta gamma beta").otherwise("delta"),
        (col("id") % 11).cast("string")).as("text"))
    def run(p: Int) = TextAnalysis.bm25(docs.repartition(p), "doc_id",
      "text", Seq("beta", "alpha"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(run(1) === run(13))
  }
}
