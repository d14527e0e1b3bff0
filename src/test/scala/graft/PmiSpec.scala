package graft

import graft.operators.TextAnalysis

/** PMI collocation mining (t31). */
class PmiSpec extends SparkTestBase {
  import spark.implicits._

  test("pmi: hand-computed counts and value") {
    val docs = Seq("x y", "x y", "x z").toDF("text")
    val out = TextAnalysis.pmiCollocations(docs, "text",
      minCount = 1, topK = 10)
      .select("term_a", "term_b", "n_pair", "pmi")
      .as[(String, String, Long, Double)].collect()
    // bigrams: (x,y)x2 (x,z)x1, n=3; unigrams x:3 y:2 z:1, u=6
    val m = out.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(m(("x", "y"))._1 === 2L)
    assert(m(("x", "z"))._1 === 1L)
    // pmi(x,y) = ln((2/3) / ((3/6)*(2/6))) = ln 4
    assert(math.abs(m(("x", "y"))._2 - math.log(4.0)) < 1e-12)
    // pmi(x,z) = ln((1/3) / ((3/6)*(1/6))) = ln 4
    assert(math.abs(m(("x", "z"))._2 - math.log(4.0)) < 1e-12)
  }

  test("pmi: minCount gates hapax pairs") {
    val docs = Seq("x y", "x y", "x z").toDF("text")
    val out = TextAnalysis.pmiCollocations(docs, "text",
      minCount = 2, topK = 10)
      .select("term_a", "term_b").as[(String, String)].collect()
    assert(out.toSeq === Seq(("x", "y")))
  }

  test("pmi: topK cut follows the exact ratio, ties by terms") {
    // "a b" occurs with rarer unigrams than "c d" => higher PMI
    val docs = Seq("a b", "c d", "c d", "c e", "e c", "d c").toDF("text")
    val out = TextAnalysis.pmiCollocations(docs, "text",
      minCount = 1, topK = 1)
      .select("term_a", "term_b").as[(String, String)].collect()
    assert(out.toSeq === Seq(("a", "b")))
  }

  test("pmi: single-token docs contribute unigrams but no bigrams") {
    val docs = Seq("solo", "p q", "p q").toDF("text")
    val out = TextAnalysis.pmiCollocations(docs, "text", 1, 10)
      .select("term_a", "term_b", "n_pair", "pmi")
      .as[(String, String, Long, Double)].collect()
    assert(out.length === 1)
    val (_, _, n, pmi) = out.head
    assert(n === 2L)
    // n=2 pairs, u=5 tokens: ln((2/2) / ((2/5)*(2/5))) = ln(25/4)
    assert(math.abs(pmi - math.log(25.0 / 4.0)) < 1e-12)
  }

  test("pmi: partition-layout independent") {
    val docs = spark.range(500).selectExpr(
      "concat('w', id % 17, ' w', id % 5, ' w', id % 17) AS text")
    val a = TextAnalysis.pmiCollocations(docs, "text", 2, 25)
      .orderBy("term_a", "term_b").collect()
    val b = TextAnalysis.pmiCollocations(docs.repartition(9), "text", 2, 25)
      .orderBy("term_a", "term_b").collect()
    assert(a === b)
  }
}
