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

  // ---- RAKE keyphrases (t42) ----

  test("rake: phrases split at stopwords, scores are degree/freq sums, " +
      "repeated phrases count instances") {
    val docs = Seq(
      (1L, "deep learning of deep learning"),
      (2L, "deep learning and fast systems"),
      (3L, "fast systems")).toDF("id", "text")
    val out = TextAnalysis.rakeKeyphrases(docs, "id", "text",
      stopwords = Seq("of", "and"), topK = 10)
      .select("phrase", "n_occurrences", "rake_score")
      .as[(String, Long, Double)].collect()
    val m = out.map(r => r._1 -> ((r._2, r._3))).toMap
    // phrase instances: "deep learning" x3, "fast systems" x2
    assert(m("deep learning")._1 === 3L)
    assert(m("fast systems")._1 === 2L)
    // deep: freq 3, deg 6 -> 2; learning same; fast: freq 2, deg 4 -> 2
    assert(m("deep learning")._2 === 4.0)
    assert(m("fast systems")._2 === 4.0)
  }

  test("rake: all-stopword and empty docs yield nothing; word " +
      "multiplicity inside one phrase counts twice") {
    val docs = Seq((1L, "of and of"), (2L, ""), (3L, "big big"))
      .toDF("id", "text")
    val out = TextAnalysis.rakeKeyphrases(docs, "id", "text",
      stopwords = Seq("of", "and"), topK = 10)
      .select("phrase", "rake_score").as[(String, Double)].collect()
    // only "big big": word 'big' freq 1 (one phrase), deg 2, score
    // 2/1 counted twice (multiplicity) = 4
    assert(out.toSeq === Seq(("big big", 4.0)))
  }

  // ---- Dunning log-likelihood ratio (t41) ----

  test("llr: hand-computed 2x2 contingency on a tiny corpus") {
    val docs = Seq("x y", "x y", "x z").toDF("text")
    val out = TextAnalysis.llrCollocations(docs, "text",
      minCount = 1, topK = 10)
      .select("term_a", "term_b", "n_pair", "llr")
      .as[(String, String, Long, Double)].collect()
    val m = out.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // bigram slots: B=3 events; first-slot c(x.)=3, second c(.y)=2 c(.z)=1
    // (x,y): k11=2 k12=1 k21=0 k22=0
    def cell(k: Double, rs: Double, cs: Double, n: Double): Double =
      if (k > 0) k * math.log(k * n / (rs * cs)) else 0.0
    val gXY = 2.0 * (cell(2, 3, 2, 3) + cell(1, 3, 1, 3) +
      cell(0, 0, 2, 3) + cell(0, 0, 1, 3))
    assert(m(("x", "y"))._1 === 2L)
    assert(math.abs(m(("x", "y"))._2 - gXY) < 1e-12)
  }

  test("llr: zero cells contribute zero mass and G2 is nonnegative; " +
      "independent-ish pairs score below locked collocations") {
    // 'a b' always co-occur (locked); 'c' pairs with many seconds
    val docs = Seq("a b", "a b", "a b", "c d", "c e", "c f", "d c")
      .toDF("text")
    val out = TextAnalysis.llrCollocations(docs, "text",
      minCount = 1, topK = 20)
      .select("term_a", "term_b", "llr")
      .as[(String, String, Double)].collect()
    assert(out.forall(_._3 >= -1e-12))
    val m = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(m(("a", "b")) > m(("c", "d")))
  }

  test("llr: deterministic across partitioning") {
    val docs = (0 until 80).map(i =>
      s"w${i % 7} w${(i * 3) % 5} w${i % 7} tail").toDF("text")
    val a = TextAnalysis.llrCollocations(docs, "text", 2, 25)
      .orderBy("term_a", "term_b").collect()
    val b = TextAnalysis.llrCollocations(docs.repartition(9), "text", 2, 25)
      .orderBy("term_a", "term_b").collect()
    assert(a === b)
  }
}
