package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class NaiveBayesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "apple banana apple pear", "fruit"),
    (2L, "banana pear pear apple", "fruit"),
    (3L, "dog cat dog wolf", "animal"),
    (4L, "cat wolf cat dog", "animal"),
    (5L, "apple dog", null.asInstanceOf[String])
  ).toDF("doc_id", "text", "label")

  test("separable classes classify correctly; null labels score but do not train") {
    val model = TextAnalysis.trainNaiveBayes(corpus, "text", "label")
    assert(model.classes.map(_.cls) === Seq("animal", "fruit"))
    val pred = TextAnalysis.nbClassify(corpus, "doc_id", "text", model)
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    assert(pred(1L) === "fruit" && pred(2L) === "fruit")
    assert(pred(3L) === "animal" && pred(4L) === "animal")
    // the unlabeled doc is still scored (and its tokens are NOT vocab:
    // only labeled rows train)
    assert(pred.contains(5L))
    val vocab = model.tokenLogp.select("tok").distinct()
      .as[String].collect().toSet
    assert(vocab === Set("apple", "banana", "pear", "dog", "cat", "wolf"))
  }

  test("smoothed scores match the hand-computed closed form") {
    val tiny = Seq((1L, "a a b", "X"), (2L, "c c d", "Y"))
      .toDF("doc_id", "text", "label")
    val model = TextAnalysis.trainNaiveBayes(tiny, "text", "label")
    // V = 4, 3 tokens per class => denom = 7; priors = 1/2
    val scores = TextAnalysis.nbScore(tiny, "doc_id", "text", model)
      .select("doc_id", "cls", "score").as[(Long, String, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val lnHalf = math.log(0.5)
    assert(math.abs(scores((1L, "X")) -
      (lnHalf + 2 * math.log(3.0 / 7) + math.log(2.0 / 7))) < 1e-9)
    assert(math.abs(scores((1L, "Y")) -
      (lnHalf + 3 * math.log(1.0 / 7))) < 1e-9)
    assert(math.abs(scores((2L, "Y")) -
      (lnHalf + 2 * math.log(3.0 / 7) + math.log(2.0 / 7))) < 1e-9)
    // all-OOV document: prior + n_tokens * oov floor, argmax = tie on
    // token terms, broken by... equal scores => class name ascending
    val oov = Seq((9L, "zz yy")).toDF("doc_id", "text")
    val s9 = TextAnalysis.nbScore(oov, "doc_id", "text", model)
      .select("cls", "score").as[(String, Double)].collect().toMap
    assert(math.abs(s9("X") - (lnHalf + 2 * math.log(1.0 / 7))) < 1e-9)
    assert(s9("X") === s9("Y"))
    val p9 = TextAnalysis.nbClassify(oov, "doc_id", "text", model)
      .select("pred").as[String].head()
    assert(p9 === "X", "exact tie must break on class name")
  }

  test("minCount prunes rare tokens from the vocabulary cross-class") {
    val m1 = TextAnalysis.trainNaiveBayes(corpus, "text", "label")
    val m2 = TextAnalysis.trainNaiveBayes(corpus, "text", "label",
      minCount = 3L)
    val v2 = m2.tokenLogp.select("tok").distinct().as[String].collect().toSet
    // totals: apple=3, banana=2, pear=3, dog=3, cat=3, wolf=2
    assert(v2 === Set("apple", "pear", "dog", "cat"))
    assert(m1.tokenLogp.select("tok").distinct().count() === 6)
    // pruned model still separates the clearly-labeled docs
    val pred = TextAnalysis.nbClassify(corpus, "doc_id", "text", m2)
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    assert(pred(1L) === "fruit" && pred(3L) === "animal")
  }

  test("scores are bit-identical under repartitioning") {
    val big = spark.range(300).select(col("id").as("doc_id"),
      concat_ws(" ",
        when(col("id") % 2 === 0, "alpha beta gamma").otherwise("delta eps"),
        (col("id") % 17).cast("string"),
        (col("id") % 5).cast("string")).as("text"),
      when(col("id") % 2 === 0, "even").otherwise("odd").as("label"))
    def run(parts: Int): Map[(Long, String), Double] = {
      val df = big.repartition(parts)
      val m = TextAnalysis.trainNaiveBayes(df, "text", "label")
      TextAnalysis.nbScore(df, "doc_id", "text", m)
        .select("doc_id", "cls", "score").as[(Long, String, Double)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
    }
    val a = run(1)
    val b = run(13)
    assert(a === b, "decimal-stabilized sums must not depend on layout")
  }
}
