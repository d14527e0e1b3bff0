package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The full Gopher repetition battery vs an independent in-test
  * reference implementation, on hand fixtures and randomized strings.
  */
class GopherSpec extends SparkTestBase {
  import spark.implicits._

  private val topNs = Seq(2, 3, 4)
  private val dupNs = (5 to 10).toSeq
  private val fields = topNs.map(n => s"top_${n}gram_char_frac") ++
    dupNs.map(n => s"dup_${n}gram_char_frac")

  /** Straight-line reference: the definitions, nothing shared with
    * the expression under test.
    */
  private def reference(text: String): Seq[Double] = {
    val toks = text.trim.split("\\s+", -1)
    val chars = toks.map(_.length) // ASCII fixtures: length == codepoints
    val total = chars.sum.toDouble
    def grams(n: Int): Seq[(Int, String)] =
      (0 to toks.length - n).map(i => i -> toks.slice(i, i + n).mkString(" "))
    val tops = topNs.map { n =>
      if (total == 0 || toks.length < n) 0.0
      else {
        val byGram = grams(n).groupBy(_._2).view
          .mapValues(_.size).toMap
        val best = byGram.toSeq.map { case (g, c) =>
          (c, g.length - (n - 1), g)
        }.sortBy { case (c, gc, g) => (-c, -gc, g) }.head
        best._1.toLong * best._2 / total
      }
    }
    val dups = dupNs.map { n =>
      if (total == 0 || toks.length < n) 0.0
      else {
        val byGram = grams(n).groupBy(_._2).view.mapValues(_.size).toMap
        val covered = Array.fill(toks.length)(false)
        for ((i, g) <- grams(n); if byGram(g) > 1; j <- i until i + n)
          covered(j) = true
        covered.zip(chars).filter(_._1).map(_._2).sum / total
      }
    }
    tops ++ dups
  }

  private def run(texts: Seq[String]): Seq[Seq[Double]] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    df.withColumn("g", GraftFunctions.gopherStats(col("text")))
      .orderBy("id")
      .select(fields.map(f => col(s"g.$f")): _*)
      .collect().toSeq.map(r => (0 until 9).map(r.getDouble))
  }

  test("hand fixtures match the closed forms") {
    val out = run(Seq(
      "a b a b a b",          // top-2 'a b' x3 of 5 bigrams, 6 chars
      "x y z x y z x y z",    // dup 5-grams cover everything
      "one two three four five six seven eight nine ten", // no repeats
      ""))
    // 'a b' count 3, chars 2, total 6
    assert(out(0)(0) === 3L * 2 / 6.0)
    assert(out(0)(3) === 0.0, "no repeated 5-gram")
    // 9 tokens of x y z: 5-grams repeat with period 3 -> all covered
    assert(out(1)(3) === 1.0)
    // bigrams of 9 tokens: 'x y' and 'y z' both occur 3x, 'z x' 2x;
    // the tie breaks to 'x y' (byte order); chars 2, total 9
    assert(out(1)(0) === 3L * 2 / 9.0)
    assert(out(2).drop(3).forall(_ === 0.0))
    assert(out(3).forall(_ === 0.0), "empty text is all zeros")
  }

  test("matches the independent reference on varied strings") {
    val texts = Seq(
      "a b a b a b",
      "x y z x y z x y z",
      "alpha beta gamma alpha beta gamma alpha beta delta",
      "one two three four five six seven eight nine ten",
      "p q p q p q p q p q p q p q p q",
      "w w w w w w w w w w w w",
      "s",
      "aa bb cc dd aa bb cc dd ee ff gg hh aa bb cc dd",
      (1 to 40).map(i => s"t${i % 7}").mkString(" "),
      (1 to 60).map(i => s"u${i % 13}").mkString(" "))
    val got = run(texts)
    for ((t, i) <- texts.zipWithIndex) {
      val want = reference(t)
      for (j <- 0 until 9)
        assert(math.abs(got(i)(j) - want(j)) < 1e-15,
          s"text $i field ${fields(j)}: got ${got(i)(j)} want ${want(j)}")
    }
  }

  test("SQL registration works") {
    spark.sql("SELECT graft_gopher_stats('a b a b a b') AS g")
      .select("g.top_2gram_char_frac").as[Double].head() match {
      case v => assert(v === 1.0)
    }
  }
}
