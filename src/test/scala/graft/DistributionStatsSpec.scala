package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Shannon entropy + Gini coefficient (a35/a36). */
class DistributionStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("entropy: uniform distribution gives ln(k); skew lowers it") {
    val uni = (1 to 40).map(i => ("u", s"c${i % 4}"))
    val skew = (1 to 40).map(i => ("s", if (i <= 37) "a" else s"c$i"))
    val df = (uni ++ skew).toDF("k", "cat")
    val out = Analytics.entropy(df, Seq("k"), "cat")
      .select("k", "n", "entropy").as[(String, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("u")._1 === 40L)
    assert(math.abs(out("u")._2 - math.log(4.0)) < 1e-12)
    assert(out("s")._2 < out("u")._2)
  }

  test("entropy: single category is zero; hand-computed mixed case") {
    val df = (Seq.fill(7)(("one", "x")) ++
      Seq(("m", "a"), ("m", "b"), ("m", "c"), ("m", "c"))).toDF("k", "cat")
    val out = Analytics.entropy(df, Seq("k"), "cat")
      .select("k", "entropy").as[(String, Double)].collect().toMap
    assert(math.abs(out("one")) < 1e-12)
    // H = ln4 - (2 ln 2)/4
    val want = math.log(4.0) - 2.0 * math.log(2.0) / 4.0
    assert(math.abs(out("m") - want) < 1e-12)
  }

  test("entropy: null categories excluded") {
    val df = Seq(("k", Option("a")), ("k", Option("a")), ("k", None))
      .toDF("k", "cat")
    val out = Analytics.entropy(df, Seq("k"), "cat")
      .select("n", "entropy").as[(Long, Double)].head()
    assert(out._1 === 2L && math.abs(out._2) < 1e-12)
  }

  test("gini: constant distribution is exactly zero") {
    val df = (1 to 9).map(i => ("k", 5.0)).toDF("k", "v")
    val g = Analytics.gini(df, Seq("k"), "v")
      .select("gini").as[Double].head()
    assert(g === 0.0)
  }

  test("gini: all mass on one observation — closed form") {
    val df = Seq(("k", 0.0), ("k", 0.0), ("k", 0.0), ("k", 10.0))
      .toDF("k", "v")
    // G = (2*4*10 - 5*10) / (4*10) = 0.75
    val g = Analytics.gini(df, Seq("k"), "v").select("gini")
      .as[Double].head()
    assert(g === 0.75)
  }

  test("gini: scale-invariant and exclusion contract") {
    val base = (1 to 50).map(i => ("a", (i * i % 37).toDouble))
    val scaled = base.map { case (_, v) => ("b", v * 2) }
    val df = (base ++ scaled).toDF("k", "v")
      .union(Seq(("a", -1.0)).toDF("k", "v"))   // negative: excluded
      .union(Seq(("a", Double.NaN)).toDF("k", "v")) // non-stabilizing
    val out = Analytics.gini(df, Seq("k"), "v")
      .select("k", "n", "gini").as[(String, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("a")._1 === 50L, "negative/NaN rows must not count")
    assert(math.abs(out("a")._2 - out("b")._2) < 1e-12,
      "Gini is scale-invariant")
  }

  test("gini: zero-sum groups dropped; layout independent") {
    val zeros = Seq(("z", 0.0), ("z", 0.0)).toDF("k", "v")
    val real = (1 to 30).map(i => ("r", (i % 7).toDouble)).toDF("k", "v")
    val df = zeros.union(real)
    val out = Analytics.gini(df, Seq("k"), "v")
    assert(out.select("k").as[String].collect().toSeq === Seq("r"))
    val a = out.orderBy("k").collect()
    val b = Analytics.gini(df.repartition(13), Seq("k"), "v")
      .orderBy("k").collect()
    assert(a === b)
  }

  test("momentsProfile: symmetric data has zero skew, a two-point " +
    "mass has kurtosis_excess -2, constants emit null") {
    val df = Seq.tabulate(8)(i => ("sym", (i % 4 + 1).toDouble)) ++
      Seq.fill(5)(("two", 0.0)) ++ Seq.fill(5)(("two", 10.0)) ++
      Seq.fill(4)(("const", 7.0))
    val out = Analytics.momentsProfile(df.toDF("k", "v"), Seq("k"), "v")
      .orderBy("k")
      .select("k", "n", "mean", "skewness", "kurtosis_excess")
      .as[(String, Long, Double, Option[Double], Option[Double])]
      .collect()
    val const = out(0); val sym = out(1); val two = out(2)
    assert(const === (("const", 4L, 7.0, None, None)))
    assert(sym._4 === Some(0.0)) // uniform over {1,2,3,4}: symmetric
    // a balanced Bernoulli has the minimum possible kurtosis: g2 = -2
    assert(two === (("two", 10L, 5.0, Some(0.0), Some(-2.0))))
  }

  test("momentsProfile: the |measure| < 1e7 width contract is enforced " +
    "loudly, and nulls still pass through silently") {
    val e = intercept[Exception] {
      Analytics.momentsProfile(
        Seq(("k", 1.0), ("k", 5.0e7)).toDF("k", "v"), Seq("k"), "v")
        .collect()
    }
    assert(e.getMessage.contains("1e7"))
    // nulls are excluded by the observation filter, never the guard
    val ok = Analytics.momentsProfile(
      Seq(("k", Some(1.0)), ("k", None), ("k", Some(3.0)))
        .toDF("k", "v"), Seq("k"), "v")
      .select("n").as[Long].head()
    assert(ok === 2L)
  }

  test("momentsProfile: partition-layout independent (exact decimal " +
    "power sums)") {
    val df = (1 to 300).map(i => ((i % 2).toString, (i * 17 % 97) / 4.0))
      .toDF("k", "v")
    val a = Analytics.momentsProfile(df.coalesce(1), Seq("k"), "v")
      .orderBy("k").collect()
    val b = Analytics.momentsProfile(df.repartition(13), Seq("k"), "v")
      .orderBy("k").collect()
    assert(a === b)
  }
}
