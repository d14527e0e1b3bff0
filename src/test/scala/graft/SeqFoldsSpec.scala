package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftshim.SparkShim

import graft.functions.SeqFolds
import graft.operators.Analytics

/** The native linear-time sequential-fold kernels (r14: replaced the
  * O(m²) `aggregate`+`concat(acc…)` HOF folds behind ewma / holt /
  * holtWinters / kaplanMeier).
  *
  * Two pins: (1) BIT-parity of the operators against driver-side
  * reference folds spelling the exact IEEE chains the old HOF plans
  * (and the DuckDB recursive-CTE oracles) evaluate — the oracles for
  * ts3/ts8/ts10/ts18 must not move; (2) the deep-key regime: a 500k
  * single-key series folds in milliseconds (the HOF fold would copy
  * ~1.25·10¹¹ elements), and the loud per-key bound fires with a named
  * message instead of an OOM straggler.
  */
class SeqFoldsSpec extends SparkTestBase {
  import spark.implicits._

  private def bits(a: Array[Double]): Array[Long] =
    a.map(java.lang.Double.doubleToRawLongBits)

  // deterministic pseudo-series (no RNG state; same shape as testdata)
  private def series(n: Int, k: Long): Array[Double] =
    Array.tabulate(n)(i => ((i * 131 + k * 17) % 997).toDouble / 4.0)

  test("ewma operator == driver reference fold, bit-exact") {
    val alpha = 0.3
    val a1 = 1.0 - alpha // one IEEE subtraction, as the plan literal
    val rows = for (k <- 0L until 7L; i <- 0 until 200)
      yield (s"k$k", i.toLong, series(200, k)(i))
    val df = rows.toDF("k", "ts", "v").repartition(5)
    val got = Analytics.ewma(df, Seq("k"), "ts", "v", alpha)
      .orderBy("k", "ts").select("k", "ewma")
      .as[(String, Double)].collect()
    val ref = (for (k <- 0L until 7L) yield {
      val xs = series(200, k)
      val out = new Array[Double](xs.length)
      var prev = 0.0
      for (i <- xs.indices) {
        val e = if (i == 0) xs(0) else alpha * xs(i) + a1 * prev
        out(i) = e; prev = e
      }
      out.map((s"k$k", _))
    }).flatten.toArray
    assert(got.map(_._1) === ref.map(_._1))
    assert(bits(got.map(_._2)) === bits(ref.map(_._2)))
  }

  test("holt operator == driver reference fold, bit-exact") {
    val alpha = 0.4; val beta = 0.2
    val a1 = 1.0 - alpha; val g1 = 1.0 - beta
    val rows = for (k <- 0L until 5L; i <- 0 until 150)
      yield (s"k$k", i.toLong, series(150, k + 3)(i))
    val df = rows.toDF("k", "ts", "v").repartition(7)
    val got = Analytics.holt(df, Seq("k"), "ts", "v", alpha, beta)
      .orderBy("k", "ts").select("k", "level", "trend")
      .as[(String, Double, Double)].collect()
    val ref = (for (k <- 0L until 5L) yield {
      val xs = series(150, k + 3)
      var pl = 0.0; var pb = 0.0
      xs.zipWithIndex.map { case (x, i) =>
        val nl = if (i == 0) x else alpha * x + a1 * (pl + pb)
        val nb = if (i == 0) 0.0 else beta * (nl - pl) + g1 * pb
        pl = nl; pb = nb
        (s"k$k", nl, nb)
      }
    }).flatten.toArray
    assert(bits(got.map(_._2)) === bits(ref.map(_._2)))
    assert(bits(got.map(_._3)) === bits(ref.map(_._3)))
  }

  test("holtWinters operator == driver reference fold (list-state), bit-exact") {
    // reference spells the seasonal state as a re-sliced LIST — the old
    // HOF/oracle formulation; the kernel's ring buffer must match it
    val alpha = 0.5; val beta = 0.25; val gamma = 0.1; val m = 6
    val a1 = 1.0 - alpha; val g1 = 1.0 - beta; val c1 = 1.0 - gamma
    val rows = for (k <- 0L until 4L; i <- 0 until 100)
      yield (s"k$k", i.toLong, series(100, k + 11)(i))
    val df = rows.toDF("k", "ts", "v").repartition(3)
    val got = Analytics.holtWinters(df, Seq("k"), "ts", "v",
      alpha, beta, gamma, period = m)
      .orderBy("k", "ts").select("k", "level", "trend", "seasonal")
      .as[(String, Double, Double, Double)].collect()
    val ref = (for (k <- 0L until 4L) yield {
      val xs = series(100, k + 11)
      // init level: exact-decimal mean of the warm-up (the plan's l0)
      val l0 = xs.take(m).map(x => BigDecimal(x).setScale(2))
        .sum.toDouble / m.toDouble
      var seas = xs.take(m).map(_ - l0).toList
      var l = l0; var b = 0.0
      xs.drop(m).map { x =>
        val sm = seas.head
        val nl = alpha * (x - sm) + a1 * (l + b)
        val nb = beta * (nl - l) + g1 * b
        val ns = gamma * (x - nl) + c1 * sm
        seas = seas.tail :+ ns
        l = nl; b = nb
        (s"k$k", nl, nb, ns)
      }
    }).flatten.toArray
    assert(got.length === ref.length)
    assert(bits(got.map(_._2)) === bits(ref.map(_._2)))
    assert(bits(got.map(_._3)) === bits(ref.map(_._3)))
    assert(bits(got.map(_._4)) === bits(ref.map(_._4)))
  }

  test("kaplanMeier operator == driver reference fold, bit-exact") {
    // subjects: time = id % 13 days, event iff id % 5 != 0, one cohort
    val subjects = spark.range(200).select(
      lit("c").as("cohort"), (col("id") % 13).as("t"),
      (col("id") % 5 =!= 0).as("ev"))
    val got = Analytics.kaplanMeier(subjects, Seq("cohort"), "t", "ev")
      .orderBy("t").select("t", "n_risk", "n_events", "survival")
      .as[(Long, Long, Long, Double)].collect()
    val byT = (0L until 200L).map(id => (id % 13, id % 5 != 0))
      .groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = 200L; var s = 1.0
    val ref = byT.map { case (t, g) =>
      val d = g.count(_._2).toLong
      val n = atRisk
      if (d > 0) s = s * ((n - d).toDouble / n.toDouble)
      atRisk -= g.length
      (t, n, d, s)
    }.toArray
    assert(got.map(r => (r._1, r._2, r._3)) === ref.map(r => (r._1, r._2, r._3)))
    assert(bits(got.map(_._4)) === bits(ref.map(_._4)))
  }

  test("deep single key folds linearly (500k observations, direct eval)") {
    val n = 500000
    val xs = new GenericArrayData(series(n, 1L))
    val t0 = System.nanoTime()
    val ew = SeqFolds.EwmaFold(SparkShim.toExpression(lit(0)), 0.3).nullSafeEval(xs)
      .asInstanceOf[GenericArrayData]
    val holt = SeqFolds.HoltFold(SparkShim.toExpression(lit(0)), 0.3, 0.1).nullSafeEval(xs)
    val hw = SeqFolds.HoltWintersFold(SparkShim.toExpression(lit(0)), SparkShim.toExpression(lit(0)),
      SparkShim.toExpression(lit(0)), 0.3, 0.1, 0.05).nullSafeEval(
      xs, new GenericArrayData(series(24, 2L)), 10.0)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ew.numElements() === n)
    assert(holt != null && hw != null)
    // the old O(m²) HOF fold is ~1.25e11 element copies here (minutes);
    // generous flake-proof ceiling, typical is < 100ms for all three
    assert(ms < 30000.0, s"deep-key fold took ${ms}ms — not linear?")
  }

  test("per-key bound fires loudly past 50M observations") {
    val e = intercept[IllegalArgumentException] {
      SeqFolds.boundCheck(SeqFolds.MaxSeriesPerKey + 1, "graft_ewma_fold")
    }
    assert(e.getMessage.contains("bounded at"))
    assert(e.getMessage.contains("graft_ewma_fold"))
    SeqFolds.boundCheck(SeqFolds.MaxSeriesPerKey, "ok") // at the bound: fine
  }

  test("nelsonAalen operator == driver reference fold; censored-only " +
      "steps carry the hazard") {
    val subjects = spark.range(100).select(
      lit("c").as("cohort"), (col("id") % 9).as("t"),
      (col("id") % 4 =!= 0).as("ev"))
    val got = Analytics.nelsonAalen(subjects, Seq("cohort"), "t", "ev")
      .orderBy("t").select("t", "n_risk", "n_events", "cum_hazard")
      .as[(Long, Long, Long, Double)].collect()
    val byT = (0L until 100L).map(id => (id % 9, id % 4 != 0))
      .groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = 100L; var h = 0.0
    val ref = byT.map { case (t, g) =>
      val d = g.count(_._2).toLong
      val n = atRisk
      if (d > 0) h = h + d.toDouble / n.toDouble
      atRisk -= g.length
      (t, n, d, h)
    }.toArray
    assert(got.map(r => (r._1, r._2, r._3)) === ref.map(r => (r._1, r._2, r._3)))
    assert(bits(got.map(_._4)) === bits(ref.map(_._4)))
  }

  test("pav fold: textbook pooling, monotone passthrough, exact " +
      "comparisons, reference-implementation parity") {
    def pav(cents: Array[Long]): Array[Double] =
      SeqFolds.PavFold(SparkShim.toExpression(lit(0)))
        .nullSafeEval(new GenericArrayData(cents))
        .asInstanceOf[GenericArrayData].toDoubleArray()
    // textbook: 1, 3, 2 -> 1, 2.5, 2.5 (cents x100)
    assert(bits(pav(Array(100L, 300L, 200L))) ===
      bits(Array(100.0 / 100.0, 500.0 / 200.0, 500.0 / 200.0)))
    // already monotone: unchanged
    assert(bits(pav(Array(100L, 200L, 300L))) ===
      bits(Array(1.0, 2.0, 3.0)))
    // strictly decreasing: one global block = the mean
    assert(bits(pav(Array(300L, 200L, 100L))) ===
      bits(Array(600.0 / 300.0, 600.0 / 300.0, 600.0 / 300.0)))
    // pooling cascades backwards through earlier blocks
    assert(bits(pav(Array(100L, 400L, 300L, 200L))) ===
      bits(Array(1.0, 900.0 / 300.0, 900.0 / 300.0, 900.0 / 300.0)))
    // exact comparison at equal means merges (>=, least blocks)
    assert(pav(Array(200L, 200L)).toSeq === Seq(2.0, 2.0))
    // reference O(n^2) minimax on deterministic pseudo-random input
    val rnd = new scala.util.Random(41)
    val xs = Array.fill(60)((rnd.nextInt(2000) - 1000).toLong)
    val got = pav(xs)
    val pc = xs.scanLeft(0L)(_ + _) // pc(i) = sum of first i
    def mean(i: Int, j: Int): Double = // 1-based inclusive
      (pc(j) - pc(i - 1)).toDouble / (100.0 * (j - i + 1))
    val want = (1 to xs.length).map { k =>
      (1 to k).map(i => (k to xs.length).map(j => mean(i, j)).min).max
    }.toArray
    assert(bits(got) === bits(want),
      "PAV pooling must equal the minimax characterization")
  }

  test("km fold: censored-only step carries survival; d/n length mismatch is loud") {
    val ds = new GenericArrayData(Array(2L, 0L, 1L))
    val ns = new GenericArrayData(Array(10L, 8L, 5L))
    val out = SeqFolds.KaplanMeierFold(SparkShim.toExpression(lit(0)), SparkShim.toExpression(lit(0)))
      .nullSafeEval(ds, ns).asInstanceOf[GenericArrayData].toDoubleArray()
    val s1 = 1.0 * (8.0 / 10.0)
    assert(bits(out) === bits(Array(s1, s1, s1 * (4.0 / 5.0))))
    intercept[IllegalArgumentException] {
      SeqFolds.KaplanMeierFold(SparkShim.toExpression(lit(0)), SparkShim.toExpression(lit(0)))
        .nullSafeEval(ds, new GenericArrayData(Array(1L)))
    }
  }
}
