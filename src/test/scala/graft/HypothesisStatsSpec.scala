package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Correlation matrix, Spearman, Welch t-test, chi-square independence
  * (a40–a43 family). */
class HypothesisStatsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- corrMatrix ----

  test("corrMatrix: perfectly linear pair has corr 1, anti-linear -1") {
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0),
      (4.0, 8.0, -4.0)).toDF("x", "y", "z")
    val out = Analytics.corrMatrix(df, Seq("x", "y", "z"))
      .orderBy("col_x", "col_y")
      .select("col_x", "col_y", "n", "corr")
      .as[(String, String, Long, Double)].collect()
    assert(out.length === 3)
    assert(out.forall(_._3 == 4L))
    val m = out.map(r => (r._1, r._2) -> r._4).toMap
    assert(math.abs(m(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(m(("x", "z")) + 1.0) < 1e-12)
    assert(math.abs(m(("y", "z")) + 1.0) < 1e-12)
  }

  test("corrMatrix: every pair agrees with exactStats' pairwise corr") {
    val df = Seq((1.0, 5.0, 9.0), (2.0, 3.0, 1.0), (3.0, 8.0, 4.0),
      (4.0, 1.0, 7.0), (5.0, 9.0, 2.0), (6.0, 2.0, 8.0))
      .toDF("a", "b", "c")
    val mat = Analytics.corrMatrix(df, Seq("a", "b", "c"))
      .select("col_x", "col_y", "corr")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for ((x, y) <- Seq(("a", "b"), ("a", "c"), ("b", "c"))) {
      val single = Analytics.exactStats(df, x, y)
        .select("corr_xy").as[Double].head()
      assert(mat((x, y)) === single,
        s"pair ($x,$y): matrix ${mat((x, y))} vs exactStats $single")
    }
  }

  test("corrMatrix: a null in ANY column drops the row from every pair") {
    val df = Seq(
      (Option(1.0), Option(1.0), Option(1.0)),
      (Option(2.0), Option(2.0), None), // listwise: out of ALL pairs
      (Option(3.0), Option(3.0), Option(3.0)),
      (Option(4.0), Option(4.0), Option(4.0)))
      .toDF("x", "y", "z")
    val out = Analytics.corrMatrix(df, Seq("x", "y", "z"))
      .select("n").as[Long].collect()
    assert(out.forall(_ == 3L))
  }

  // ---- spearman ----

  test("spearman: any strictly monotone map has rho exactly 1") {
    // y = x^3 is non-linear (Pearson < 1) but rank-perfect
    val df = (1 to 20).map(i => (i.toDouble, math.pow(i.toDouble, 3)))
      .toDF("x", "y")
    val (n, rho) = Analytics.spearman(df, "x", "y")
      .as[(Long, Double)].head()
    assert(n === 20L)
    assert(rho === 1.0)
  }

  test("spearman: reversed order gives exactly -1") {
    val df = (1 to 15).map(i => (i.toDouble, (16 - i).toDouble))
      .toDF("x", "y")
    val rho = Analytics.spearman(df, "x", "y")
      .select("rho").as[Double].head()
    assert(rho === -1.0)
  }

  test("spearman: midranks under ties match the closed form") {
    // x: 1,1,2 -> doubled midranks 3,3,6 ; y: 5,7,7 -> 2,5,5
    // rho = Pearson((3,2),(3,5),(6,5)) = 0.5
    val df = Seq((1.0, 5.0), (1.0, 7.0), (2.0, 7.0)).toDF("x", "y")
    val rho = Analytics.spearman(df, "x", "y")
      .select("rho").as[Double].head()
    assert(math.abs(rho - 0.5) < 1e-12)
  }

  test("doubledMidranks: value-level 2B+cnt+1 equals row-level " +
      "(2*sum(pos)) div cnt on heavy ties (r16 tie-equivalence proof)") {
    val rnd = new scala.util.Random(41)
    // ~8 distinct values over 500 rows: every group is a tie group
    val df = (1 to 500).map(_ => rnd.nextInt(8) * 0.25)
      .toDF("v").select(col("v")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("__v"))
    val got = Analytics.doubledMidranks(df, "__r")
      .orderBy("__v").collect()
      .map(r => (r.getDecimal(0).toPlainString, r.getLong(1)))
    // the replaced row-level formulation, verbatim
    val want = Analytics.globalRowNumber(df, Seq("__v"), "__rn")
      .groupBy("__v")
      .agg(expr("(2 * sum(cast(__rn as decimal(38,0)))) div count(1)")
        .as("__r"))
      .orderBy("__v").collect()
      .map(r => (r.getDecimal(0).toPlainString, r.getLong(1)))
    assert(got === want)
  }

  // ---- welchTTest ----

  test("welch: hand-computed two-sample statistic") {
    // a: 1,2,3,4 (mean 2.5, var 5/3) ; b: 2,4,6 (mean 4, var 4)
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("a", _)) ++
      Seq(2.0, 4.0, 6.0).map(("b", _))).toDF("grp", "v")
    val r = Analytics.welchTTest(df, "grp", "v", "a", "b")
      .select("n_a", "n_b", "mean_a", "mean_b", "var_a", "var_b",
        "t_stat", "df")
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)]
      .head()
    assert(r._1 === 4L); assert(r._2 === 3L)
    assert(r._3 === 2.5); assert(r._4 === 4.0)
    assert(math.abs(r._5 - 5.0 / 3) < 1e-12)
    assert(math.abs(r._6 - 4.0) < 1e-12)
    val s2a = (5.0 / 3) / 4; val s2b = 4.0 / 3
    val expectT = (2.5 - 4.0) / math.sqrt(s2a + s2b)
    val expectDf = math.pow(s2a + s2b, 2) /
      (s2a * s2a / 3 + s2b * s2b / 2)
    assert(math.abs(r._7 - expectT) < 1e-12)
    assert(math.abs(r._8 - expectDf) < 1e-12)
  }

  test("welch: identical arms give t = 0") {
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(1.0, 2.0, 3.0).map(("b", _))).toDF("grp", "v")
    val t = Analytics.welchTTest(df, "grp", "v", "a", "b")
      .select("t_stat").as[Double].head()
    assert(t === 0.0)
  }

  test("welch: unrepresentable measure leaves the arm count too") {
    val df = Seq(("a", Option(1.0)), ("a", Option(2.0)), ("a", None),
      ("b", Option(3.0)), ("b", Option(Double.NaN))).toDF("grp", "v")
    val (na, nb) = Analytics.welchTTest(df, "grp", "v", "a", "b")
      .select("n_a", "n_b").as[(Long, Long)].head()
    assert(na === 2L) // null out
    assert(nb === 1L) // NaN cast -> null: out of count AND sums
  }

  // ---- chi2 ----

  test("chi2Cells: independent margins give contrib 0 everywhere") {
    // perfectly independent 2x2: counts proportional to margins
    val rows = Seq.fill(20)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val out = Analytics.chi2Cells(rows.toDF("u", "v"), "u", "v")
      .select("observed", "expected", "contrib")
      .as[(Long, Double, Double)].collect()
    assert(out.length === 4)
    assert(out.forall { case (o, e, c) => o.toDouble == e && c == 0.0 })
  }

  test("chi2Cells + chi2Statistic: hand-computed 2x2") {
    // obs: (a,x)=10 (a,y)=20 (b,x)=20 (b,y)=10 ; all expected = 15
    // chi2 = 4 * (5^2/15) = 20/3
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val df = rows.toDF("u", "v")
    val cells = Analytics.chi2Cells(df, "u", "v")
      .orderBy("u", "v")
      .select("observed", "expected", "contrib")
      .as[(Long, Double, Double)].collect()
    assert(cells.map(_._1).toSeq === Seq(10L, 20L, 20L, 10L))
    assert(cells.forall(_._2 == 15.0))
    cells.foreach(c => assert(math.abs(c._3 - 25.0 / 15) < 1e-12))
    val (nCells, chi2) = Analytics.chi2Statistic(df, "u", "v")
      .as[(Long, Double)].head()
    assert(nCells === 4L)
    assert(math.abs(chi2 - 20.0 / 3) < 1e-12)
  }

  // ---- Cramér's V ----

  test("cramersV: independent margins give V = 0; a perfect 2x2 " +
      "association gives V = 1") {
    val indep = Seq.fill(20)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val v0 = Analytics.cramersV(indep.toDF("u", "v"), "u", "v")
      .select("n", "n_rows", "n_cols", "dof", "chi2", "cramers_v")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(v0 === ((60L, 2L, 2L, 1L, 0.0, 0.0)))
    // diagonal-only: chi2 = N, V = sqrt(N / (N*1)) = 1
    val diag = Seq.fill(25)(("a", "x")) ++ Seq.fill(15)(("b", "y"))
    val v1 = Analytics.cramersV(diag.toDF("u", "v"), "u", "v")
      .select("n", "dof", "chi2", "cramers_v")
      .as[(Long, Long, Double, Double)].head()
    assert(v1._1 === 40L && v1._2 === 1L)
    assert(math.abs(v1._3 - 40.0) < 1e-6 && math.abs(v1._4 - 1.0) < 1e-9)
  }

  test("cramersV: hand-computed 2x2 matches chi2Statistic; min(r,c) " +
      "normalizes a rectangular table") {
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val r = Analytics.cramersV(rows.toDF("u", "v"), "u", "v")
      .select("n", "n_rows", "n_cols", "dof", "chi2", "cramers_v")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(r._1 === 60L && r._4 === 1L)
    assert(math.abs(r._5 - 20.0 / 3) < 1e-6)
    assert(math.abs(r._6 - math.sqrt((20.0 / 3) / 60.0)) < 1e-6)
    // 3x2 table: dof = 2, V divides by min(3,2)-1 = 1
    val rect = Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("b", "y")) ++
      Seq.fill(5)(("c", "x"))
    val r2 = Analytics.cramersV(rect.toDF("u", "v"), "u", "v")
      .select("n_rows", "n_cols", "dof")
      .as[(Long, Long, Long)].head()
    assert(r2 === ((3L, 2L, 2L)))
    // a 1×k table has no association to measure: min(r,c)=1 -> NULL V
    val flat = Seq(("a", "x"), ("b", "x"), ("c", "x")).toDF("u", "v")
    assert(Analytics.cramersV(flat, "u", "v")
      .select("cramers_v").collect().head.isNullAt(0))
  }

  // ---- partial correlation ----

  test("partialCorrelation: controlling the confounder removes a " +
      "spurious association; straight-line reference; degenerate " +
      "control gives NULL") {
    // x = z + noise-ish, y = z exactly: corr(x,y) is high purely
    // through z; partialling z out collapses it
    val rows = Seq(
      (1.0, 10.0, 10.0), (2.25, 20.0, 20.0), (2.75, 30.0, 30.0),
      (4.5, 40.0, 40.0), (4.75, 50.0, 50.0), (6.0, 60.0, 60.0),
      (6.5, 70.0, 70.0), (8.25, 80.0, 80.0))
    val df = rows.toDF("x", "y", "z")
    val r = Analytics.partialCorrelation(df, "x", "y", "z")
      .select("n", "r_xy", "r_xz", "r_yz", "r_xy_given_z")
      .collect().head
    assert(r.getLong(0) === 8L)
    assert(r.getDouble(1) > 0.99) // raw association looks strong
    assert(r.getDouble(3) === 1.0) // y IS z
    assert(r.isNullAt(4), "r_yz = 1 degenerates the partial form")
    // independent reference on a non-degenerate triple
    val rows2 = Seq((1.0, 2.0, 1.5), (2.0, 1.0, 2.5), (3.0, 4.0, 2.0),
      (4.0, 3.0, 4.5), (5.0, 6.0, 3.0), (6.0, 5.0, 5.5))
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size
      val (sa, sb) = (a.sum, b.sum)
      val num = n * a.zip(b).map(p => p._1 * p._2).sum - sa * sb
      num / (math.sqrt(n * a.map(v => v * v).sum - sa * sa) *
        math.sqrt(n * b.map(v => v * v).sum - sb * sb))
    }
    val (xs, ys, zs) = (rows2.map(_._1), rows2.map(_._2), rows2.map(_._3))
    val (rxy, rxz, ryz) = (corr(xs, ys), corr(xs, zs), corr(ys, zs))
    val want = (rxy - rxz * ryz) /
      (math.sqrt(1 - rxz * rxz) * math.sqrt(1 - ryz * ryz))
    val got = Analytics.partialCorrelation(rows2.toDF("x", "y", "z"),
      "x", "y", "z").select("r_xy_given_z").as[Double].head()
    assert(math.abs(got - want) < 1e-6)
  }

  // ---- one-way ANOVA ----

  test("anovaOneWay: hand-computed three-group F; identical groups " +
      "give F ~ 0; k=1 or constant data yield NULL F") {
    // groups: a = {1,2,3}, b = {2,3,4}, c = {5,6,7}
    // means 2,3,6; grand 11/3; SSW = 2+2+2 = 6
    // SSB = 3*((2-11/3)^2 + (3-11/3)^2 + (6-11/3)^2) = 3*(25+4+49)/9 = 26
    // F = (26/2)/(6/6) = 13
    val rows = Seq(1, 2, 3).map(("a", _)) ++ Seq(2, 3, 4).map(("b", _)) ++
      Seq(5, 6, 7).map(("c", _))
    val r = Analytics.anovaOneWay(
      rows.map { case (g, v) => (g, v.toDouble) }.toDF("g", "v"),
      "g", "v")
      .select("k", "n", "ss_between", "ss_within", "f_stat", "eta_sq")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r._1 === 3L && r._2 === 9L)
    assert(math.abs(r._3 - 26.0) < 1e-6)
    assert(math.abs(r._4 - 6.0) < 1e-6)
    assert(math.abs(r._5 - 13.0) < 1e-6)
    assert(math.abs(r._6 - 26.0 / 32.0) < 1e-6)
    // three identical groups: SSB = 0, F = 0
    val same = (1 to 3).flatMap(g =>
      Seq(1.0, 2.0, 3.0).map((s"g$g", _))).toDF("g", "v")
    val f0 = Analytics.anovaOneWay(same, "g", "v")
      .select("ss_between", "f_stat").as[(Double, Double)].head()
    assert(f0._1 === 0.0 && f0._2 === 0.0)
    // constant data: SSW = 0 -> F undefined (NULL)
    val const = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 1.0))
      .toDF("g", "v")
    assert(Analytics.anovaOneWay(const, "g", "v")
      .select("f_stat").collect().head.isNullAt(0))
  }

  // ---- Wilson interval ----

  test("wilsonInterval: hand-computed 50/100; boundary rates give " +
      "exact 0 / 1 endpoints; interval tightens with n") {
    val df = (Seq.fill(50)(("a", 1)) ++ Seq.fill(50)(("a", 0)) ++
      Seq.fill(10)(("b", 1)) ++ Seq.fill(20)(("c", 0)) ++
      (Seq.fill(5)(("d", 1)) ++ Seq.fill(5)(("d", 0))))
      .toDF("g", "hit")
    val out = Analytics.wilsonInterval(df, "g", "hit")
      .select("g", "n", "k", "rate", "wilson_lo", "wilson_hi")
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val (z, n) = (1.96, 100.0)
    val z2 = z * z
    val denom = 1.0 + z2 / n
    val center = (0.5 + z2 / (2.0 * n)) / denom
    val half = z * math.sqrt(0.5 * 0.5 / n + z2 / (4.0 * n * n)) / denom
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("a")._2 === 100L && out("a")._4 === 0.5)
    assert(out("a")._5 === r6(center - half))
    assert(out("a")._6 === r6(center + half))
    // all successes / all failures: the closed endpoint is exact
    assert(out("b")._4 === 1.0 && out("b")._6 === 1.0)
    assert(out("c")._4 === 0.0 && out("c")._5 === 0.0)
    // same rate, smaller n -> wider interval
    assert(out("d")._5 < out("a")._5 && out("d")._6 > out("a")._6)
  }

  // ---- Cohen's kappa ----

  test("cohenKappa: hand-computed 2x2; perfect agreement is exactly 1") {
    // yes/yes=20, no/no=15, yes/no=10, no/yes=5:
    // po = 35/50, pe = (30*25 + 20*25)/2500 = 0.5, kappa = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(15)(("n", "n")) ++
      Seq.fill(10)(("y", "n")) ++ Seq.fill(5)(("n", "y"))
    val r = Analytics.cohenKappa(rows.toDF("r1", "r2"), "r1", "r2")
      .select("n", "n_agree", "po", "pe", "kappa")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r === ((50L, 35L, 0.7, 0.5, 0.4)))
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c"), ("a", "a"))
    assert(Analytics.cohenKappa(perfect.toDF("r1", "r2"), "r1", "r2")
      .select("kappa").as[Double].head() === 1.0)
  }

  test("cohenKappa: marginally independent raters give kappa 0; " +
      "constant equal raters give NULL (0/0); disjoint label sets " +
      "give pe = 0 so kappa = po") {
    // counts = product of margins: (y,y)=6 (y,n)=14 (n,y)=9 (n,n)=21
    val indep = Seq.fill(6)(("y", "y")) ++ Seq.fill(14)(("y", "n")) ++
      Seq.fill(9)(("n", "y")) ++ Seq.fill(21)(("n", "n"))
    val k0 = Analytics.cohenKappa(indep.toDF("r1", "r2"), "r1", "r2")
      .select("kappa").as[Double].head()
    assert(k0 === 0.0)
    val const = Seq.fill(7)(("x", "x"))
    val kNull = Analytics.cohenKappa(const.toDF("r1", "r2"), "r1", "r2")
      .select("kappa").collect().head
    assert(kNull.isNullAt(0))
    val disjoint = Seq(("a", "b"), ("a", "b"), ("c", "d"))
    val kd = Analytics.cohenKappa(disjoint.toDF("r1", "r2"), "r1", "r2")
      .select("po", "pe", "kappa").as[(Double, Double, Double)].head()
    assert(kd === ((0.0, 0.0, 0.0)))
  }

  // ---- kendallTau ----

  test("kendallTau: strictly monotone data has tau exactly 1 / -1") {
    val up = (1 to 12).map(i => (i.toDouble, (i * 3).toDouble))
      .toDF("x", "y")
    val r1 = Analytics.kendallTau(up, "x", "y")
      .select("n", "concordant", "discordant", "tau_b")
      .as[(Long, Double, Double, Double)].head()
    assert(r1._1 === 12L)
    assert(r1._2 === 66.0) // 12*11/2 pairs, all concordant
    assert(r1._3 === 0.0)
    // sqrt(66)*sqrt(66) != 66 in doubles — tau is 1 up to one ulp
    assert(math.abs(r1._4 - 1.0) < 1e-12)
    val down = (1 to 12).map(i => (i.toDouble, (13 - i).toDouble))
      .toDF("x", "y")
    assert(math.abs(Analytics.kendallTau(down, "x", "y")
      .select("tau_b").as[Double].head() + 1.0) < 1e-12)
  }

  test("kendallTau: hand-computed tau-b with ties") {
    // rows: (1,1) (1,2) (2,1) (2,2) (2,2)
    // cells: (1,1)=1 (1,2)=1 (2,1)=1 (2,2)=2
    // C = 1*2 (=(1,1)->(2,2)x2) + ... concordant: (1,1)x(2,2): 1*2 = 2
    // D = (1,2)x(2,1): 1*1 = 1
    // untied x: m1=2, m2=3 -> 6 ; untied y: m1=2, m2=3 -> 6
    // tau = (2-1)/(sqrt(6)*sqrt(6)) = 1/6
    val df = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0),
      (2.0, 2.0)).toDF("x", "y")
    val r = Analytics.kendallTau(df, "x", "y")
      .select("n", "n_cells", "concordant", "discordant", "tau_b")
      .as[(Long, Long, Double, Double, Double)].head()
    assert((r._1, r._2, r._3, r._4) === ((5L, 4L, 2.0, 1.0)))
    assert(math.abs(r._5 - 1.0 / 6) < 1e-12)
  }

  test("kendallTau: independent checker over random-ish data " +
    "(naive O(n^2) pairs)") {
    val rows = (1 to 40).map(i =>
      (((i * 7) % 11).toDouble, ((i * 13) % 5).toDouble))
    var c = 0L; var d = 0L; var ux = 0L; var uy = 0L
    for (i <- rows.indices; j <- (i + 1) until rows.size) {
      val sx = math.signum(rows(j)._1 - rows(i)._1)
      val sy = math.signum(rows(j)._2 - rows(i)._2)
      if (sx != 0) ux += 1
      if (sy != 0) uy += 1
      if (sx * sy > 0) c += 1
      if (sx * sy < 0) d += 1
    }
    val want = (c - d).toDouble / (math.sqrt(ux.toDouble) *
      math.sqrt(uy.toDouble))
    val got = Analytics.kendallTau(rows.toDF("x", "y"), "x", "y")
      .select("concordant", "discordant", "tau_b")
      .as[(Double, Double, Double)].head()
    assert(got._1 === c.toDouble)
    assert(got._2 === d.toDouble)
    assert(math.abs(got._3 - want) < 1e-12)
  }

  test("kendallTau: refuses a domain past maxCells loudly, before the " +
    "quadratic cell join") {
    // 300 distinct (x, y) cells against maxCells = 100: the documented
    // bounded-domain contract must fail fast with the bucket-first hint,
    // not silently run an O(cells²) join on a continuous column
    val rows = (1 to 300).map(i => (i.toDouble + 0.01 * i, i.toDouble))
    val e = intercept[IllegalArgumentException] {
      Analytics.kendallTau(rows.toDF("x", "y"), "x", "y",
        maxCells = 100)
    }
    assert(e.getMessage.contains("maxCells"))
    assert(e.getMessage.contains("bucket"))
    // the same data passes once bucketed (or with the cap raised)
    val ok = Analytics.kendallTau(rows.toDF("x", "y"), "x", "y",
      maxCells = 1000)
    assert(ok.select("n").as[Long].head() === 300L)
  }

  test("randomizationTest: identical groups give p = 1; a strong " +
    "separation gives a small p and the exact mean diff") {
    // identical groups: observed |diff| is 0, every replicate is at
    // least as extreme, so the add-one estimate is exactly 1
    val same = ((1 to 20).map(i => ("k", "a", i.toLong, 10.0)) ++
      (1 to 20).map(i => ("k", "b", 100L + i, 10.0)))
      .toDF("k", "grp", "id", "v")
    val r1 = Analytics.randomizationTest(same, Seq("k"), "grp", "a", "b",
      "v", col("id"), replicates = 50)
      .select("mean_diff", "p_value").as[(Double, Double)].head()
    assert(r1._1 === 0.0)
    assert(r1._2 === 1.0)
    // strong separation: no binomial relabeling reproduces the split
    // (hash-deterministic), so only the +1 smoothing survives
    val sep = ((1 to 30).map(i => ("k", "a", i.toLong, 100.0)) ++
      (1 to 30).map(i => ("k", "b", 100L + i, 1.0)))
      .toDF("k", "grp", "id", "v")
    val r2 = Analytics.randomizationTest(sep, Seq("k"), "grp", "a", "b",
      "v", col("id"), replicates = 50)
      .select("n_a", "n_b", "mean_diff", "p_value")
      .as[(Long, Long, Double, Double)].head()
    assert(r2._1 === 30L && r2._2 === 30L)
    assert(r2._3 === 99.0)
    assert(r2._4 < 0.1)
  }

  // ---- propTest ----

  test("propTest: hand-computed two-proportion z") {
    // arm a: 3/6 convert; arm b: 1/4 convert
    val rows = Seq.fill(3)(("a", true)) ++ Seq.fill(3)(("a", false)) ++
      Seq.fill(1)(("b", true)) ++ Seq.fill(3)(("b", false)) ++
      Seq(("c", true)) // outside both arms: ignored
    val df = rows.toDF("grp", "ok")
    val r = Analytics.propTest(df, "grp", col("ok"), "a", "b")
      .select("n_a", "n_b", "x_a", "x_b", "rate_a", "rate_b",
        "rate_pooled", "z")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)]
      .head()
    assert((r._1, r._2, r._3, r._4) === ((6L, 4L, 3L, 1L)))
    assert(r._5 === 0.5)
    assert(r._6 === 0.25)
    assert(r._7 === 0.4)
    val want = (0.5 - 0.25) /
      math.sqrt(0.4 * 0.6 * (1.0 / 6 + 1.0 / 4))
    assert(math.abs(r._8 - want) < 1e-12)
  }

  test("propTest: identical arms give z = 0; null success not counted") {
    val rows = Seq(("a", Some(true)), ("a", Some(false)), ("a", None),
      ("b", Some(true)), ("b", Some(false)), ("b", None))
    val r = Analytics.propTest(rows.toDF("grp", "ok"), "grp",
      col("ok"), "a", "b")
      .select("n_a", "x_a", "z").as[(Long, Long, Double)].head()
    assert(r._1 === 3L) // null-success rows still count as trials
    assert(r._2 === 1L) // ... but never as successes
    assert(r._3 === 0.0)
  }

  // ---- benfordDigits ----

  test("benfordDigits: lexical first significant digit, all 9 rows " +
    "emitted, exclusion contract") {
    val df = Seq(Option(123.45), Option(0.05), Option(900.0),
      Option(9.99), Option(-77.0) /* excluded */, Option(0.0) /* excl */,
      None /* excluded */).toDF("v")
    val out = Analytics.benfordDigits(df, "v")
      .orderBy("digit")
      .select("digit", "n_digit", "share")
      .as[(Int, Long, Double)].collect()
    assert(out.length === 9) // digits with zero hits still appear
    val m = out.map(r => r._1 -> r._2).toMap
    assert(m(1) === 1L) // 123.45
    assert(m(5) === 1L) // 0.05 -> first SIGNIFICANT digit 5
    assert(m(9) === 2L) // 900.00 and 9.99
    assert(out.map(_._2).sum === 4L)
    assert(out.find(_._1 == 9).get._3 === 0.5)
  }

  test("benfordDigits: expectations are the quantized Benford table " +
    "and shares sum to 1") {
    // 2^k for k=0..30 is classically Benford-ish; just pin the table
    val df = (0 to 30).map(k => math.pow(2.0, k)).toDF("v")
    val out = Analytics.benfordDigits(df, "v")
      .orderBy("digit").select("digit", "expected", "share")
      .as[(Int, Double, Double)].collect()
    val want = Analytics.benfordExpected.map(_.doubleValue)
    assert(out.map(_._2).toSeq === want)
    assert(math.abs(want.sum - 1.0) < 1e-4) // table itself ~ sums to 1
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-12)
    // leading digit of powers of two: 1 appears most (Benford behavior)
    assert(out.head._3 === out.map(_._3).max)
  }

  // ---- theilSen ----

  test("theilSen: exact line is recovered, immune to one wild outlier") {
    // y = 2x + 3 on x = 1..9, plus one wild point — OLS would tilt,
    // the median slope must not
    val clean = (1 to 9).map(i => (i.toDouble, 2.0 * i + 3))
    val df = (clean :+ ((5.0, 500.0))).toDF("x", "y")
    val r = Analytics.theilSen(df, "x", "y")
      .select("n", "slope", "intercept").as[(Long, Double, Double)].head()
    assert(r._1 === 10L)
    assert(r._2 === 2.0)
    assert(r._3 === 3.0)
  }

  test("theilSen: weighted lower-median convention, hand-computed") {
    // points: (1,1)x3, (2,2)x1 -> slopes: one pair (1,1)-(2,2) w=3
    //   slope = 1; residuals r = y - x: 0 for all -> intercept 0
    val df = (Seq.fill(3)((1.0, 1.0)) :+ ((2.0, 2.0))).toDF("x", "y")
    val r = Analytics.theilSen(df, "x", "y")
      .select("n", "n_cells", "n_pairs", "slope", "intercept")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r === ((4L, 2L, 1L, 1.0, 0.0)))
  }

  test("theilSen: even total weight picks the LOWER median") {
    // cells: (0,0), (1,1), (2,4) each once -> pair slopes:
    //   (0,0)-(1,1): 1 ; (0,0)-(2,4): 2 ; (1,1)-(2,4): 3
    // weights all 1, total 3 -> median = slope 2... use 4 points for
    // an even case: add (3,5): slopes 1,2,3, (1->3):2, (2->3):1, (0->3):5/3
    // sorted: 1,1,5/3,2,2,3 (w=1 each, tot=6) -> lower median = 5/3
    val df = Seq((0.0, 0.0), (1.0, 1.0), (2.0, 4.0), (3.0, 5.0))
      .toDF("x", "y")
    val r = Analytics.theilSen(df, "x", "y")
      .select("n_pairs", "slope").as[(Long, Double)].head()
    assert(r._1 === 6L)
    assert(r._2 === 5.0 / 3.0)
  }

  test("chi2Statistic: sorted fold is partition-order independent") {
    val rows = (1 to 200).map(i => (s"g${i % 5}", s"h${i % 7}"))
    val one = Analytics.chi2Statistic(
      rows.toDF("u", "v").coalesce(1), "u", "v")
      .select("chi2").as[Double].head()
    val many = Analytics.chi2Statistic(
      rows.toDF("u", "v").repartition(13), "u", "v")
      .select("chi2").as[Double].head()
    assert(one === many) // bitwise: the fold order is pinned by sort
  }

  test("seasonalDecompose: a pure hourly pattern over a constant base " +
    "recovers it exactly — constant trend, per-hour seasonal, zero " +
    "residual, edges excluded") {
    val rows = (0 until 48).map { i =>
      (1L, i.toLong,
        java.sql.Timestamp.valueOf(
          f"2024-05-0${1 + i / 24}%d ${i % 24}%02d:00:00"),
        10.0 + (i % 24))
    }.toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.seasonalDecompose(rows, Seq("user_id"), "ts",
      "value", period = 24, tieBreak = Seq("event_id"))
      .orderBy("event_id")
      .select("event_id", "value", "trend", "seasonal", "residual")
      .as[(Long, Double, Double, Double, Double)].collect()
    // full centered windows exist for rows 12..36 only
    assert(out.map(_._1).toSeq === (12L to 36L))
    out.foreach { case (id, v, t, s, r) =>
      assert(t === 21.5) // 10 + mean(0..23), every window = one cycle
      assert(s === (id % 24) - 11.5)
      assert(v === 10.0 + (id % 24))
      assert(r === 0.0)
    }
  }

  test("kaplanMeier: the textbook curve — censoring shrinks the risk " +
    "set without a survival step, a final event drops it to zero") {
    val subjects = Seq(
      ("k", 1L, true), ("k", 2L, true), ("k", 2L, false),
      ("k", 3L, true), ("k", 4L, false), ("k", 5L, true))
      .toDF("cohort", "t_days", "churned")
    val got = Analytics.kaplanMeier(subjects, Seq("cohort"),
      "t_days", "churned")
      .orderBy("t")
      .select("t", "n_risk", "n_events", "n_censored", "survival")
      .as[(Long, Long, Long, Long, Double)].collect()
    // replay the exact fold arithmetic
    val s1 = 1.0 * (5.0 / 6)
    val s2 = s1 * (4.0 / 5)
    val s3 = s2 * (2.0 / 3)
    assert(got === Array(
      (1L, 6L, 1L, 0L, s1),
      (2L, 5L, 1L, 1L, s2),
      (3L, 3L, 1L, 0L, s3),
      (4L, 2L, 0L, 1L, s3), // censored-only step: survival unchanged
      (5L, 1L, 1L, 0L, 0.0)))
  }

  test("cuped: perfectly-correlated covariate removes all variance; " +
      "constant covariate yields null adjustment; partition-invariant") {
    // y = x + 5 exactly -> theta = 1, adjusted = 5 + xbar for every unit
    val perf = (1 to 40).map(i => (i.toLong, i.toDouble, i + 5.0))
      .toDF("id", "x", "y")
    val got = Analytics.cuped(perf, "id", "x", "y")
      .select("id", "adjusted").as[(Long, Double)].collect()
    val xbar = (1 to 40).map(_.toDouble).sum / 40
    got.foreach { case (_, adj) =>
      assert(math.abs(adj - (5.0 + xbar)) < 1e-6,
        s"perfect covariate must collapse variance: $adj vs ${5.0 + xbar}")
    }
    // variance reduction on a noisy-but-correlated pair
    val noisy = (1 to 200).map { i =>
      val x = (i % 50).toDouble
      (i.toLong, x, x * 2 + ((i * 37) % 11).toDouble)
    }.toDF("id", "x", "y")
    val rows = Analytics.cuped(noisy, "id", "x", "y")
      .select("y", "adjusted").as[(Double, Double)].collect()
    def variance(vs: Seq[Double]): Double = {
      val m = vs.sum / vs.size
      vs.map(v => (v - m) * (v - m)).sum / vs.size
    }
    assert(variance(rows.map(_._2).toSeq) <
      variance(rows.map(_._1).toSeq) * 0.5,
      "CUPED must reduce variance on a correlated covariate")
    // constant x -> var(x)=0 -> adjusted null
    val const = (1 to 10).map(i => (i.toLong, 7.0, i.toDouble))
      .toDF("id", "x", "y")
    assert(Analytics.cuped(const, "id", "x", "y")
      .where(col("adjusted").isNotNull).count() === 0L)
    // repartition invariance (quantized moments, not raw double sums)
    val a = Analytics.cuped(noisy, "id", "x", "y")
      .select("id", "adjusted").as[(Long, Double)].collect().toMap
    val b = Analytics.cuped(noisy.repartition(13), "id", "x", "y")
      .select("id", "adjusted").as[(Long, Double)].collect().toMap
    assert(a === b)
  }

  test("logRank: identical groups read O = E (chi2 ~ 0); a planted " +
    "early-vs-late separation reads O far from E") {
    // two identical cohorts: every event time splits its d_t evenly, so
    // each group's expected equals its observed exactly
    val same = (1L to 20L).flatMap(t => Seq(
      ("a", t, true), ("b", t, true)))
      .toDF("cohort", "t_days", "churned")
    val eq = Analytics.logRank(same, "cohort", "t_days", "churned")
      .orderBy("cohort")
      .select("cohort", "observed", "expected_q6", "chi2_contrib")
      .as[(String, Long, Long, Double)].collect()
    assert(eq.length === 2)
    eq.foreach { case (_, o, eq6, chi) =>
      assert(o === 20L)
      // quantized expected within 1 ulp-of-quantization per term
      assert(math.abs(o * 1000000L - eq6) <= 40L,
        s"identical groups must have O ~ E, got O=$o E_q6=$eq6")
      assert(chi < 1e-6)
    }
    // planted separation: group a all dies at t=1..10, group b at 11..20
    val sep = ((1L to 10L).map(t => ("a", t, true)) ++
      (11L to 20L).map(t => ("b", t, true)))
      .toDF("cohort", "t_days", "churned")
    val dv = Analytics.logRank(sep, "cohort", "t_days", "churned")
      .orderBy("cohort")
      .select("cohort", "observed", "expected_q6", "chi2_contrib")
      .as[(String, Long, Long, Double)].collect()
    val chiTotal = dv.map(_._4).sum
    assert(chiTotal > 5.0,
      s"separated curves must reject H0, chi2 total = $chiTotal")
    // the early-dying group observed MORE events than expected
    val a = dv.find(_._1 == "a").get
    assert(a._2 * 1000000L > a._3)
    // censoring-only groups contribute no events but stay in the grid
    val cens = same.unionByName(
      Seq(("c", 5L, false), ("c", 30L, false))
        .toDF("cohort", "t_days", "churned"))
    val withC = Analytics.logRank(cens, "cohort", "t_days", "churned")
      .orderBy("cohort").select("cohort", "observed")
      .as[(String, Long)].collect()
    assert(withC.map(_._1).toSeq === Seq("a", "b", "c"))
    assert(withC.find(_._1 == "c").get._2 === 0L)
  }

  test("kaplanMeier: partition-layout independent (the fold order is " +
    "pinned by the sort, not the shuffle)") {
    val subjects = (1 to 200).map(i =>
      ((i % 3).toString, (i * 7 % 13).toLong, i % 4 != 0))
      .toDF("cohort", "t_days", "churned")
    def run(df: org.apache.spark.sql.DataFrame) =
      Analytics.kaplanMeier(df, Seq("cohort"), "t_days", "churned")
        .orderBy("cohort", "t")
        .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(run(subjects.repartition(13)) === run(subjects.coalesce(1)))
  }

  // ---- Brier decomposition (a61) ----

  test("brierDecomposition: hand-computed two-bin case and the " +
      "Murphy identity within the binned residual") {
    // bin 0: scores .1 .1, labels 0 0 -> pbar .1, ybar 0
    // bin 9: scores .9 .9, labels 1 0 -> pbar .9, ybar .5
    val df = Seq((0.1, 0), (0.1, 0), (0.9, 1), (0.9, 0))
      .toDF("score", "label")
    val r = Analytics.brierDecomposition(df, "score", "label", bins = 10)
      .select("n", "brier", "reliability", "resolution", "uncertainty",
        "residual")
      .as[(Long, Double, Double, Double, Double, Double)].head()
    assert(r._1 === 4L)
    // brier = (.01 + .01 + .01 + .81) / 4 = .21
    assert(math.abs(r._2 - 0.21) < 1e-9)
    // ybar = .25; rel = (2*.01 + 2*.16)/4 = .085
    assert(math.abs(r._3 - 0.085) < 1e-9)
    // res = (2*.0625 + 2*.0625)/4 = .0625; unc = .25*.75 = .1875
    assert(math.abs(r._4 - 0.0625) < 1e-9)
    assert(math.abs(r._5 - 0.1875) < 1e-9)
    // scores are constant within each bin => the identity is exact
    assert(math.abs(r._6) < 1e-9)
  }

  test("brierDecomposition: perfect and constant forecasters") {
    val perfect = Seq((0.95, 1), (0.95, 1), (0.05, 0))
      .toDF("score", "label")
    val p = Analytics.brierDecomposition(perfect, "score", "label", 10)
      .select("brier").as[Double].head()
    assert(p < 0.01)
    // constant base-rate forecast: resolution 0, rel ~ 0
    val const = Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0))
      .toDF("score", "label")
    val c = Analytics.brierDecomposition(const, "score", "label", 10)
      .select("brier", "reliability", "resolution", "uncertainty")
      .as[(Double, Double, Double, Double)].head()
    assert(c._1 === 0.25 && c._2 === 0.0 && c._3 === 0.0 && c._4 === 0.25)
  }

  // ---- effect sizes (a63) ----

  test("effectSize: hand-computed Cohen's d and the Hedges correction; " +
      "degenerate arms gate to NULL") {
    // arm a: 1, 3 (m=2, v=2); arm b: 5, 9 (m=7, v=8); pooled = 5
    val df = Seq(("k", "a", 1.0), ("k", "a", 3.0),
      ("k", "b", 5.0), ("k", "b", 9.0)).toDF("key", "grp", "v")
    val r = Analytics.effectSize(df, Seq("key"), "grp", "a", "b", "v")
      .select("n_a", "n_b", "cohens_d", "hedges_g")
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(r._1 === 2L && r._2 === 2L)
    val d = (2.0 - 7.0) / math.sqrt(5.0)
    assert(math.abs(r._3.get - BigDecimal(d).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    val g = d * (1.0 - 3.0 / (4.0 * 4.0 - 9.0))
    assert(math.abs(r._4.get - BigDecimal(g).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    // single-observation arm, and constant arms -> NULL
    val one = Analytics.effectSize(
      Seq(("k", "a", 1.0), ("k", "b", 2.0), ("k", "b", 3.0))
        .toDF("key", "grp", "v"), Seq("key"), "grp", "a", "b", "v")
      .select("cohens_d").as[Option[Double]].head()
    assert(one.isEmpty)
    val const = Analytics.effectSize(
      Seq(("k", "a", 5.0), ("k", "a", 5.0), ("k", "b", 5.0),
        ("k", "b", 5.0)).toDF("key", "grp", "v"),
      Seq("key"), "grp", "a", "b", "v")
      .select("cohens_d").as[Option[Double]].head()
    assert(const.isEmpty)
  }

  // ---- rolling correlation (w12) ----

  test("rollingCorrelation: perfect linear window reads 1, " +
      "anti-linear -1, constant windows are gated, partial windows " +
      "are not emitted") {
    // x tracks y exactly for 6 rows, then mirrors it for 6
    val rows = (0 until 6).map(i =>
      (1L, i.toLong, i.toLong, i * 2.0)) ++
      (6 until 12).map(i => (1L, i.toLong, i.toLong, -i * 2.0)) ++
      (0 until 5).map(i => (2L, i.toLong, i.toLong, 7.0)) // constant x
    val df = rows.toDF("k", "tsl", "idx", "v")
      .withColumn("ts", col("tsl").cast("timestamp"))
      .withColumn("y", col("idx").cast("double"))
    val out = Analytics.rollingCorrelation(df, Seq("k"), "ts",
      "v", "y", windowRows = 3, tieBreak = Seq("idx"))
      .select("k", "idx", "roll_corr")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    // key 2 (constant x) never emits; key 1 rows 0,1 lack a full window
    assert(out.forall(_._1 == 1L))
    assert(out.map(_._2).min === 2L)
    val m = out.map(r => r._2 -> r._3).toMap
    assert(math.abs(m(2L) - 1.0) < 1e-12)  // fully ascending window
    assert(math.abs(m(11L) + 1.0) < 1e-12) // fully descending window
    // partition invariance
    val again = Analytics.rollingCorrelation(df.repartition(7), Seq("k"),
      "ts", "v", "y", 3, Seq("idx"))
      .select("k", "idx", "roll_corr")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out === again)
  }

  // ---- paired t-test (a62) ----

  test("pairedTTest: hand-computed differences, missing arms count " +
      "as zero, degenerate gates") {
    // unit 1: arms (10, 4) -> d=6; unit 2: (5, 3) -> d=2;
    // unit 3: A only (7, -) -> d=7
    val df = Seq(
      (1L, "a", 10.0), (1L, "b", 4.0),
      (2L, "a", 5.0), (2L, "b", 3.0),
      (3L, "a", 7.0)).toDF("u", "arm", "v")
    val r = Analytics.pairedTTest(df, "u", "v",
      armA = col("arm") === "a", armB = col("arm") === "b")
      .select("n", "mean_diff", "t_stat")
      .as[(Long, Double, Option[Double])].head()
    assert(r._1 === 3L)
    assert(r._2 === 5.0)
    // d = (6, 2, 7): sd^2 = 7, t = 5*sqrt(3)/sqrt(7)
    val want = 5.0 * math.sqrt(3.0) / math.sqrt(7.0)
    assert(math.abs(r._3.get - want) < 1e-6)
    // constant differences -> zero variance -> NULL t
    val const = Seq((1L, "a", 5.0), (2L, "a", 5.0)).toDF("u", "arm", "v")
    val c = Analytics.pairedTTest(const, "u", "v",
      armA = col("arm") === "a", armB = col("arm") === "b")
      .select("t_stat").as[Option[Double]].head()
    assert(c.isEmpty)
    // single unit -> NULL t
    val one = Analytics.pairedTTest(df.where(col("u") === 1L), "u", "v",
      armA = col("arm") === "a", armB = col("arm") === "b")
      .select("n", "t_stat").as[(Long, Option[Double])].head()
    assert(one === ((1L, None)))
  }

  // ---- Ljung–Box (ts16) ----

  test("ljungBox: alternating series has huge Q, the lag terms fold " +
      "deterministically across partitionings") {
    val rows = (1 to 40).map(i =>
      (1L, i.toLong, i.toLong, if (i % 2 == 0) 10.0 else -10.0))
    def run(parts: Int) = Analytics.ljungBox(
      rows.toDF("k", "tsl", "id", "v").repartition(parts)
        .withColumn("ts", col("tsl").cast("timestamp")),
      Seq("k"), "ts", "v", maxLag = 3, tieBreak = Seq("id"),
      minPairs = 5)
      .select("k", "n", "n_lags", "q_stat")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val r = run(1)
    assert(r === run(7))
    assert(r.head._2 === 40L && r.head._3 === 3L)
    // |acf(1)| ~ 1, acf(2) ~ 1, acf(3) ~ -1 => Q near its maximum
    assert(r.head._4 > 100.0)
  }

  test("ljungBox: short series below minPairs yields no row; " +
      "observation contract excludes null time/measure") {
    val rows = Seq(
      (1L, Option(1L), Option(1.0)), (1L, Option(2L), Option(2.0)),
      (1L, None, Option(9.0)), (1L, Option(3L), None),
      (2L, Option(1L), Option(5.0)))
    val out = Analytics.ljungBox(
      rows.toDF("k", "tsl", "v")
        .withColumn("ts", col("tsl").cast("timestamp"))
        .withColumn("id", col("tsl")),
      Seq("k"), "ts", "v", maxLag = 3, tieBreak = Seq("id"),
      minPairs = 5)
    assert(out.count() === 0L)
  }
}
