package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** PCA over embedding columns: exact quantized moments, deterministic
  * Jacobi eigensolve, map-side projection.
  */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private def localCov(rows: Seq[Array[Double]], scale: Int)
      : Array[Array[Double]] = {
    // reference: quantize exactly like the operator, then population cov
    def q(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
    val d = rows.head.length
    val qs = rows.map(_.map(q))
    val n = qs.size.toDouble
    val mean = Array.tabulate(d)(i => qs.map(_(i)).sum / n)
    Array.tabulate(d, d)((i, j) =>
      qs.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n)
  }

  test("moment sums are exact on a hand-computed 2-d corpus") {
    val df = Seq(
      Tuple1(Seq(1.0, 2.0)), Tuple1(Seq(3.0, -1.0)), Tuple1(Seq(0.5, 0.25)))
      .toDF("v")
    val cov = Pca.covariance(spark, df, "v", 2, scale = 6)
      .as[(Int, Int, Double)].collect().toSeq
    val ref = localCov(Seq(Array(1.0, 2.0), Array(3.0, -1.0),
      Array(0.5, 0.25)), 6)
    cov.foreach { case (i, j, c) =>
      assert(math.abs(c - ref(i)(j)) < 1e-6, s"cov($i,$j)")
    }
  }

  test("covariance matches a local reference on random data and is " +
      "repartition-invariant (exact decimal moments)") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(200)(Array.fill(8)(rnd.nextGaussian()))
    val df = rows.map(r => Tuple1(r.toSeq)).toDF("v")
    val got = Pca.covariance(spark, df, "v", 8)
      .as[(Int, Int, Double)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    val ref = localCov(rows, 6)
    got.foreach { case ((i, j), c) =>
      assert(math.abs(c - ref(i)(j)) < 2e-6, s"cov($i,$j): $c vs ${ref(i)(j)}")
    }
    val re = Pca.covariance(spark, df.repartition(7), "v", 8)
      .as[(Int, Int, Double)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    assert(re === got, "exact moments must be layout-invariant")
  }

  test("jacobi: known 2x2; random symmetric 8x8 reconstructs, " +
      "basis orthonormal, eigenvalues descending") {
    // [[2,1],[1,2]] has eigenvalues 3 and 1
    val (v2, _) = (Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0))))
    assert(v2.sorted.reverse.zip(Seq(3.0, 1.0))
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })

    val rnd = new scala.util.Random(9)
    val m = Array.fill(8, 8)(rnd.nextGaussian())
    val sym = Array.tabulate(8, 8)((i, j) => (m(i)(j) + m(j)(i)) / 2)
    val (vals, vecs) = Pca.jacobiEigen(sym)
    // orthonormal columns
    for (a <- 0 until 8; b <- 0 until 8) {
      val dot = (0 until 8).map(r => vecs(r)(a) * vecs(r)(b)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9,
        s"orthonormality ($a,$b)")
    }
    // A v_k == lambda_k v_k
    for (k <- 0 until 8; r <- 0 until 8) {
      val av = (0 until 8).map(c => sym(r)(c) * vecs(c)(k)).sum
      assert(math.abs(av - vals(k) * vecs(r)(k)) < 1e-9, s"Av=lv ($k,$r)")
    }
  }

  test("fit + project: per-component projection variance equals the " +
      "eigenvalue; whitening normalizes it; deterministic") {
    val rnd = new scala.util.Random(13)
    // anisotropic cloud: x ~ 3g, y ~ g, z ~ 0.1g rotated into 4 dims
    val rows = Seq.fill(500) {
      val a = 3.0 * rnd.nextGaussian(); val b = rnd.nextGaussian()
      val c = 0.1 * rnd.nextGaussian()
      Seq(a + b, a - b, b + c, c - a)
    }
    val df = rows.map(Tuple1(_)).toDF("v").cache()
    val model = Pca.fit(df, "v", 4)
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12),
      "eigenvalues must descend")
    val proj = Pca.project(df, "v", model, k = 4)
    val stats = proj.select(
      (0 until 4).flatMap(c => Seq(
        avg(col(s"p$c")).as(s"m$c"),
        avg(col(s"p$c") * col(s"p$c")).as(s"s$c"))): _*).head()
    for (c <- 0 until 4) {
      val m = stats.getDouble(2 * c)
      val v = stats.getDouble(2 * c + 1) - m * m
      assert(math.abs(m) < 1e-6, s"projection p$c must be centered")
      assert(math.abs(v - model.eigenvalues(c)) <
        1e-6 + model.eigenvalues(c) * 1e-9,
        s"var(p$c)=$v vs eigenvalue ${model.eigenvalues(c)}")
    }
    val white = Pca.project(df, "v", model, k = 2, whiten = true)
    val ws = white.select(
      avg(col("p0") * col("p0")).as("v0"),
      avg(col("p1") * col("p1")).as("v1")).head()
    assert(math.abs(ws.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(ws.getDouble(1) - 1.0) < 1e-6)
    // determinism: same model twice
    val model2 = Pca.fit(df.repartition(11), "v", 4)
    assert(model2.eigenvalues.toSeq === model.eigenvalues.toSeq)
    assert(model2.basis.map(_.toSeq).toSeq === model.basis.map(_.toSeq).toSeq)
  }

  test("meanDrift: hand-computed per-dim cohort gaps; contracts") {
    // cohort A: (1, 10), (3, 30) → means (2, 20); B: (5, 100) → (5, 100)
    val df = Seq(
      (0, Array(1.0f, 10.0f)), (0, Array(3.0f, 30.0f)),
      (1, Array(5.0f, 100.0f)),
      (0, Array(9.0f)), // wrong dim: excluded
      (1, null.asInstanceOf[Array[Float]]) // null vec: excluded
    ).toDF("label", "v")
    val out = Pca.meanDrift(df, "v", dim = 2, cohortA = col("label") === 0)
      .orderBy("d")
      .select("d", "n_a", "n_b", "mean_a", "mean_b", "gap")
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(out === Array(
      (0, 2L, 1L, 2.0, 5.0, -3.0),
      (1, 2L, 1L, 20.0, 100.0, -80.0)))
    // a dimension disappears if either cohort is empty
    val oneSided = Pca.meanDrift(
      Seq((0, Array(1.0f))).toDF("label", "v"), "v", 1,
      col("label") === 0).count()
    assert(oneSided === 0L)
    // layout-independence
    val again = Pca.meanDrift(df.repartition(5), "v", 2,
      col("label") === 0).orderBy("d")
      .select("d", "n_a", "n_b", "mean_a", "mean_b", "gap")
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(again.toSeq === out.toSeq)
  }
}
