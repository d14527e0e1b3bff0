package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed PCA / whitening for embedding columns — the
  * dimensionality-reduction half of the similarity stack (project
  * before indexing; whiten before cosine thresholds).
  *
  * The covariance estimation is EXACT and cross-engine portable by
  * construction: inputs quantize to `scale` decimals (quantization is
  * part of the operator contract, like the int8 quantizer's — it is
  * what buys exactness), every moment is a DECIMAL(38, 2·scale) sum of
  * exact decimal products, and the only float steps are the final
  * per-entry closed form — the same discipline as `Analytics.exactStats`
  * extended from 5 moments to the full d(d+1)/2 + d + 1.
  *
  * Scale shape: ONE map-side pass computes each row's 2145-term moment
  * array (d=64) with higher-order functions, `posexplode` + partial
  * aggregation reduce it — the shuffle carries at most (terms ×
  * partitions) narrow decimal rows regardless of corpus size, and the
  * only driver-side object is the moment vector itself (model-sized,
  * the centroid contract). The eigensolve is a deterministic cyclic
  * Jacobi on the d×d driver-side matrix; projection is a broadcast of
  * k basis rows applied map-side through the native dot kernel.
  */
object Pca {

  /** PCA model: quantized-moment mean, row-major orthonormal basis
    * (descending eigenvalue order, sign-normalized: the largest-
    * magnitude component of each axis is positive), eigenvalues.
    */
  case class Model(mean: Array[Double], basis: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def dim: Int = mean.length
  }

  /** Exact (quantized) moment sums: index 0 = n, 1..d = per-dimension
    * sums, then the row-major upper triangle of pairwise product sums —
    * `(i, j>=i)` at `1 + d + i*d - i*(i-1)/2 + (j-i)`. Rows with null /
    * wrong-length vectors are excluded (count them upstream if they
    * matter).
    */
  private[operators] def momentSums(df: DataFrame, vecCol: String,
      dim: Int, scale: Int): Array[java.math.BigDecimal] = {
    val sumsDf = momentSumsDf(df, vecCol, dim, scale)
    val n = 1 + dim + dim * (dim + 1) / 2
    val out = new Array[java.math.BigDecimal](n)
    sumsDf.collect().foreach { r =>
      out(r.getInt(0)) = r.getDecimal(1)
    }
    require(out(0) != null && out(0).signum() > 0,
      s"no usable $dim-dimensional vectors in $vecCol")
    out
  }

  /** The distributed moment plan: (idx, s) with idx as laid out in
    * [[momentSums]].
    */
  private[operators] def momentSumsDf(df: DataFrame, vecCol: String,
      dim: Int, scale: Int): DataFrame = {
    // quantization stays a Catalyst projection (round-half-up +
    // double→decimal cast are exactly Spark's); the d(d+1)/2-term
    // product/sum work runs in ONE primitive-long aggregate pass.
    // r15 optimization (guide §1.2 step 2): the previous relational
    // form built the per-row product array with interpreted nested
    // `transform`s and posexploded d(d+1)/2+d+1 decimal rows PER INPUT
    // ROW into a hash aggregate — at d=64 that is 2,145 boxed decimal
    // ops and exploded rows per row, ~850 ns/term, the entirety of
    // sim12/sim13's cost (3.7 s / 3.2 s at sf0.1). The aggregate emits
    // identical integers (exact unscaled products and sums of the same
    // quantized values, null-skipping matched; see MomentSumsAgg).
    df.where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(transform(col(vecCol),
        e => round(e, scale).cast(DecimalType(18, scale))).as("__xq"))
      .agg(graft.functions.GraftFunctions
        .momentSumsAgg(col("__xq"), dim, scale).as("__m"))
      .select(posexplode(col("__m")).as(Seq("idx", "s")))
  }

  /** Population covariance entries `(i, j>=i, cov)` of the quantized
    * vectors, each a single well-defined float evaluation of the exact
    * moment sums, rounded to 6 decimals for engine portability (the
    * a16 convention: sums past 2^53 unscaled double-round differently
    * in DuckDB's decimal→double cast).
    */
  def covariance(spark: SparkSession, df: DataFrame, vecCol: String,
      dim: Int, scale: Int = 6): DataFrame = {
    val s = momentSums(df, vecCol, dim, scale)
    val n = s(0).doubleValue()
    val rows = for {
      i <- 0 until dim
      j <- i until dim
    } yield Row(i, j, covEntry(s, dim, n, i, j))
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("i", IntegerType, nullable = false),
        StructField("j", IntegerType, nullable = false),
        StructField("cov", DoubleType, nullable = false))))
      // `+ 0.0` canonicalizes IEEE `-0.0` (a tiny negative covariance
      // rounds to negative zero in one engine and positive zero in the
      // other — numerically equal, byte-different under a hash).
      .select(col("i"), col("j"), (round(col("cov"), 6) + lit(0.0)).as("cov"))
      .orderBy("i", "j")
  }

  private def pairIdx(dim: Int, i: Int, j: Int): Int =
    1 + dim + i * dim - i * (i - 1) / 2 + (j - i)

  private def covEntry(s: Array[java.math.BigDecimal], dim: Int,
      n: Double, i: Int, j: Int): Double = {
    val si = s(1 + i).doubleValue()
    val sj = s(1 + j).doubleValue()
    val sij = s(pairIdx(dim, i, j)).doubleValue()
    (sij - si * sj / n) / n
  }

  /** Fit a PCA model from the exact moments: one distributed pass, one
    * deterministic driver-side Jacobi eigensolve of the d×d covariance.
    */
  def fit(df: DataFrame, vecCol: String, dim: Int,
      scale: Int = 6): Model = {
    val s = momentSums(df, vecCol, dim, scale)
    val n = s(0).doubleValue()
    val mean = Array.tabulate(dim)(i => s(1 + i).doubleValue() / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      covEntry(s, dim, n, math.min(i, j), math.max(i, j))
    }
    val (values, vectors) = jacobiEigen(cov)
    // descending eigenvalue, ties by original index; sign convention:
    // the largest-|component| entry (lowest index on ties) is positive
    val order = values.indices.sortBy(k => (-values(k), k))
    val basis = order.map { k =>
      val v = Array.tabulate(dim)(r => vectors(r)(k))
      val m = v.indices.maxBy(r => (math.abs(v(r)), -r))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    Model(mean, basis, order.map(values).toArray)
  }

  /** Project (and optionally whiten) an embedding column onto the top-k
    * components: output columns `p0..p{k-1}` where
    * `pc = dot(x - mean, basis_c)` (divided by sqrt(eigenvalue) when
    * whitening). Map-side: the k basis rows ride the plan as literals
    * (k·d doubles — model-sized), centering folds into a per-component
    * constant, and the dot is the native kernel.
    */
  def project(df: DataFrame, vecCol: String, model: Model, k: Int,
      whiten: Boolean = false): DataFrame = {
    require(k >= 1 && k <= model.basis.length,
      s"k=$k out of range 1..${model.basis.length}")
    val cols = (0 until k).map { c =>
      val b = model.basis(c)
      val centerDot = b.indices.map(i => b(i) * model.mean(i)).sum
      val raw = graft.functions.GraftFunctions.dot(
        col(vecCol), typedlit(b.toSeq)) - lit(centerDot)
      val scaled =
        if (whiten) raw / lit(math.sqrt(model.eigenvalues(c)))
        else raw
      scaled.as(s"p$c")
    }
    df.select(col("*") +: cols: _*)
  }

  /** Per-dimension embedding mean drift between two cohorts — the
    * distribution-shift monitor for an embedding space: after a model
    * refresh / corpus remix, which dimensions moved and by how much.
    * One row per dimension with each cohort's mean and the gap. The
    * report is per-dim ON PURPOSE: a single aggregate norm would chain
    * 64 float additions whose ORDER both engines must match; per-dim
    * values are each ONE division (or one subtraction of two) of exact
    * quantized-decimal sums — the covariance discipline
    * ([[momentSumsDf]]) without the pairwise terms.
    *
    * Scale: posexplode to (dim, value) → one partial-agg shuffle of at
    * most dim × partitions narrow rows; nothing corpus-sized moves.
    */
  def meanDrift(df: DataFrame, vecCol: String, dim: Int,
      cohortA: Column, scale: Int = 6): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val quant = transform(col(vecCol),
      e => round(e, scale).cast(DecimalType(18, scale)))
    df.where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(cohortA.as("__a"), posexplode(quant).as(Seq("d", "__x")))
      .groupBy(col("d"))
      .agg(
        sum(when(col("__a"), col("__x"))).as("__sa"),
        sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__a"), col("__x"))).as("__sb"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"))
      .where(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("mean_a",
        col("__sa").cast(DoubleType) / col("n_a") + lit(0.0))
      .withColumn("mean_b",
        col("__sb").cast(DoubleType) / col("n_b") + lit(0.0))
      .select(col("d"), col("n_a"), col("n_b"), col("mean_a"),
        col("mean_b"),
        (col("mean_a") - col("mean_b") + lit(0.0)).as("gap"))
  }

  /** Deterministic cyclic Jacobi eigensolver for a symmetric matrix:
    * fixed sweep order (row-major upper triangle), fixed rotation
    * formulas, fixed convergence threshold — same input, same output,
    * everywhere. Returns (eigenvalues, column-eigenvector matrix).
    */
  private[graft] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val MaxSweeps = 100
    val Eps = 1e-14
    var sweep = 0
    var off = offNorm(a)
    while (off > Eps && sweep < MaxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > Eps / (d * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 => 45-degree rotation
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
