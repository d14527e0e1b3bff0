package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.SparkShim
import org.apache.spark.sql.types._

/** Native linear-time kernels for the per-key SEQUENTIAL folds
  * (EWMA / Holt / Holt–Winters / Kaplan–Meier).
  *
  * The previous formulation accumulated each step's output via
  * `aggregate(..., concat(acc.arr, array(v)))` — a higher-order-function
  * fold whose accumulator array is COPIED on every step, i.e. O(m²)
  * element copies per key. Invisible at bench key lengths (~10k rows per
  * key) and hash-correct, but one 100k-observation key is ~5·10⁹ copies
  * inside a single task. These expressions preallocate the output arrays
  * and run one JIT-compiled primitive pass — O(m) time, O(m) space — and
  * carry a LOUD per-key bound (the Mann–Kendall discipline,
  * `Analytics.mannKendall`) so an unbounded key fails with a message
  * instead of a mystery straggler.
  *
  * Determinism: each step is the IDENTICAL IEEE chain the HOF fold (and
  * the DuckDB recursive-CTE oracle) evaluates — `1−α`-style complements
  * are computed ONCE at construction as single IEEE subtractions, and a
  * value the SQL spells twice (holt's `nl` inside `nb`) is computed once
  * here, which is bit-identical because a duplicated expression tree over
  * the same inputs yields the same double. The ts3/ts8/ts10/ts18 oracles
  * pin this: they were hash-exact against the HOF fold and stay hash-exact
  * against these kernels.
  *
  * All CodegenFallback (the per-row cost is the internal loop, not the
  * dispatch), null-safe, deterministic.
  */
object SeqFolds {

  /** Per-key series cap for the sequential folds. Generous — the fold is
    * linear, so the real ceiling is the task memory holding the collected
    * array — but LOUD: a key deeper than this fails with a named reason
    * instead of an OOM-ing straggler. Series deeper than this should be
    * time-bucketed / windowed first.
    */
  val MaxSeriesPerKey: Int = 50000000

  private[graft] def boundCheck(n: Int, op: String): Unit =
    if (n > MaxSeriesPerKey) throw new IllegalArgumentException(
      s"$op: key series has $n observations; per-key sequential folds " +
        s"are bounded at $MaxSeriesPerKey — time-bucket or window the " +
        "series first")

  private def doubleArrayCheck(es: Expression*): TypeCheckResult =
    if (es.forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("expected array<double> input")

  /** EWMA over a time-sorted series: out₁ = x₁,
    * out_t = α·x_t + (1−α)·out_{t−1}.
    */
  case class EwmaFold(child: Expression, alpha: Double)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      doubleArrayCheck(child)
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_ewma_fold"
    private val a1 = 1.0 - alpha

    override def nullSafeEval(input: Any): Any = {
      val xs = input.asInstanceOf[ArrayData].toDoubleArray()
      val n = xs.length
      boundCheck(n, prettyName)
      val out = new Array[Double](n)
      var prev = 0.0
      var i = 0
      while (i < n) {
        val ev = if (i == 0) xs(0) else alpha * xs(i) + a1 * prev
        out(i) = ev
        prev = ev
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): EwmaFold =
      copy(child = c)
  }

  def ewmaFold(xs: Column, alpha: Double): Column =
    SparkShim.toColumn(EwmaFold(SparkShim.toExpression(xs), alpha))

  /** Holt double exponential smoothing over a time-sorted series:
    * l₁ = x₁, b₁ = 0; l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1}),
    * b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}. Returns the full level and
    * trend paths.
    */
  case class HoltFold(child: Expression, alpha: Double, beta: Double)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      doubleArrayCheck(child)
    override def dataType: DataType = StructType(Seq(
      StructField("ls", ArrayType(DoubleType, containsNull = false),
        nullable = false),
      StructField("bs", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    override def prettyName: String = "graft_holt_fold"
    private val a1 = 1.0 - alpha
    private val g1 = 1.0 - beta

    override def nullSafeEval(input: Any): Any = {
      val xs = input.asInstanceOf[ArrayData].toDoubleArray()
      val n = xs.length
      boundCheck(n, prettyName)
      val ls = new Array[Double](n)
      val bs = new Array[Double](n)
      var pl = 0.0
      var pb = 0.0
      var i = 0
      while (i < n) {
        val x = xs(i)
        val nl = if (i == 0) x else alpha * x + a1 * (pl + pb)
        val nb = if (i == 0) 0.0 else beta * (nl - pl) + g1 * pb
        ls(i) = nl
        bs(i) = nb
        pl = nl
        pb = nb
        i += 1
      }
      InternalRow(new GenericArrayData(ls), new GenericArrayData(bs))
    }
    override protected def withNewChildInternal(c: Expression): HoltFold =
      copy(child = c)
  }

  def holtFold(xs: Column, alpha: Double, beta: Double): Column =
    SparkShim.toColumn(HoltFold(SparkShim.toExpression(xs), alpha, beta))

  /** Additive Holt–Winters over the post-warm-up series, given the
    * initial level `l0` and the warm-up seasonal state `seas0`
    * (length = period):
    *   l' = α(x − s_{t−m}) + (1−α)(l + b)
    *   b' = β(l' − l) + (1−β)b
    *   s' = γ(x − l') + (1−γ)s_{t−m}
    * The seasonal state is a true ring buffer (O(period) once, O(1) per
    * step) — the HOF fold re-sliced it every step on top of the output
    * concat. Returns level/trend/seasonal paths for the `rest` rows.
    */
  case class HoltWintersFold(first: Expression, second: Expression,
      third: Expression, alpha: Double, beta: Double, gamma: Double)
      extends TernaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
          DoubleType) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "expected (array<double>, array<double>, double)")
      }
    override def dataType: DataType = StructType(Seq(
      StructField("ls", ArrayType(DoubleType, containsNull = false),
        nullable = false),
      StructField("bs", ArrayType(DoubleType, containsNull = false),
        nullable = false),
      StructField("ss", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    override def prettyName: String = "graft_holt_winters_fold"
    private val a1 = 1.0 - alpha
    private val g1 = 1.0 - beta
    private val c1 = 1.0 - gamma

    override def nullSafeEval(xsA: Any, seasA: Any, l0A: Any): Any = {
      val xs = xsA.asInstanceOf[ArrayData].toDoubleArray()
      val seas = seasA.asInstanceOf[ArrayData].toDoubleArray().clone()
      val l0 = l0A.asInstanceOf[Double]
      val n = xs.length
      val m = seas.length
      boundCheck(n, prettyName)
      require(m > 0, s"$prettyName: empty seasonal state")
      val ls = new Array[Double](n)
      val bs = new Array[Double](n)
      val ss = new Array[Double](n)
      var l = l0
      var b = 0.0
      var head = 0 // ring: seas(head) is s_{t−m}; ns overwrites in place
      var i = 0
      while (i < n) {
        val x = xs(i)
        val sm = seas(head)
        val nl = alpha * (x - sm) + a1 * (l + b)
        val nb = beta * (nl - l) + g1 * b
        val ns = gamma * (x - nl) + c1 * sm
        seas(head) = ns
        head += 1
        if (head == m) head = 0
        ls(i) = nl
        bs(i) = nb
        ss(i) = ns
        l = nl
        b = nb
        i += 1
      }
      InternalRow(new GenericArrayData(ls), new GenericArrayData(bs),
        new GenericArrayData(ss))
    }
    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression): HoltWintersFold =
      copy(first = f, second = s, third = t)
  }

  def holtWintersFold(xs: Column, seas0: Column, l0: Column,
      alpha: Double, beta: Double, gamma: Double): Column =
    SparkShim.toColumn(HoltWintersFold(SparkShim.toExpression(xs),
      SparkShim.toExpression(seas0), SparkShim.toExpression(l0),
      alpha, beta, gamma))

  /** Kaplan–Meier survival path over the time-sorted per-cohort step
    * list: S stays 1.0 until the first event time, then multiplies by
    * (n−d)/n at every time with d > 0 (censored-only times carry the
    * previous S). One correctly-rounded division then one multiply per
    * step — the exact chain the recursive-CTE oracle replays.
    */
  case class KaplanMeierFold(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "expected (array<bigint>, array<bigint>)")
      }
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_km_fold"

    override def nullSafeEval(dsA: Any, nsA: Any): Any = {
      val ds = dsA.asInstanceOf[ArrayData].toLongArray()
      val ns = nsA.asInstanceOf[ArrayData].toLongArray()
      val n = ds.length
      boundCheck(n, prettyName)
      require(ns.length == n,
        s"$prettyName: d/n arrays disagree (${ds.length} vs ${ns.length})")
      val out = new Array[Double](n)
      var s = 1.0
      var i = 0
      while (i < n) {
        val d = ds(i)
        if (d > 0) s = s * ((ns(i) - d).toDouble / ns(i).toDouble)
        out(i) = s
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): KaplanMeierFold = copy(left = l, right = r)
  }

  def kmFold(ds: Column, ns: Column): Column =
    SparkShim.toColumn(KaplanMeierFold(SparkShim.toExpression(ds),
      SparkShim.toExpression(ns)))

  /** Nelson–Aalen cumulative hazard path over the same time-sorted
    * step list as [[KaplanMeierFold]]: H += d/n at every time with
    * d > 0 (censored-only times carry the previous H). One division,
    * one addition per step — the additive sibling of the KM product,
    * same recursive-CTE oracle shape.
    */
  case class NelsonAalenFold(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "expected (array<bigint>, array<bigint>)")
      }
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_na_fold"

    override def nullSafeEval(dsA: Any, nsA: Any): Any = {
      val ds = dsA.asInstanceOf[ArrayData].toLongArray()
      val ns = nsA.asInstanceOf[ArrayData].toLongArray()
      val n = ds.length
      boundCheck(n, prettyName)
      require(ns.length == n,
        s"$prettyName: d/n arrays disagree (${ds.length} vs ${ns.length})")
      val out = new Array[Double](n)
      var h = 0.0
      var i = 0
      while (i < n) {
        val d = ds(i)
        if (d > 0) h = h + d.toDouble / ns(i).toDouble
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): NelsonAalenFold = copy(left = l, right = r)
  }

  def naFold(ds: Column, ns: Column): Column =
    SparkShim.toColumn(NelsonAalenFold(SparkShim.toExpression(ds),
      SparkShim.toExpression(ns)))

  /** Isotonic regression by Pool-Adjacent-Violators over a time-ordered
    * series of EXACT integer cents: `array<bigint> → array<double>` of
    * the monotone-nondecreasing least-squares fit.
    *
    * The pooling stack merges a new point into the previous block while
    * the previous block's mean ≥ the current's — compared EXACTLY via
    * BigInteger cross-multiplication (c₁·n₂ vs c₂·n₁), so block
    * boundaries are the true PAV boundaries, never a double-rounding
    * artifact. Each output value is then ONE fixed IEEE chain over the
    * exact block sums: `cents.toDouble / (100.0 · n)` — the same chain
    * a SQL oracle can evaluate from prefix sums via the minimax
    * characterization fitted(k) = max_{i≤k} min_{j≥k} mean(i..j)
    * (double-collapsed comparisons in the oracle are value-safe: where
    * two candidate means differ as fractions but round to one double,
    * either choice publishes that same double).
    *
    * O(m) time/space per key (each point is pushed and merged at most
    * once); same loud per-key bound as the sibling folds.
    */
  case class PavFold(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure("expected array<bigint>")
      }
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_pav_fold"

    override def nullSafeEval(centsA: Any): Any = {
      val cents = centsA.asInstanceOf[ArrayData].toLongArray()
      val m = cents.length
      boundCheck(m, prettyName)
      // block stack: sums, counts, start index
      val bc = new Array[Long](m); val bn = new Array[Int](m)
      val bs = new Array[Int](m)
      var top = -1
      def geq(c1: Long, n1: Int, c2: Long, n2: Int): Boolean = {
        // c1/n1 >= c2/n2 over positive n, exact: c1*n2 >= c2*n1.
        // long is safe while |c|*n < 2^63; fall back to BigInteger on
        // magnitudes that could wrap (deep keys of large cents)
        val safe = math.abs(c1) <= Long.MaxValue / math.max(n2, 1) &&
          math.abs(c2) <= Long.MaxValue / math.max(n1, 1)
        if (safe) c1 * n2 >= c2 * n1
        else java.math.BigInteger.valueOf(c1)
          .multiply(java.math.BigInteger.valueOf(n2))
          .compareTo(java.math.BigInteger.valueOf(c2)
            .multiply(java.math.BigInteger.valueOf(n1))) >= 0
      }
      var i = 0
      while (i < m) {
        top += 1
        bc(top) = cents(i); bn(top) = 1; bs(top) = i
        while (top > 0 && geq(bc(top - 1), bn(top - 1), bc(top), bn(top))) {
          bc(top - 1) += bc(top); bn(top - 1) += bn(top)
          top -= 1
        }
        i += 1
      }
      val out = new Array[Double](m)
      var b = 0
      while (b <= top) {
        val v = bc(b).toDouble / (100.0 * bn(b))
        val end = if (b == top) m else bs(b + 1)
        var k = bs(b)
        while (k < end) { out(k) = v; k += 1 }
        b += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(
        newChild: Expression): PavFold = copy(child = newChild)
  }

  def pavFold(cents: Column): Column =
    SparkShim.toColumn(PavFold(SparkShim.toExpression(cents)))
}
