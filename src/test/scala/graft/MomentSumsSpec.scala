package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions

/** The native moment aggregate (r15 optimization: it replaced the
  * interpreted transform/posexplode moment build inside
  * [[graft.operators.Pca.momentSumsDf]]) must reproduce the relational
  * formulation's sums EXACTLY — same unscaled integers, same
  * null-element skipping — or the PCA family's cross-engine exactness
  * contract silently breaks.
  */
class MomentSumsSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 5
  private val scale = 6

  /** The pre-r15 relational moment plan, verbatim, as the reference. */
  private def relational(df: org.apache.spark.sql.DataFrame) = {
    val dec = DecimalType(38, 2 * scale)
    val quantized = df
      .where(col("v").isNotNull && size(col("v")) === dim)
      .select(transform(col("v"),
        e => round(e, scale).cast(DecimalType(18, scale))).as("__xq"))
    val xq = col("__xq")
    val prods = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        (get(xq, i) * get(xq, j)).cast(dec))))
    val one = array(lit(java.math.BigDecimal.ONE).cast(dec))
    val arr = concat(one, transform(xq, v => v.cast(dec)), prods)
    quantized
      .select(posexplode(arr).as(Seq("idx", "v")))
      .groupBy("idx").agg(sum(col("v")).as("s"))
  }

  private def native(df: org.apache.spark.sql.DataFrame) =
    df.where(col("v").isNotNull && size(col("v")) === dim)
      .select(transform(col("v"),
        e => round(e, scale).cast(DecimalType(18, scale))).as("__xq"))
      .agg(GraftFunctions.momentSumsAgg(col("__xq"), dim, scale).as("m"))
      .select(posexplode(col("m")).as(Seq("idx", "s")))

  test("native aggregate equals the relational moment plan exactly") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(300) { i =>
      (i.toLong, Array.fill(dim)(rnd.nextDouble() * 20 - 10).toSeq)
    }
    val df = rows.toDF("id", "v")
    val a = native(df).orderBy("idx").collect()
    val b = relational(df).orderBy("idx").collect()
    assert(a.length === b.length && a.length === 1 + dim + dim * (dim + 1) / 2)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getInt(0) === y.getInt(0))
      assert(x.getDecimal(1) === y.getDecimal(1),
        s"idx ${x.getInt(0)}: native ${x.getDecimal(1)} vs " +
          s"relational ${y.getDecimal(1)}")
    }
  }

  test("null elements skip per-term, null/ragged vectors skip the row") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.5, null, 2.0, -3.25, 0.0)),
      (2L, Seq[java.lang.Double](0.5, 1.0, null, null, 4.0)),
      (3L, null.asInstanceOf[Seq[java.lang.Double]]),
      (4L, Seq[java.lang.Double](1.0, 2.0, 3.0)), // ragged: filtered out
      (5L, Seq[java.lang.Double](-1.0, -2.0, 7.125, 8.0, 9.0)))
      .toDF("id", "v")
      .select(col("id"), col("v").cast(ArrayType(DoubleType)).as("v"))
    val a = native(df).orderBy("idx").collect()
    val b = relational(df).orderBy("idx").collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getInt(0) === y.getInt(0))
      assert(x.getDecimal(1) === y.getDecimal(1),
        s"idx ${x.getInt(0)}: native ${x.getDecimal(1)} vs " +
          s"relational ${y.getDecimal(1)}")
    }
  }

  test("long-path overflow escalates to BigInteger without losing exactness") {
    // values near the decimal(18,6) ceiling force product escalation:
    // unscaled ~1e18, product ~1e36 >> Long.MaxValue — the native path
    // must keep matching the relational decimal plan through escalation
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(20)(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 9.9e11))).toDF("id", "v")
    val a = native(df).orderBy("idx").collect()
    val b = relational(df).orderBy("idx").collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getInt(0) === y.getInt(0))
      assert(x.getDecimal(1) === y.getDecimal(1),
        s"idx ${x.getInt(0)}: native ${x.getDecimal(1)} vs " +
          s"relational ${y.getDecimal(1)}")
    }
  }

  test("empty input yields all-zero moments (count slot 0 gates callers)") {
    val df = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    val out = native(df).orderBy("idx").collect()
    assert(out.length === 1 + dim + dim * (dim + 1) / 2)
    assert(out.forall(_.getDecimal(1).signum() === 0))
  }
}
