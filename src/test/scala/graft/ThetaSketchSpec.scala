package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.{GraftFunctions, ThetaCodec, ThetaSketch}

/** Theta sketch: exact-regime equality, lossy-regime error bounds,
  * order/partition determinism, set algebra, and the SQL surface.
  */
class ThetaSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def sketchOf(items: Seq[String], k: Int): ThetaSketch = {
    val sk = new ThetaSketch(k)
    items.foreach(s => sk.add(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    sk
  }

  test("exact regime: estimate IS the distinct count; insertion order " +
      "and duplicates are irrelevant") {
    val items = (1 to 300).map(i => s"item-$i")
    val dup = items ++ items.reverse ++ items.take(50)
    val sk = sketchOf(dup, 512)
    assert(!sk.bounded && sk.estimate === 300.0)
    val rev = sketchOf(dup.reverse, 512)
    assert(ThetaCodec.serialize(rev).toSeq ===
      ThetaCodec.serialize(sk).toSeq, "canonical serialized form")
  }

  test("lossy regime: theta tightens, estimate lands within KMV bounds, " +
      "and the sketch stays k-bounded") {
    val n = 20000
    val sk = sketchOf((1 to n).map(i => s"key-$i"), 256)
    assert(sk.bounded && sk.set.size === 256)
    // RSE ~ 1/sqrt(k-1) ~ 6.3%; allow 4 sigma
    assert(math.abs(sk.estimate - n) / n < 0.25,
      s"estimate ${sk.estimate} too far from $n")
  }

  test("merge is order-independent and equals the single-stream sketch " +
      "on these streams") {
    val a = (1 to 5000).map(i => s"a-$i")
    val b = (1 to 7000).map(i => s"b-$i")
    val ab = sketchOf(a, 128).mergeIn(sketchOf(b, 128))
    val ba = sketchOf(b, 128).mergeIn(sketchOf(a, 128))
    assert(ThetaCodec.serialize(ab).toSeq === ThetaCodec.serialize(ba).toSeq)
    intercept[IllegalArgumentException] {
      sketchOf(a, 128).mergeIn(sketchOf(b, 64))
    }
  }

  test("set algebra in the exact regime is exact set algebra") {
    val a = (1 to 400).map(i => s"k-$i")
    val b = (200 to 700).map(i => s"k-$i")
    val sa = ThetaCodec.serialize(sketchOf(a, 1024))
    val sb = ThetaCodec.serialize(sketchOf(b, 1024))
    assert(ThetaCodec.setOp(sa, sb, "intersect").estimate === 201.0)
    assert(ThetaCodec.setOp(sa, sb, "difference").estimate === 199.0)
    assert(ThetaCodec.setOp(sa, sb, "union").estimate === 700.0)
    intercept[IllegalArgumentException] {
      ThetaCodec.setOp(sa, sb, "xor")
    }
  }

  test("set algebra under a tightened theta uses the min bound") {
    // two 50k streams overlapping in 25k keys: the expected retained
    // overlap is ~ k/2 = 64 entries, so the estimate concentrates
    // (RSE ~ 1/sqrt(64) ~ 12.5%; assert a generous 4-sigma band)
    val a = (1 to 50000).map(i => s"c-$i")
    val b = (25001 to 75000).map(i => s"c-$i")
    val inter = ThetaCodec.setOp(ThetaCodec.serialize(sketchOf(a, 128)),
      ThetaCodec.serialize(sketchOf(b, 128)), "intersect")
    assert(inter.bounded, "result inherits the tighter bound")
    assert(inter.estimate > 12500 && inter.estimate < 37500,
      s"intersection estimate ${inter.estimate} too far from 25000")
  }

  test("distributed aggregation is partition-deterministic and the " +
      "column surface composes") {
    import GraftFunctions.{theta, thetaEstimate, thetaMerge, thetaSetOp}
    val df = spark.range(0, 3000)
      .select((col("id") % 500).cast(StringType).as("s"),
        (col("id") % 2 === 0).as("even"))
    val once = df.repartition(3).agg(theta(col("s"), 1024).as("sk"))
      .select(thetaEstimate(col("sk"))).as[Double].head
    val twice = df.repartition(17).agg(theta(col("s"), 1024).as("sk"))
      .select(thetaEstimate(col("sk"))).as[Double].head
    assert(once === 500.0 && twice === 500.0)
    // group → merge rollup → set ops, all through Columns
    val perGroup = df.groupBy(col("even"))
      .agg(theta(col("s"), 1024).as("sk")).localCheckpoint(true)
    val all = perGroup.agg(thetaMerge(col("sk")).as("sk"))
      .select(thetaEstimate(col("sk"))).as[Double].head
    assert(all === 500.0)
    val pair = perGroup.where(col("even")).select(col("sk").as("a"))
      .crossJoin(perGroup.where(!col("even")).select(col("sk").as("b")))
    // evens cover 0,2..498 (250 keys); odds the other 250 — disjoint
    assert(pair.select(thetaEstimate(
      thetaSetOp(col("a"), col("b"), "intersect"))).as[Double].head === 0.0)
    assert(pair.select(thetaEstimate(
      thetaSetOp(col("a"), col("b"), "difference"))).as[Double].head === 250.0)
  }

  test("SQL surface: build, merge, estimate, setop") {
    spark.range(0, 100).select((col("id") % 10).cast(StringType).as("s"))
      .createOrReplaceTempView("theta_in")
    val est = spark.sql(
      """SELECT graft_theta_estimate(graft_theta(s, 64)) AS e
        |FROM theta_in""".stripMargin).as[Double].head
    assert(est === 10.0)
    val ops = spark.sql(
      """WITH a AS (SELECT graft_theta(s, 64) AS sk FROM theta_in),
        |b AS (SELECT graft_theta(s, 64) AS sk FROM theta_in WHERE s < '5')
        |SELECT
        |  graft_theta_estimate(graft_theta_setop(a.sk, b.sk, 'intersect')),
        |  graft_theta_estimate(graft_theta_setop(a.sk, b.sk, 'difference'))
        |FROM a, b""".stripMargin).as[(Double, Double)].head
    assert(ops === ((5.0, 5.0)))
    GraftFunctions.register(spark)
    val lossy = spark.sql(
      "SELECT graft_theta_estimate(graft_theta(s, 8)) FROM theta_in")
      .as[Double].head // lossy k through register(): runs and is sane
    assert(lossy > 0.0 && lossy < 100.0)
  }
}
