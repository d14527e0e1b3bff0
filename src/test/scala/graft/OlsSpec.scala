package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics

class OlsSpec extends SparkTestBase {
  import spark.implicits._

  test("recovers a planted line per group; nulls excluded") {
    val df = Seq(
      ("a", Some(1.0), 4.0), ("a", Some(2.0), 7.0), ("a", Some(3.0), 10.0),
      ("a", Some(4.0), 13.0),
      ("b", Some(1.0), 9.0), ("b", Some(2.0), 7.0), ("b", Some(3.0), 5.0),
      ("b", Option.empty[Double], 99.0)
    ).toDF("g", "x", "y")
    val out = Analytics.olsByGroup(df, Seq("g"), "x", "y")
      .select("g", "n", "slope", "intercept", "r2")
      .as[(String, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val a = out("a")
    assert(a._2 === 4L)
    assert(math.abs(a._3 - 3.0) < 1e-12 && math.abs(a._4 - 1.0) < 1e-12)
    assert(math.abs(a._5 - 1.0) < 1e-12)
    val b = out("b")
    assert(b._2 === 3L, "null x row excluded")
    assert(math.abs(b._3 + 2.0) < 1e-12 && math.abs(b._4 - 11.0) < 1e-12)
  }

  test("bit-identical across partition layouts") {
    val df = spark.range(3000).select(
      (col("id") % 4).cast("string").as("g"),
      (col("id") % 24).cast("double").as("x"),
      (pmod(xxhash64(col("id")), lit(500)).cast("double") / 10.0
        + (col("id") % 24) * 2.0).as("y"))
    def run(p: Int) = Analytics.olsByGroup(df.repartition(p), Seq("g"),
      "x", "y")
      .select("g", "slope", "intercept", "r2")
      .as[(String, Double, Double, Double)].collect().toSet
    assert(run(1) === run(17), "decimal moments must kill order effects")
  }
}
