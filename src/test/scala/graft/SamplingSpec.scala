package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.range(2000).select(
    col("id").as("doc_id"),
    concat(lit("src"), (col("id") % 4).cast("string")).as("source")).cache()

  test("resampleToMix keeps ~fraction per group, deterministically") {
    val mix = Map("src0" -> 0.5, "src1" -> 0.0)
    def run() = Sampling.resampleToMix(docs, col("source"), col("doc_id"),
      mix, defaultFraction = 1.0)
    val a = run().select("doc_id").as[Long].collect().toSet
    assert(a === run().select("doc_id").as[Long].collect().toSet,
      "must be run-to-run deterministic")
    // excluded group fully dropped; default groups fully kept
    val bySource = run().groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(!bySource.contains("src1"))
    assert(bySource("src2") === 500L && bySource("src3") === 500L)
    val kept = bySource.getOrElse("src0", 0L).toDouble / 500.0
    assert(kept > 0.4 && kept < 0.6, s"src0 kept fraction $kept far from 0.5")
  }

  test("lower fraction samples are strict subsets (monotone thresholds)") {
    def ids(f: Double) = Sampling.resampleToMix(docs, col("source"),
      col("doc_id"), Map.empty, defaultFraction = f)
      .select("doc_id").as[Long].collect().toSet
    val q = ids(0.25); val h = ids(0.5); val all = ids(1.0)
    assert(q.subsetOf(h) && h.subsetOf(all),
      "same uniform + lower threshold must nest")
    assert(all.size === 2000)
    assert(q.nonEmpty && q.size < h.size && h.size < all.size)
  }
}
