package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Bottom-k uniform per-group sampling (s13). */
class BottomKSampleSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.range(2000).select(
    col("id").as("doc_id"),
    concat(lit("src"), (col("id") % 4).cast("string")).as("source"),
    (col("id") * 31 % 100).as("payload")).cache()

  test("exactly k rows per group") {
    val out = Sampling.bottomKSample(docs, col("source"), col("doc_id"), 10)
    val counts = out.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(counts.values.toSet === Set(10L))
    assert(counts.keySet === Set("src0", "src1", "src2", "src3"))
  }

  test("matches the window-form reference (priority asc, id asc)") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(Sampling.hashUniform(col("doc_id")), col("doc_id"))
    val ref = docs.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= 10).drop("__rn")
      .select("doc_id").as[Long].collect().toSet
    val got = Sampling.bottomKSample(docs, col("source"), col("doc_id"), 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got === ref)
  }

  test("k >= group size keeps every row; full schema survives") {
    val out = Sampling.bottomKSample(docs, col("source"), col("doc_id"), 600)
    assert(out.count() === 2000L)
    assert(out.columns.toSeq === Seq("doc_id", "source", "payload"))
  }

  test("deterministic across partition layouts and runs") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.bottomKSample(d, col("source"), col("doc_id"), 25)
        .select("doc_id").as[Long].collect().toSet
    val a = run(docs)
    assert(a === run(docs.repartition(17)))
    assert(a === run(docs))
    assert(a.size === 100)
  }

  test("roughly uniform: sample mean near the population mean") {
    val s = Sampling.bottomKSample(docs, col("source"), col("doc_id"), 100)
      .agg(avg("doc_id")).as[Double].head()
    assert(math.abs(s - 999.5) < 200, s"sample mean $s far from 999.5")
  }
}
