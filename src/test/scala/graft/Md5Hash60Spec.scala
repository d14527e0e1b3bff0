package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The native md5-60 kernel (r15 optimization: it replaced the
  * md5→substring→conv chain inside [[Dedup.md5Hash60]], the per-draw
  * primitive of every deterministic sampling/bootstrap/mixing operator)
  * must stay bit-equal to the chain an external SQL engine re-derives —
  * any divergence silently rewrites every hash-drawn sample.
  */
class Md5Hash60Spec extends SparkTestBase {
  import spark.implicits._

  private def chain(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("native kernel equals conv(substr(md5,1,15),16,10) on varied input") {
    val rows = Seq(
      "", " ", "0", "a", "42:7", "the quick brown fox",
      "naïve café über straße 日本語 🙂",
      "\t\n\r control", "x" * 500, "-1", "9223372036854775807")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = rows.toDF("id", "s")
    val diff = df.select(
      Dedup.md5Hash60(col("s")).as("native"), chain(col("s")).as("ref"))
      .where(col("native") =!= col("ref") ||
        col("native").isNull =!= col("ref").isNull)
    assert(diff.count() === 0, "native md5-60 must match the SQL chain")
  }

  test("non-string input casts like the old chain; null stays null") {
    val df = Seq(Some(12345L), Some(-7L), None).toDF("v")
    val out = df.select(
      Dedup.md5Hash60(col("v")).as("native"),
      chain(col("v").cast("string")).as("ref")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
  }

  test("kernel survives codegen and interpreted paths identically") {
    val df = Seq.tabulate(64)(i => (i.toLong, s"doc:$i")).toDF("id", "s")
    val a = df.select(sum(Dedup.md5Hash60(col("s")))).collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val b = df.select(sum(Dedup.md5Hash60(col("s")))).collect()
      assert(a.toSeq === b.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("range is [0, 2^60): top 4 bits clear, values non-negative") {
    val mx = Seq.tabulate(256)(i => s"k$i").toDF("s")
      .select(max(Dedup.md5Hash60(col("s"))).as("mx"),
        min(Dedup.md5Hash60(col("s"))).as("mn")).collect().head
    assert(mx.getLong(0) < (1L << 60) && mx.getLong(1) >= 0L)
  }
}
