package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Analytics

/** Distributed global row numbering: equals the textbook one-window
  * definition, computes the range shuffle once (the correctness anchor —
  * both branches must see identical partition boundaries), and never
  * routes the frame through a single-task global window.
  */
class GlobalRowNumberSpec extends SparkTestBase {
  import spark.implicits._

  private def frame(n: Int) = {
    val rnd = new scala.util.Random(13)
    // shuffled unique keys so partition-local order ≠ input order
    rnd.shuffle((1 to n).toList)
      .map(k => (k.toLong, s"v$k", k % 7))
      .toDF("k", "payload", "grp")
  }

  test("matches row_number() OVER (ORDER BY k) across many partitions") {
    val df = frame(5000)
    val got = Analytics.globalRowNumber(df, Seq("k"), numPartitions = 16)
      .select("k", "rn").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = df.select(col("k"),
        row_number().over(Window.orderBy("k")).cast("long").as("rn"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got === want)
  }

  test("multi-column total order with tie-break column") {
    val df = frame(800).withColumn("dup", col("k") % 10)
    val got = Analytics.globalRowNumber(df, Seq("dup", "k"),
        numPartitions = 8)
      .select("dup", "k", "rn").orderBy("rn").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = df.select(col("dup"), col("k"))
      .orderBy("dup", "k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === want.toSeq)
  }

  test("numbering is a dense deterministic permutation across reruns") {
    val out = Analytics.globalRowNumber(frame(3000), Seq("k"),
      numPartitions = 16)
    // two separate actions must agree (the single-RDD shape fixes the
    // partition boundaries; a two-branch plan with divergent sampled
    // range exchanges produced duplicated numbers here)
    val a = out.select("k", "rn").collect().map(r =>
      (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = out.select("k", "rn").collect().map(r =>
      (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.map(_._2).toSeq === (1L to 3000L), "dense 1..n, no dups")
  }

  test("empty frame and single row behave") {
    val empty = Seq.empty[(Long, String, Int)].toDF("k", "payload", "grp")
    assert(Analytics.globalRowNumber(empty, Seq("k")).count() === 0)
    val one = Seq((42L, "x", 0)).toDF("k", "payload", "grp")
    val r = Analytics.globalRowNumber(one, Seq("k")).select("rn").collect()
    assert(r.head.getLong(0) === 1L)
  }
}
