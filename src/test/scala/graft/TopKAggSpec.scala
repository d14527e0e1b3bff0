package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic pseudo-random scores with planted exact ties
  private lazy val rows = spark.range(5000).select(
    (col("id") % 7).as("grp"),
    col("id"),
    (pmod(xxhash64(col("id")), lit(1000)).cast("double") / 100.0).as("score"))

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("grp").orderBy(desc("score"), col("id"))
    rows.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("grp", "id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
  }

  private def aggTopK(k: Int, parts: Int) =
    rows.repartition(parts)
      .groupBy("grp")
      .agg(GraftFunctions.topKPairs(col("id"), col("score"), k).as("t"))
      .select(col("grp"), posexplode(col("t")).as(Seq("rk", "p")))
      .select(col("grp"), col("p.id").as("id"), col("p.score").as("score"),
        (col("rk") + 1).cast("int").as("rank"))
      .as[(Long, Long, Double, Int)].collect().toSet

  test("equals the window rank<=k form, including tie order, at any layout") {
    val w = windowTopK(25)
    assert(aggTopK(25, 1) === w)
    assert(aggTopK(25, 17) === w, "merge across partitions must not reorder")
  }

  test("large k (quicksort compaction path) still equals the window " +
      "form where it truncates") {
    // k = 100 > SelectionMaxK (64) and < the ~714-row groups, so the
    // dual-array sort path both compacts mid-stream and truncates.
    val w = windowTopK(100)
    assert(aggTopK(100, 1) === w)
    assert(aggTopK(100, 13) === w, "merge across partitions must not reorder")
  }

  test("groups smaller than k return all members, ranked") {
    val out = aggTopK(2000, 5)
    assert(out.size === 5000, "k past group size keeps everything")
    val w = windowTopK(2000)
    assert(out === w)
  }

  test("null ids/scores are skipped, not ranked") {
    val df = Seq(
      (1L, Some(1L), Some(5.0)), (1L, Some(2L), None),
      (1L, None, Some(9.0)), (1L, Some(3L), Some(4.0))
    ).toDF("grp", "id", "score")
    val out = df.groupBy("grp")
      .agg(GraftFunctions.topKPairs(col("id"), col("score"), 10).as("t"))
      .select(posexplode(col("t")))
      .select(col("col.id")).as[Long].collect().toSeq
    assert(out === Seq(1L, 3L))
  }

  test("SQL registration: graft_topk works in spark.sql") {
    rows.createOrReplaceTempView("topk_in")
    val sql = spark.sql(
      """SELECT grp, t.id, t.score FROM (
        |  SELECT grp, explode(graft_topk(id, score, 3)) AS t
        |  FROM topk_in GROUP BY grp)""".stripMargin)
      .as[(Long, Long, Double)].collect().toSet
    val w = windowTopK(3).map(r => (r._1, r._2, r._3))
    assert(sql === w)
  }
}
