package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Metadata-only aggregates: an unfiltered, ungrouped COUNT/MIN/MAX on
  * a graft table is answered from the manifest's `#stats` lines as one
  * LocalTableScan row — zero scan tasks. Every soundness gate (delete
  * layers, filters, grouping, inexact-bound types) must fall back to a
  * real scan with the same answer.
  */
class StatsAggSpec extends SparkTestBase {
  import spark.implicits._

  private def load(t: String): DataFrame =
    spark.read.format("graft-table").load(t)

  /** true iff the aggregate was answered without a batch scan */
  private def statsOnly(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("LocalTableScan") && !plan.contains("BatchScan")
  }

  private def newTable(): String = {
    val t = Files.createTempDirectory("sagg").toString + "/t"
    VersionedTable.append(spark,
      Seq((1L, "a", Some(1.5), ts("2024-01-01 10:00:00")),
        (2L, "b", None, ts("2024-01-02 10:00:00")),
        (3L, "c", Some(3.5), ts("2024-01-03 10:00:00")))
        .toDF("k", "s", "v", "t"), t)
    VersionedTable.append(spark,
      Seq((10L, "d", Some(0.5), ts("2023-12-31 10:00:00")),
        (11L, "e", None, ts("2024-02-01 10:00:00")))
        .toDF("k", "s", "v", "t"), t)
    t
  }
  private def ts(s: String) = Timestamp.valueOf(s)

  test("count(*), count(col), min/max answer from the manifest — no scan") {
    val t = newTable()
    val agg = load(t).agg(
      count(lit(1)).as("n"), count(col("v")).as("nv"),
      min(col("k")).as("mn"), max(col("k")).as("mx"),
      min(col("t")).as("tmn"), max(col("t")).as("tmx"))
    assert(statsOnly(agg), agg.queryExecution.executedPlan.toString)
    val r = agg.head()
    assert(r.getLong(0) === 5L)
    assert(r.getLong(1) === 3L)
    assert(r.getLong(2) === 1L && r.getLong(3) === 11L)
    assert(r.getTimestamp(4) === ts("2023-12-31 10:00:00"))
    assert(r.getTimestamp(5) === ts("2024-02-01 10:00:00"))
  }

  test("string and double min/max are NOT pushed (inexact bounds)") {
    val t = newTable()
    val s = load(t).agg(min(col("s")), max(col("s")))
    assert(!statsOnly(s))
    assert(s.head() === org.apache.spark.sql.Row("a", "e"))
    val d = load(t).agg(min(col("v")), max(col("v")))
    assert(!statsOnly(d))
    assert(d.head().getDouble(0) === 0.5)
  }

  test("filters, grouping, and distinct fall back to a real scan") {
    val t = newTable()
    val f = load(t).where(col("k") > 2).agg(count(lit(1)))
    assert(!statsOnly(f))
    assert(f.head().getLong(0) === 3L)
    val g = load(t).groupBy(col("s")).agg(count(lit(1)))
    assert(!statsOnly(g))
    assert(g.count() === 5L)
    val dist = load(t).agg(countDistinct(col("s")))
    assert(!statsOnly(dist))
    assert(dist.head().getLong(0) === 5L)
  }

  test("pending merge-on-read delete layers forbid stats-only answers") {
    val t = newTable()
    VersionedTable.deleteByKeys(spark, t, Seq(10L).toDF("k"))
    val agg = load(t).agg(count(lit(1)), max(col("k")))
    assert(!statsOnly(agg), "layered rows are invisible to footer stats")
    val r = agg.head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 11L)
    // compaction materializes the layer — stats answers come back
    VersionedTable.compact(spark, t, numFiles = 2)
    val agg2 = load(t).agg(count(lit(1)), max(col("k")))
    assert(statsOnly(agg2))
    assert(agg2.head() === org.apache.spark.sql.Row(4L, 11L))
  }

  test("copy-on-write delete keeps pushdown; versionAsOf pins the answer") {
    val t = newTable()
    VersionedTable.delete(spark, t, col("k") >= 10L) // CoW: no layer
    val agg = load(t).agg(count(lit(1)), max(col("k")))
    assert(statsOnly(agg))
    assert(agg.head() === org.apache.spark.sql.Row(3L, 3L))
    val pinned = spark.read.format("graft-table")
      .option("versionAsOf", 2).load(t).agg(count(lit(1)), max(col("k")))
    assert(statsOnly(pinned))
    assert(pinned.head() === org.apache.spark.sql.Row(5L, 11L))
  }

  test("all-null and empty tables give SQL null / zero") {
    val t = Files.createTempDirectory("sagg_n").toString + "/t"
    VersionedTable.create(spark, t, new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("v", "long"))
    val empty = load(t).agg(count(lit(1)), min(col("k")))
    assert(statsOnly(empty))
    assert(empty.head() === org.apache.spark.sql.Row(0L, null))
    VersionedTable.append(spark,
      Seq((1L, None: Option[Long]), (2L, None)).toDF("k", "v"), t)
    val an = load(t).agg(count(col("v")), min(col("v")), max(col("v")))
    assert(statsOnly(an))
    assert(an.head() === org.apache.spark.sql.Row(0L, null, null))
  }

  test("renamed column still answers via field-id-keyed stats") {
    val t = Files.createTempDirectory("sagg_r").toString + "/t"
    VersionedTable.create(spark, t, new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("s", "string"))
    VersionedTable.append(spark,
      Seq((1L, "a"), (11L, "e")).toDF("k", "s"), t)
    VersionedTable.renameColumn(spark, t, "k", "key")
    val agg = load(t).agg(min(col("key")), max(col("key")))
    assert(statsOnly(agg))
    assert(agg.head() === org.apache.spark.sql.Row(1L, 11L))
  }

  test("option aggpushdown=false disables it; answers unchanged") {
    val t = newTable()
    val off = spark.read.format("graft-table")
      .option("aggpushdown", "false").load(t)
      .agg(count(lit(1)), max(col("k")))
    assert(!statsOnly(off))
    assert(off.head() === org.apache.spark.sql.Row(5L, 11L))
  }

  test("GROUP BY _commit_version aggregates answer from the manifest — " +
      "per-commit rows with no scan") {
    val t = newTable() // two appends -> versions 1 and 2
    val g = load(t).groupBy(col("_commit_version"))
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        min(col("k")).as("mn"), max(col("k")).as("mx"))
      .orderBy("_commit_version")
    assert(statsOnly(g), g.queryExecution.executedPlan.toString)
    val rows = g.collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq === Seq(
      (1L, 3L, 2L, 1L, 3L),   // first append: 3 rows, one null v
      (2L, 2L, 1L, 10L, 11L)))// second: 2 rows, one null v
    // fallback parity: the pushed answer equals a real scan's
    val off = spark.read.format("graft-table")
      .option("aggpushdown", "false").load(t)
      .groupBy(col("_commit_version"))
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        min(col("k")).as("mn"), max(col("k")).as("mx"))
      .orderBy("_commit_version")
    assert(!statsOnly(off))
    assert(off.collect().toSeq === rows.toSeq)
    // any OTHER grouping column still falls back
    val other = load(t).groupBy(col("s")).agg(count(lit(1)))
    assert(!statsOnly(other))
    // delete layers forbid the grouped form like the global one
    VersionedTable.deleteByKeys(spark, t, Seq(1L).toDF("k"))
    val layered = load(t).groupBy(col("_commit_version"))
      .agg(count(lit(1)).as("n")).orderBy("_commit_version")
    assert(!statsOnly(layered))
    assert(layered.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq(1L -> 2L, 2L -> 2L))
  }

  test("SQL through the catalog plans metadata-only too") {
    val dir = Files.createTempDirectory("sagg_cat").toString
    spark.conf.set("spark.sql.catalog.sagg",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sagg.warehouse", dir)
    spark.sql("CREATE NAMESPACE sagg.ns")
    spark.sql("CREATE TABLE sagg.ns.t (k BIGINT, s STRING)")
    Seq((5L, "x"), (7L, "y")).toDF("k", "s").write.format("graft-table")
      .mode("append").insertInto("sagg.ns.t")
    val agg = spark.sql("SELECT count(*), min(k), max(k) FROM sagg.ns.t")
    assert(statsOnly(agg), agg.queryExecution.executedPlan.toString)
    assert(agg.head() === org.apache.spark.sql.Row(2L, 5L, 7L))
  }
}
