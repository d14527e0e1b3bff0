package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{TableHealth, VersionedTable}

/** Layout-health advisor: fragmentation + clustering-overlap metrics
  * from one manifest read. */
class TableHealthSpec extends SparkTestBase {
  import spark.implicits._

  test("layoutReport: fragmentation before vs after compaction") {
    val dir = Files.createTempDirectory("health1").toString + "/t"
    val df = (1 to 4000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    VersionedTable.append(spark, df.repartition(8), dir)
    val before = TableHealth.layoutReport(spark, dir,
      targetFileBytes = 256 * 1024)
      .select("n_files", "n_rows", "small_files")
      .as[(Long, Long, Long)].head()
    assert(before._1 === 8L)
    assert(before._2 === 4000L)
    assert(before._3 === 8L) // every 500-row file is under 128 KiB
    VersionedTable.compact(spark, dir, numFiles = 2)
    val after = TableHealth.layoutReport(spark, dir,
      targetFileBytes = 256 * 1024)
      .select("n_files", "n_rows").as[(Long, Long)].head()
    assert(after._1 === 2L)
    assert(after._2 === 4000L)
  }

  test("layoutReport: recommended_files follows total/target") {
    val dir = Files.createTempDirectory("health2").toString + "/t"
    VersionedTable.append(spark,
      (1 to 100).map(i => (i.toLong, "x" * 50)).toDF("id", "v"), dir)
    val r = TableHealth.layoutReport(spark, dir, targetFileBytes = 1)
      .select("total_bytes", "recommended_files").as[(Long, Long)].head()
    assert(r._2 === r._1) // target 1 byte -> one file per byte
    val r2 = TableHealth.layoutReport(spark, dir,
      targetFileBytes = Long.MaxValue / 4)
      .select("recommended_files").as[Long].head()
    assert(r2 === 1L)
  }

  test("boundsOverlap: range-clustered files are disjoint, a shuffled " +
    "layout overlaps almost everywhere") {
    val rows = (1 to 8000).map(i => (i.toLong, i % 97)).toDF("id", "m")
    // clustered: disjoint id ranges per file
    val cdir = Files.createTempDirectory("health3").toString + "/c"
    VersionedTable.append(spark,
      rows.repartitionByRange(8, col("id")).sortWithinPartitions("id"),
      cdir)
    val c = TableHealth.boundsOverlap(spark, cdir, "id")
      .select("files_with_bounds", "overlapping_pairs",
        "possible_pairs", "overlap_fraction")
      .as[(Long, Long, Long, Double)].head()
    assert(c._1 === 8L)
    assert(c._3 === 28L)
    assert(c._2 === 0L) // range layout: zero overlapping pairs
    assert(c._4 === 0.0)
    // shuffled: every file spans ~the full id domain
    val sdir = Files.createTempDirectory("health3").toString + "/s"
    VersionedTable.append(spark, rows.repartition(8, col("m")), sdir)
    val s = TableHealth.boundsOverlap(spark, sdir, "id")
      .select("overlap_fraction").as[Double].head()
    assert(s === 1.0) // nothing prunes: re-cluster signal
  }

  test("SQL surface: CALL layout_report / cluster_health") {
    val dir = Files.createTempDirectory("health5").toString
    spark.conf.set("spark.sql.catalog.ghealth",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ghealth.warehouse", dir)
    val t = dir + "/t"
    VersionedTable.append(spark,
      (1 to 2000).map(i => (i.toLong, i % 5)).toDF("id", "m")
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"), t)
    val rep = spark.sql(s"CALL ghealth.layout_report('$t')").collect()
    assert(rep.length === 1)
    assert(rep.head.getAs[Long]("n_files") === 4L)
    assert(rep.head.getAs[Long]("n_rows") === 2000L)
    val ch = spark.sql(s"CALL ghealth.cluster_health('$t', 'id')")
      .collect()
    assert(ch.head.getAs[String]("column") === "id")
    assert(ch.head.getAs[Double]("overlap_fraction") === 0.0)
  }

  test("boundsOverlap: column without stats yields zero denominators, " +
    "not a crash") {
    val dir = Files.createTempDirectory("health4").toString + "/t"
    VersionedTable.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    val r = TableHealth.boundsOverlap(spark, dir, "no_such_column")
      .select("files_with_bounds", "possible_pairs", "overlap_fraction")
      .as[(Long, Long, Double)].head()
    assert(r === ((0L, 0L, 0.0)))
  }
}
