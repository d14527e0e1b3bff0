package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{SnapshotExport, VersionedTable}

/** External-reader manifest export: raw-parquet reads of the listed
  * files equal the snapshot, delete layers are refused until
  * materialized. */
class SnapshotExportSpec extends SparkTestBase {
  import spark.implicits._

  test("exported manifest read raw equals the snapshot read") {
    val dir = Files.createTempDirectory("exp1").toString
    val t = dir + "/t"
    VersionedTable.append(spark,
      (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .repartition(4), t)
    val (v, n) = SnapshotExport.exportManifest(spark, t, dir + "/m.txt")
    assert(v === 1L)
    assert(n === 4)
    val paths = SnapshotExport.readManifest(spark, dir + "/m.txt")
    assert(paths.size === 4)
    val raw = spark.read.parquet(paths: _*)
      .select("id", "v").as[(Long, String)].collect().toSet
    val snap = VersionedTable.read(spark, t)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(raw === snap)
  }

  test("a pending merge-on-read delete layer is refused; compaction " +
    "materializes it and unblocks the export") {
    val dir = Files.createTempDirectory("exp2").toString
    val t = dir + "/t"
    VersionedTable.append(spark,
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"), t)
    VersionedTable.deleteByKeys(spark, t, Seq(7L, 8L).toDF("id"))
    val e = intercept[IllegalArgumentException] {
      SnapshotExport.exportManifest(spark, t, dir + "/m.txt")
    }
    assert(e.getMessage.contains("delete layer"))
    VersionedTable.compact(spark, t, numFiles = 1)
    val (_, n) = SnapshotExport.exportManifest(spark, t, dir + "/m.txt")
    assert(n === 1)
    val raw = spark.read.parquet(
      SnapshotExport.readManifest(spark, dir + "/m.txt"): _*)
    assert(raw.count() === 98)
    assert(raw.where(col("id").isin(7L, 8L)).count() === 0)
  }

  test("the manifest pins the exported snapshot, not later commits") {
    val dir = Files.createTempDirectory("exp3").toString
    val t = dir + "/t"
    VersionedTable.append(spark, Seq((1L, "a")).toDF("id", "v"), t)
    SnapshotExport.exportManifest(spark, t, dir + "/m.txt")
    VersionedTable.append(spark, Seq((2L, "b")).toDF("id", "v"), t)
    val raw = spark.read.parquet(
      SnapshotExport.readManifest(spark, dir + "/m.txt"): _*)
    assert(raw.count() === 1) // the later append is invisible
  }
}
