package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Deep table CLONE: exact state carry-over (files, schema, delete
  * layer, stats, props), version pinning, independence from the source,
  * no history leakage, and the SQL procedure surface.
  */
class CloneTableSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(table: String): Set[(Int, String)] =
    VersionedTable.read(spark, table).as[(Int, String)].collect().toSet

  test("clone at latest carries rows, files, and delete layer exactly") {
    val dir = Files.createTempDirectory("vt_clone").toString
    val src = dir + "/src"
    VersionedTable.append(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), src)
    VersionedTable.append(spark, Seq((3, "c")).toDF("k", "v"), src)
    VersionedTable.deleteByKeys(spark, src, Seq(2).toDF("k"))
    val dst = dir + "/dst"
    assert(VersionedTable.cloneTable(spark, src, dst) === 1L)
    assert(rows(dst) === Set((1, "a"), (3, "c")),
      "delete layer must carry over")
    // exact same data file NAMES (layout preserved, no rewrite)
    assert(VersionedTable.latest(spark, dst)._2.toSet ===
      VersionedTable.latest(spark, src)._2.toSet)
    // clone is born at v1 with op clone and NO source history
    val hist = VersionedTable.history(spark, dst)
      .select("version", "op").as[(Long, String)].collect()
    assert(hist.toSeq === Seq((1L, "clone")))
  }

  test("clone pins a version; later source commits don't leak in") {
    val dir = Files.createTempDirectory("vt_clone2").toString
    val src = dir + "/src"
    VersionedTable.append(spark, Seq((1, "a")).toDF("k", "v"), src)
    VersionedTable.append(spark, Seq((2, "b")).toDF("k", "v"), src)
    val dst = dir + "/dst_v1"
    VersionedTable.cloneTable(spark, src, dst, version = Some(1L))
    assert(rows(dst) === Set((1, "a")), "clone must see exactly v1")
    // independence both ways: append to source, then to clone
    VersionedTable.append(spark, Seq((3, "c")).toDF("k", "v"), src)
    assert(rows(dst) === Set((1, "a")))
    VersionedTable.append(spark, Seq((9, "z")).toDF("k", "v"), dst)
    assert(rows(src) === Set((1, "a"), (2, "b"), (3, "c")))
    assert(rows(dst) === Set((1, "a"), (9, "z")))
  }

  test("clone survives a source vacuum (deep copy, not a reference)") {
    val dir = Files.createTempDirectory("vt_clone3").toString
    val src = dir + "/src"
    VersionedTable.append(spark, Seq((1, "a")).toDF("k", "v"), src)
    val dst = dir + "/dst"
    VersionedTable.cloneTable(spark, src, dst)
    // rewrite the source completely, then vacuum its history to nothing
    VersionedTable.overwrite(spark, Seq((7, "new")).toDF("k", "v"), src)
    VersionedTable.vacuum(spark, src,
      keepFrom = VersionedTable.latest(spark, src)._1, retentionMs = 0L)
    assert(rows(dst) === Set((1, "a")),
      "the clone must be unaffected by source vacuum")
  }

  test("clone refuses an existing target and a vacuumed source version") {
    val dir = Files.createTempDirectory("vt_clone4").toString
    val src = dir + "/src"
    VersionedTable.append(spark, Seq((1, "a")).toDF("k", "v"), src)
    val dst = dir + "/dst"
    VersionedTable.cloneTable(spark, src, dst)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.cloneTable(spark, src, dst)
    }
    assert(e.getMessage.contains("already exists"))
    intercept[IllegalArgumentException] {
      VersionedTable.cloneTable(spark, src, dir + "/dst2",
        version = Some(99L))
    }
  }

  test("compact with curve => hilbert rewrites losslessly and validates dims") {
    val dir = Files.createTempDirectory("vt_hilb").toString
    val t = dir + "/t"
    val df = spark.range(4096).select(
      (col("id") % 64).cast("int").as("k"),
      (col("id") / 64).cast("string").as("v"))
    VersionedTable.append(spark, df, t)
    val before = VersionedTable.read(spark, t)
      .as[(Int, String)].collect().sorted.toSeq
    val v = VersionedTable.compact(spark, t, numFiles = 4,
      zorderDims = Seq(col("k"), col("v").cast("int")), curve = "hilbert")
    assert(v === 2L)
    assert(VersionedTable.read(spark, t)
      .as[(Int, String)].collect().sorted.toSeq === before,
      "hilbert compaction must be a pure rewrite")
    // dimensionality contract: hilbert is strictly 2-D
    val e = intercept[IllegalArgumentException] {
      VersionedTable.compact(spark, t, 4,
        zorderDims = Seq(col("k")), curve = "hilbert")
    }
    assert(e.getMessage.contains("2 dims") ||
      e.getMessage.contains("2-D"))
    intercept[IllegalArgumentException] {
      VersionedTable.compact(spark, t, 4,
        zorderDims = Seq(col("k"), col("k")), curve = "peano")
    }
  }

  test("CALL clone(...) procedure clones by path and by catalog name") {
    val dir = Files.createTempDirectory("vt_clone5").toString
    spark.conf.set("spark.sql.catalog.gclone",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gclone.warehouse", dir)
    val src = dir + "/src"
    VersionedTable.append(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), src)
    val out = spark.sql(
      s"CALL gclone.clone('$src', '$dir/dst')").collect()
    assert(out.length === 1 && out.head.getLong(1) === 1L)
    assert(rows(dir + "/dst") === Set((1, "a"), (2, "b")))
    // version-pinned through the procedure arg
    VersionedTable.append(spark, Seq((3, "c")).toDF("k", "v"), src)
    spark.sql(s"CALL gclone.clone('$src', '$dir/dst1', version => 1)")
    assert(rows(dir + "/dst1") === Set((1, "a"), (2, "b")))
  }
}
