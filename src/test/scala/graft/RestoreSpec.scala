package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{GraftCatalog, VersionedTable}

/** RESTORE TABLE (metadata-only snapshot rollback) and the SQL `CALL`
  * maintenance procedures over it (compact / vacuum / restore /
  * materialize_field_ids).
  */
class RestoreSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("restore").toString + "/t"

  private def dataFiles(t: String): Set[String] =
    new java.io.File(t).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).toSet

  test("restore is a metadata-only commit: exact snapshot, history " +
      "preserved, no data rewritten") {
    val t = tmp()
    VersionedTable.append(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1), t) // v1
    VersionedTable.append(spark,
      Seq((4L, "d")).toDF("k", "v").coalesce(1), t)                       // v2
    val atV2 = VersionedTable.read(spark, t).as[(Long, String)]
      .collect().toSet
    VersionedTable.delete(spark, t, col("k") === 2L)                      // v3
    VersionedTable.upsert(spark, Seq((1L, "A")).toDF("k", "v"), t, "k")   // v4
    val filesBefore = dataFiles(t)
    val v = VersionedTable.restore(spark, t, 2L)                          // v5
    assert(v === 5L)
    assert(VersionedTable.read(spark, t).as[(Long, String)]
      .collect().toSet === atV2)
    // metadata-only: not one new data file was written
    assert(dataFiles(t) === filesBefore)
    // the bad history stays time-travelable — restore adds, never erases
    assert(VersionedTable.read(spark, t, 4L).as[(Long, String)]
      .collect().toSet === Set((1L, "A"), (3L, "c"), (4L, "d")))
    assert(VersionedTable.history(spark, t)
      .where(col("version") === 5L).select("op")
      .as[String].head() === "restore")
    // restoring to the version we are already at (or an identical
    // state) is a no-op commit-wise
    assert(VersionedTable.restore(spark, t, 2L) === 5L)
  }

  test("restore reinstates and removes merge-on-read layers") {
    val t = tmp()
    VersionedTable.append(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1), t) // v1
    VersionedTable.deleteByKeys(spark, t, Seq(2L).toDF("k"))              // v2
    assert(VersionedTable.read(spark, t).as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (3L, "c")))
    // back BEFORE the MoR delete: its layer is dropped, the row returns
    VersionedTable.restore(spark, t, 1L)                                  // v3
    assert(VersionedTable.read(spark, t).as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (2L, "b"), (3L, "c")))
    // forward again TO the layered snapshot: the layer is reinstated
    VersionedTable.restore(spark, t, 2L)                                  // v4
    assert(VersionedTable.read(spark, t).as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (3L, "c")))
  }

  test("CDC-enabled restore stages its exact row diff; append-rows feed " +
      "guards") {
    val t = tmp()
    VersionedTable.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), t)            // v1
    VersionedTable.alterProperties(spark, t,
      Map(VersionedTable.CdcProperty -> "true"))                          // v2
    VersionedTable.update(spark, t, col("k") === 2L,
      Map("v" -> lit("B")))                                               // v3
    VersionedTable.append(spark,
      Seq((9L, "i")).toDF("k", "v").coalesce(1), t)                       // v4
    VersionedTable.restore(spark, t, 2L)                                  // v5
    val feed = VersionedTable.readChangesCDF(spark, t, 4L, 5L)
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(feed === Set(
      (2L, "B", "delete", 5L), (9L, "i", "delete", 5L),
      (2L, "b", "insert", 5L)))
    // the DSv2 streaming-shape feed serves the same commit from its CDC
    // file (no derivation)
    val dsv2 = spark.read.format("graft-table")
      .option("readChangeFeed", "true")
      .option("startingVersion", 4).load(t)
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(dsv2 === feed)
    // the appended-rows feed cannot represent a restore: loud by
    // default, skippable by contract
    intercept[UnsupportedOperationException] {
      VersionedTable.readChanges(spark, t, 4L).collect()
    }
    assert(VersionedTable.readChanges(spark, t, 4L,
      ignoreRowLevel = true).count() === 0L)
  }

  test("restore carries writer txn watermarks forward (no replay " +
      "re-admission) and refuses vacuumed targets") {
    val t = tmp()
    VersionedTable.append(spark,
      Seq((1L, "a")).toDF("k", "v").coalesce(1), t)                       // v1
    VersionedTable.appendIdempotent(spark,
      Seq((2L, "b")).toDF("k", "v").coalesce(1), t, "writerX", 7L)        // v2
    VersionedTable.restore(spark, t, 1L)                                  // v3
    // the replayed epoch is STILL a no-op after restore
    VersionedTable.appendIdempotent(spark,
      Seq((2L, "b")).toDF("k", "v").coalesce(1), t, "writerX", 7L)
    assert(VersionedTable.read(spark, t).as[(Long, String)]
      .collect().toSet === Set((1L, "a")))
    // burn the old snapshot, then ask for it back
    VersionedTable.compact(spark, t, 1)                                   // v4
    VersionedTable.vacuum(spark, t, keepFrom = 4L, retentionMs = 0L)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.restore(spark, t, 1L)
    }
    assert(e.getMessage.contains("vacuum"))
  }

  test("CALL procedures: compact / vacuum / restore / " +
      "materialize_field_ids through SQL") {
    val wh = Files.createTempDirectory("restore_wh").toString
    spark.conf.set("spark.sql.catalog.gproc",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gproc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.ns")
    spark.sql("CREATE TABLE gproc.ns.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gproc.ns.t VALUES (1, 'a'), (2, 'b')")    // v2
    spark.sql("INSERT INTO gproc.ns.t VALUES (3, 'c')")              // v3
    // compact with named args; returns the committed version
    val cv = spark.sql(
      "CALL gproc.compact('ns.t', num_files => 1)").as[Long].head()
    assert(cv === 4L)
    assert(dataFiles(s"$wh/ns/t").size >= 1)
    assert(spark.sql("SELECT count(*) FROM gproc.ns.t")
      .as[Long].head() === 3L)
    // restore to pre-compaction (the 'system' namespace alias works)
    val rr = spark.sql("CALL gproc.system.restore('ns.t', version => 3)")
      .collect().head
    assert(rr.getLong(0) === 3L && rr.getLong(1) === 5L)
    assert(spark.sql("SELECT * FROM gproc.ns.t ORDER BY k")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // vacuum with zero retention reaps the files of versions < keep_from
    spark.sql("CALL gproc.compact('ns.t', num_files => 1)")          // v6
    val removed = spark.sql(
      "CALL gproc.vacuum('ns.t', retention_hours => 0)").as[Int].head()
    assert(removed >= 1)
    assert(spark.sql("SELECT count(*) FROM gproc.ns.t")
      .as[Long].head() === 3L)
    // field-id materialization commits (or no-ops at the current
    // version if ids already exist)
    val mv = spark.sql(
      "CALL gproc.materialize_field_ids('ns.t')").as[Long].head()
    assert(mv >= 6L)
    // unknown procedure fails loudly
    val err = intercept[Exception] {
      spark.sql("CALL gproc.no_such_proc('x')")
    }
    assert(err.getMessage.toLowerCase.contains("procedure") ||
      err.getMessage.contains("no_such_proc"))
  }
}
