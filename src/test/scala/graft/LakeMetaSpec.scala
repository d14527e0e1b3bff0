package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{GraftCatalog, VersionedTable}

/** `graft_history('t')` / `graft_files('t')` metadata TVFs: commit log
  * and live-file statistics as SQL tables, from manifest reads alone.
  */
class LakeMetaSpec extends SparkTestBase {
  import spark.implicits._

  test("graft_history lists every commit with op, file delta, time") {
    val t = Files.createTempDirectory("lmh").toString + "/t"
    VersionedTable.append(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "s"), t)
    VersionedTable.append(spark, Seq((3L, "c")).toDF("k", "s"), t)
    VersionedTable.delete(spark, t, col("k") === 1L)
    val h = spark.sql(s"SELECT * FROM graft_history('$t')")
    assert(h.columns.toSeq === Seq("version", "commit_time", "op",
      "files_added", "files_removed", "txns"))
    val rows = h.orderBy("version")
      .select("version", "op", "files_added", "files_removed")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3))).toSeq
    assert(rows.head === ((1L, "append", 2, 0)))
    assert(rows(1) === ((2L, "append", 1, 0)))
    assert(rows(2)._2 === "delete")
    assert(h.where(col("commit_time") > lit("2020-01-01").cast("timestamp"))
      .count() === 3L, "commit times are real")
  }

  test("graft_files lists the live snapshot with manifest stats") {
    val t = Files.createTempDirectory("lmf").toString + "/t"
    VersionedTable.append(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "s"), t)
    VersionedTable.append(spark, Seq((3L, "c")).toDF("k", "s"), t)
    val f = spark.sql(s"SELECT * FROM graft_files('$t')")
    assert(f.columns.toSeq === Seq("file", "committed_version",
      "row_count", "size_bytes", "stats"))
    assert(f.count() === VersionedTable.latest(spark, t)._2.size.toLong)
    assert(f.agg(sum("row_count")).head().getLong(0) === 3L)
    assert(f.where(col("size_bytes") > 0).count() === f.count())
    assert(f.where(col("stats").contains("\"nk\"")).count() === f.count(),
      "per-column bounds ride along as JSON")
    assert(f.select("committed_version").as[Long].collect().toSet
      === Set(1L, 2L))
  }

  test("catalog identifiers resolve; compaction is visible in both") {
    val dir = Files.createTempDirectory("lmc").toString
    spark.conf.set("spark.sql.catalog.lmc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lmc.warehouse", dir)
    spark.sql("CREATE NAMESPACE lmc.ns")
    spark.sql("CREATE TABLE lmc.ns.t (k BIGINT)")
    spark.sql("INSERT INTO lmc.ns.t VALUES (1), (2)")
    spark.sql("INSERT INTO lmc.ns.t VALUES (3)")
    VersionedTable.compact(spark, s"$dir/ns/t", numFiles = 1)
    val h = spark.sql("SELECT * FROM graft_history('lmc.ns.t')")
    assert(h.where(col("op") === "compact").count() === 1L)
    val f = spark.sql("SELECT * FROM graft_files('lmc.ns.t')")
    assert(f.count() === 1L)
    assert(f.head().getLong(2) === 3L)
  }
}
