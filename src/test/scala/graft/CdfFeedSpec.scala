package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.VersionedTable

/** Write-time CDC files + the DSv2 change-data-feed view: row-level
  * commits record their exact typed changes when
  * `graft.enableChangeDataFeed=true`, and both batch and streaming
  * readers serve the feed as plain file scans.
  */
class CdfFeedSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("cdf").toString + "/t"

  private def changes(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, String, String, Long)] =
    df.select("k", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet

  test("write-time CDC files: every op records exact typed changes; " +
      "batch DSv2 feed == readChangesCDF; precise upsert pairing") {
    val t = tmp()
    VersionedTable.append(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1), t) // v1
    VersionedTable.alterProperties(spark, t,
      Map(VersionedTable.CdcProperty -> "true"))                          // v2
    VersionedTable.update(spark, t, col("k") === 2L,
      Map("v" -> lit("B")))                                               // v3
    VersionedTable.upsert(spark,
      Seq((1L, "A"), (9L, "i")).toDF("k", "v"), t, "k")                   // v4
    VersionedTable.deleteByKeys(spark, t, Seq(9L).toDF("k"))              // v5
    VersionedTable.deleteWhereMergeOnRead(spark, t, col("k") === 3L)      // v6
    val want = Set(
      (2L, "b", "update_preimage", 3L), (2L, "B", "update_postimage", 3L),
      // write-time upsert CDC pairs precisely (the derivation fallback
      // can only say delete+insert)
      (1L, "a", "update_preimage", 4L), (1L, "A", "update_postimage", 4L),
      (9L, "i", "insert", 4L),
      (9L, "i", "delete", 5L),
      (3L, "c", "delete", 6L))
    val dsv2 = spark.read.format("graft-table")
      .option("readChangeFeed", "true").option("startingVersion", 2)
      .load(t)
    assert(changes(dsv2) === want)
    assert(changes(VersionedTable.readChangesCDF(spark, t, 2L)) === want)
    // the feed range composes: full history = inserts + the above
    val full = spark.read.format("graft-table")
      .option("readChangeFeed", "true").load(t)
    assert(changes(full) === want ++ Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
      (3L, "c", "insert", 1L)))
  }

  test("streaming CDF: typed changes drain exactly once across restarts") {
    val t = tmp()
    val ckpt = Files.createTempDirectory("cdf_ckpt").toString
    VersionedTable.append(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    VersionedTable.alterProperties(spark, t,
      Map(VersionedTable.CdcProperty -> "true"))
    def runOnce(): Set[(Long, String, String, Long)] = {
      val got = scala.collection.mutable.Set.empty[(Long, String, String, Long)]
      val q = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(t)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset
            [org.apache.spark.sql.Row], _: Long) =>
          got.synchronized { got ++= changes(batch.toDF()) }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      got.synchronized(got.toSet)
    }
    assert(runOnce() === Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L)))
    // row-level commits now stream as typed changes — no resync
    VersionedTable.upsert(spark, Seq((2L, "B2")).toDF("k", "v"), t, "k")
    VersionedTable.delete(spark, t, col("k") === 1L)
    assert(runOnce() === Set(
      (2L, "b", "update_preimage", 3L), (2L, "B2", "update_postimage", 3L),
      (1L, "a", "delete", 4L)))
    // nothing new: a third run drains zero rows
    assert(runOnce() === Set.empty)
  }

  test("_commit_version predicates prune CDF partition planning — and " +
      "let the feed skip vacuumed history") {
    val t = tmp()
    VersionedTable.append(spark, Seq((1L, "a")).toDF("k", "v"), t)       // v1
    VersionedTable.alterProperties(spark, t,
      Map(VersionedTable.CdcProperty -> "true"))                         // v2
    VersionedTable.append(spark, Seq((2L, "b")).toDF("k", "v"), t)       // v3
    VersionedTable.upsert(spark, Seq((2L, "B")).toDF("k", "v"), t, "k")  // v4
    def feed() = spark.read.format("graft-table")
      .option("readChangeFeed", "true").load(t)
    // the filter narrows planning to (2, latest] — equal to the option
    assert(changes(feed().where(col("_commit_version") >= 3)) ===
      changes(spark.read.format("graft-table")
        .option("readChangeFeed", "true").option("startingVersion", 2)
        .load(t)))
    // a bound beyond latest plans nothing
    assert(feed().where(col("_commit_version") > 99).count() === 0L)
    // prune BELOW a vacuumed manifest: without the pushdown this read
    // would throw on the missing history
    VersionedTable.vacuum(spark, t, keepFrom = 3L, retentionMs = 0L)
    assert(changes(feed().where(col("_commit_version") >= 4)) ===
      Set((2L, "b", "update_preimage", 4L),
        (2L, "B", "update_postimage", 4L)))
  }

  test("streaming keyed mirror over the CDF: dst tracks src through " +
      "row-level commits, replay-safe") {
    val base = Files.createTempDirectory("cdf_mirror").toString
    val src = s"$base/src"
    val dst = s"$base/dst"
    val ckpt = s"$base/ckpt"
    def snapshot(t: String) = VersionedTable.read(spark, t)
      .orderBy("k").as[(Long, String)].collect().toSeq
    VersionedTable.append(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1), src)
    VersionedTable.alterProperties(spark, src,
      Map(VersionedTable.CdcProperty -> "true"))
    def mirrorOnce(): Unit = {
      val q = graft.streaming.VersionedSink.startReplicateCDF(spark,
        src, dst, "mirror", "k", ckpt)
      q.awaitTermination(120000)
      ()
    }
    mirrorOnce()
    assert(snapshot(dst) === snapshot(src))
    VersionedTable.update(spark, src, col("k") === 2L, Map("v" -> lit("B")))
    VersionedTable.deleteByKeys(spark, src, Seq(3L).toDF("k"))
    VersionedTable.upsert(spark, Seq((9L, "i")).toDF("k", "v"), src, "k")
    mirrorOnce()
    assert(snapshot(dst) === snapshot(src))
    assert(snapshot(dst) === Seq((1L, "a"), (2L, "B"), (9L, "i")))
    // replay: a third run moves nothing
    val vBefore = VersionedTable.latest(spark, dst)._1
    mirrorOnce()
    assert(VersionedTable.latest(spark, dst)._1 === vBefore)
    assert(snapshot(dst) === snapshot(src))
  }

  test("row-level commit without a CDC file: the feed fails loudly; " +
      "ignoreRowLevelChanges skips it") {
    val t = tmp()
    VersionedTable.append(spark, Seq((1L, "a")).toDF("k", "v"), t)
    VersionedTable.update(spark, t, col("k") === 1L, Map("v" -> lit("x")))
    val e = intercept[Exception] {
      spark.read.format("graft-table").option("readChangeFeed", "true")
        .load(t).collect()
    }
    assert(e.getMessage.contains(VersionedTable.CdcProperty))
    val skipped = spark.read.format("graft-table")
      .option("readChangeFeed", "true")
      .option("ignoreRowLevelChanges", "true").load(t)
    assert(changes(skipped) === Set((1L, "a", "insert", 1L)))
  }

  test("SQL rewrites write CDC files too (UPDATE via catalog, labeled " +
      "pre/post)") {
    val wh = Files.createTempDirectory("cdf_wh").toString
    spark.conf.set("spark.sql.catalog.gcdf",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcdf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcdf.ns")
    spark.sql("CREATE TABLE gcdf.ns.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gcdf.ns.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE gcdf.ns.t SET TBLPROPERTIES " +
      s"('${VersionedTable.CdcProperty}' = 'true')")
    spark.sql("UPDATE gcdf.ns.t SET v = 'B' WHERE k = 2")
    val t = s"$wh/ns/t"
    val got = changes(spark.read.format("graft-table")
      .option("readChangeFeed", "true").option("startingVersion", 3)
      .load(t))
    assert(got === Set(
      (2L, "b", "update_preimage", 4L),
      (2L, "B", "update_postimage", 4L)))
    // vacuum keeps the CDC file while its manifest is retained
    VersionedTable.vacuum(spark, t, keepFrom = 1L, retentionMs = 0L)
    assert(changes(spark.read.format("graft-table")
      .option("readChangeFeed", "true").option("startingVersion", 3)
      .load(t)).nonEmpty)
    spark.sql("DROP TABLE gcdf.ns.t")
  }

  test("row-level op matching ZERO rows still ships a CDC file: the " +
      "feed sees an explicit empty change, not a broken commit") {
    val t = tmp()
    VersionedTable.append(spark, Seq((1L, "a")).toDF("k", "v"), t)       // v1
    VersionedTable.alterProperties(spark, t,
      Map(VersionedTable.CdcProperty -> "true"))                         // v2
    // no key matches → the staged change frame is EMPTY; the commit must
    // still carry a #cdc line or the whole feed fails downstream
    val vDel = VersionedTable.deleteByKeys(spark, t, Seq(99L).toDF("k"))
    assert(vDel === 3L) // the layer commit happens even with no match
    VersionedTable.update(spark, t, col("k") === 42L,
      Map("v" -> lit("never"))) // no-op (may or may not commit)
    VersionedTable.append(spark, Seq((2L, "b")).toDF("k", "v"), t)
    val vIns = VersionedTable.latest(spark, t)._1
    val feed = spark.read.format("graft-table")
      .option("readChangeFeed", "true").option("startingVersion", 2)
      .load(t)
    assert(changes(feed) === Set((2L, "b", "insert", vIns)))
    // table contents untouched by the no-op deletes
    assert(VersionedTable.read(spark, t).as[(Long, String)].collect()
      .toSet === Set((1L, "a"), (2L, "b")))
  }

  test("reserved CDF column names are refused at enable/read/evolve " +
      "time, not silently corrupted") {
    val t = tmp()
    VersionedTable.append(spark,
      Seq((1L, "ins")).toDF("k", "_change_type"), t)
    // enabling CDC on a schema that already has _change_type refuses
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.alterProperties(spark, t,
        Map(VersionedTable.CdcProperty -> "true"))
    }
    assert(e1.getMessage.contains("_change_type"))
    // a CDF read of it refuses too (the read would strip the column)
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft-table").option("readChangeFeed", "true")
        .load(t).collect()
    }
    assert(e2.getMessage.contains("_change_type"))
    // on a clean CDC table, evolving a reserved name in refuses
    val t2 = tmp()
    VersionedTable.append(spark, Seq((1L, "a")).toDF("k", "v"), t2)
    VersionedTable.alterProperties(spark, t2,
      Map(VersionedTable.CdcProperty -> "true"))
    intercept[IllegalArgumentException] {
      VersionedTable.addColumns(spark, t2, Seq(
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType)))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, t2, "v", "_change_type")
    }
  }

  test("catalog-level CDF: read.table / table_changes TVF / " +
      "readStream.table all serve the path-based feed") {
    val wh = Files.createTempDirectory("cdf_cat_wh").toString
    spark.conf.set("spark.sql.catalog.gcdf2",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcdf2.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcdf2.ns")
    spark.sql("CREATE TABLE gcdf2.ns.t (k BIGINT, v STRING)")          // v1
    spark.sql("INSERT INTO gcdf2.ns.t VALUES (1, 'a'), (2, 'b')")      // v2
    spark.sql("ALTER TABLE gcdf2.ns.t SET TBLPROPERTIES " +
      s"('${VersionedTable.CdcProperty}' = 'true')")                   // v3
    spark.sql("UPDATE gcdf2.ns.t SET v = 'B' WHERE k = 2")             // v4
    spark.sql("DELETE FROM gcdf2.ns.t WHERE k = 1")                    // v5
    val path = s"$wh/ns/t"
    val wantFull = changes(spark.read.format("graft-table")
      .option("readChangeFeed", "true").load(path))
    assert(wantFull === Set(
      (1L, "a", "insert", 2L), (2L, "b", "insert", 2L),
      (2L, "b", "update_preimage", 4L), (2L, "B", "update_postimage", 4L),
      (1L, "a", "delete", 5L)))
    // 1) catalog batch read with the reader option
    assert(changes(spark.read.option("readChangeFeed", "true")
      .table("gcdf2.ns.t")) === wantFull)
    // the option composes with version predicates
    assert(changes(spark.read.option("readChangeFeed", "true")
      .table("gcdf2.ns.t").where(col("_commit_version") >= 4)) ===
      wantFull.filter(_._4 >= 4L))
    // 2) the SQL TVF — INCLUSIVE bounds, catalog name or raw path
    assert(changes(spark.sql(
      "SELECT * FROM table_changes('gcdf2.ns.t', 1)")) === wantFull)
    assert(changes(spark.sql(
      "SELECT * FROM table_changes('gcdf2.ns.t', 4, 4)")) ===
      wantFull.filter(_._4 === 4L))
    assert(changes(spark.sql(
      s"SELECT * FROM table_changes('$path', 5)")) ===
      wantFull.filter(_._4 === 5L))
    // TVF output joins/filters like any relation
    assert(spark.sql("SELECT count(*) FROM table_changes('gcdf2.ns.t', 1) " +
      "WHERE _change_type = 'insert'").head().getLong(0) === 2L)
    // 3) streaming over the catalog identifier drains the same feed
    val ckpt = Files.createTempDirectory("cdf_cat_ck").toString
    val out = Files.createTempDirectory("cdf_cat_out").toString + "/dst"
    val q = spark.readStream.option("readChangeFeed", "true")
      .table("gcdf2.ns.t").writeStream
      .trigger(Trigger.AvailableNow()).option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        VersionedTable.append(spark, b, out); ()
      }.start()
    q.awaitTermination(120000)
    assert(changes(VersionedTable.read(spark, out)) === wantFull)
    // restart: nothing re-delivered
    val q2 = spark.readStream.option("readChangeFeed", "true")
      .table("gcdf2.ns.t").writeStream
      .trigger(Trigger.AvailableNow()).option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        VersionedTable.append(spark, b, out); ()
      }.start()
    q2.awaitTermination(120000)
    assert(changes(VersionedTable.read(spark, out)) === wantFull)
    // a plain read stays a plain read (no option = snapshot semantics)
    assert(spark.read.table("gcdf2.ns.t").columns.toSeq ===
      Seq("k", "v"))
    // CDF + time travel contradict: refuse loudly
    intercept[Exception] {
      spark.read.option("readChangeFeed", "true")
        .option("versionAsOf", "2").table("gcdf2.ns.t").collect()
    }
    spark.sql("DROP TABLE gcdf2.ns.t")
  }

  test("_commit_version >= Long.MinValue is a no-op bound, not an " +
      "underflow that prunes everything") {
    val t = tmp()
    VersionedTable.append(spark, Seq((1L, "a")).toDF("k", "v"), t)       // v1
    VersionedTable.append(spark, Seq((2L, "b")).toDF("k", "v"), t)       // v2
    def feed() = spark.read.format("graft-table")
      .option("readChangeFeed", "true").load(t)
    val all = changes(feed())
    assert(all.map(_._1) === Set(1L, 2L))
    // tautological bounds must not prune (x-1 would wrap to MaxValue)
    assert(changes(feed().where(
      col("_commit_version") >= Long.MinValue)) === all)
    assert(changes(feed().where(
      col("_commit_version") > Long.MinValue)) === all)
    // an impossible EqualTo bound returns empty, through pruning or not
    assert(feed().where(
      col("_commit_version") === Long.MinValue).count() === 0L)
  }
}
