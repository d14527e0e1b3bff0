package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.VersionedTable

/** DataSource V2 `graft-table`: batch reads = committed snapshot;
  * streaming reads = the changefeed with manifest versions as offsets.
  */
class GraftTableSourceSpec extends SparkTestBase {
  import spark.implicits._

  test("batch read serves the committed snapshot, not the directory") {
    val t = Files.createTempDirectory("gts_b").toString + "/t"
    VersionedTable.append(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    // stray uncommitted file in the table dir must stay invisible
    Seq((99, "stray")).toDF("k", "v").write
      .parquet(t + "/part-stray.parquet.dir")
    val got = spark.read.format("graft-table").load(t)
    // the table schema is the data schema; _commit_version is a METADATA
    // column selected by name, like _metadata on file sources
    assert(got.columns.toSeq === Seq("k", "v"))
    assert(got.select("k").as[Int].collect().sorted.toSeq === Seq(1, 2))
    assert(got.select(col("k"), col("_commit_version")).as[(Int, Long)]
      .collect().toSet === Set((1, 1L), (2, 1L)))
    // a plain parquet read of the same dir DOES see the stray file —
    // the manifest is what isolates the snapshot
    assert(spark.read.parquet(t + "/part-stray.parquet.dir")
      .count() === 1L)
  }

  test("stream tails appends exactly once across restarts; compaction silent") {
    val t = Files.createTempDirectory("gts_s").toString + "/t"
    val ckpt = Files.createTempDirectory("gts_ckpt").toString
    VersionedTable.append(spark, Seq(1, 2).toDF("k"), t) // v1
    VersionedTable.append(spark, Seq(3).toDF("k"), t)    // v2

    // foreachBatch sink (memory sink cannot recover from a checkpoint);
    // each run drains into its own buffer so restarts are observable
    def runOnce(): Seq[Int] = {
      val got = new scala.collection.mutable.ArrayBuffer[Int]
      val q = spark.readStream.format("graft-table").load(t)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset
            [org.apache.spark.sql.Row], _: Long) =>
          got.synchronized { got ++= batch.select("k").as[Int].collect() }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      got.synchronized(got.toSeq.sorted)
    }

    assert(runOnce() === Seq(1, 2, 3))

    // compaction (v3) must ship nothing; the new append (v4) must ship
    VersionedTable.compact(spark, t, numFiles = 1)
    VersionedTable.append(spark, Seq(4).toDF("k"), t)
    assert(runOnce() === Seq(4),
      "restart must resume past v2, skip the rewrite")
  }

  test("column pruning and filter pushdown reach the v2 scan") {
    val t = Files.createTempDirectory("gts_p").toString + "/t"
    VersionedTable.append(spark,
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), t)
    val df = spark.read.format("graft-table").load(t)
      .where(col("k") >= 2).select("v")
    assert(df.as[String].collect().sorted.toSeq === Seq("b", "c"))
    // the scan leaf itself must output only the pruned columns (the
    // filter column k rides along; _commit_version must NOT)
    val leafOutputs = df.queryExecution.executedPlan.collectLeaves()
      .map(_.output.map(_.name).toSet)
    assert(leafOutputs.exists(o => o.contains("v") &&
      !o.contains("_commit_version")), s"scan not pruned: $leafOutputs")
    // version-only projection: zero data columns read, real provenance
    val versions = spark.read.format("graft-table").load(t)
      .select("_commit_version").as[Long].collect().toSeq
    assert(versions === Seq(1L, 1L, 1L))
  }

  test("streaming materialized view: source -> transform -> exactly-once sink") {
    val src = Files.createTempDirectory("gts_mv_src").toString + "/t"
    val dst = Files.createTempDirectory("gts_mv_dst").toString + "/t"
    val ckpt = Files.createTempDirectory("gts_mv_ckpt").toString
    VersionedTable.append(spark, Seq(1, 2, 3, 4).toDF("k"), src)

    def tick(): Unit = {
      val q = graft.streaming.VersionedSink.start(
        spark.readStream.format("graft-table").load(src)
          .where(col("k") % 2 === 0).select("k"),
        dst, "mv", ckpt)
      q.awaitTermination(60000)
    }
    tick()
    def dstRows: Seq[Int] =
      VersionedTable.read(spark, dst).select("k").as[Int].collect().toSeq.sorted
    assert(dstRows === Seq(2, 4))
    // idle tick: no new source commits -> no duplicate rows
    tick()
    assert(dstRows === Seq(2, 4))
    // incremental tick ships only the new commit's rows
    VersionedTable.append(spark, Seq(5, 6).toDF("k"), src)
    tick()
    assert(dstRows === Seq(2, 4, 6))
  }

  test("maxVersionsPerTrigger bounds each micro-batch during a drain") {
    val t = Files.createTempDirectory("gts_rate").toString + "/t"
    val ckpt = Files.createTempDirectory("gts_rate_ckpt").toString
    VersionedTable.append(spark, Seq(1).toDF("k"), t)
    VersionedTable.append(spark, Seq(2).toDF("k"), t)
    VersionedTable.append(spark, Seq(3).toDF("k"), t)
    val batches = new scala.collection.mutable.ArrayBuffer[Set[Int]]
    val q = spark.readStream.format("graft-table")
      .option("maxVersionsPerTrigger", "1").load(t)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset
          [org.apache.spark.sql.Row], _: Long) =>
        batches.synchronized {
          batches += batch.select("k").as[Int].collect().toSet
        }; ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(batches.synchronized(batches.toSeq) ===
      Seq(Set(1), Set(2), Set(3)),
      "a drain must proceed one version per batch")
  }

  test("SQL path-based table and broadcast-sized stats") {
    val t = Files.createTempDirectory("gts_sql").toString + "/t"
    VersionedTable.append(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    // catalog table over the datasource: the SQL surface (direct
    // `graft-table`.`path` queries are reserved for built-in file
    // sources by ResolveSQLOnFile)
    spark.sql(s"CREATE TABLE graft_sql_t USING `graft-table` LOCATION '$t'")
    try {
      val viaSql = spark.sql("SELECT k FROM graft_sql_t ORDER BY k")
      assert(viaSql.as[Int].collect().toSeq === Seq(1, 2))
    } finally spark.sql("DROP TABLE graft_sql_t")
    // manifest-derived sizeInBytes lets the tiny table broadcast
    val big = spark.range(100000).toDF("k")
    val joined = big.join(
      spark.read.format("graft-table").load(t).select(col("k"), col("v")),
      "k")
    assert(joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      joined.queryExecution.executedPlan.toString.linesIterator
        .take(5).mkString("\n"))
  }

  test("batch writes: df.write append/overwrite and SQL INSERT INTO") {
    val t = Files.createTempDirectory("gts_w").toString + "/t"
    VersionedTable.append(spark, Seq((1, "a")).toDF("k", "v"), t)
    // DataFrameWriter append = one atomic manifest commit
    Seq((2, "b")).toDF("k", "v").write.format("graft-table")
      .mode("append").save(t)
    assert(VersionedTable.read(spark, t).select("k").as[Int]
      .collect().sorted.toSeq === Seq(1, 2))
    // SQL INSERT INTO through the catalog table
    spark.sql(s"CREATE TABLE graft_w_t USING `graft-table` LOCATION '$t'")
    try {
      spark.sql("INSERT INTO graft_w_t VALUES (3, 'c')")
      assert(VersionedTable.read(spark, t).select("k").as[Int]
        .collect().sorted.toSeq === Seq(1, 2, 3))
    } finally spark.sql("DROP TABLE graft_w_t")
    // overwrite = snapshot replacement, old versions still travelable
    Seq((9, "z")).toDF("k", "v").write.format("graft-table")
      .mode("overwrite").save(t)
    assert(VersionedTable.read(spark, t).select("k").as[Int]
      .collect().toSeq === Seq(9))
    assert(VersionedTable.read(spark, t, 2L).count() === 2L)
  }

  test("SQL DELETE FROM runs the copy-on-write delete") {
    val t = Files.createTempDirectory("gts_del").toString + "/t"
    VersionedTable.append(spark,
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), t)
    spark.sql(s"CREATE TABLE graft_del_t USING `graft-table` LOCATION '$t'")
    try {
      spark.sql("DELETE FROM graft_del_t WHERE k = 2 OR v = 'c'")
      assert(VersionedTable.read(spark, t).select("k").as[Int]
        .collect().toSeq === Seq(1))
      // the delete is a first-class versioned commit: time travel intact
      assert(VersionedTable.read(spark, t, 1L).count() === 3L)
    } finally spark.sql("DROP TABLE graft_del_t")
  }

  test("SQL UPDATE and MERGE INTO run as atomic row-level rewrites") {
    val t = Files.createTempDirectory("gts_rlo").toString + "/t"
    VersionedTable.append(spark,
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), t)
    spark.sql(s"CREATE TABLE graft_rlo_t USING `graft-table` LOCATION '$t'")
    try {
      spark.sql("UPDATE graft_rlo_t SET v = concat(v, '!') WHERE k >= 2")
      def state: Map[Int, String] = VersionedTable.read(spark, t)
        .as[(Int, String)].collect().toMap
      assert(state === Map(1 -> "a", 2 -> "b!", 3 -> "c!"))
      assert(VersionedTable.versions(spark, t).size === 2,
        "the UPDATE must be one atomic commit")
      spark.sql(
        """MERGE INTO graft_rlo_t t
          |USING (SELECT * FROM VALUES (2, 'B2'), (9, 'ins') AS s(k, v)) s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
      assert(state === Map(1 -> "a", 2 -> "B2", 3 -> "c!", 9 -> "ins"))
      // both DML commits time-travel like any other
      assert(VersionedTable.read(spark, t, 1L)
        .as[(Int, String)].collect().toMap ===
        Map(1 -> "a", 2 -> "b", 3 -> "c"))
    } finally spark.sql("DROP TABLE graft_rlo_t")
  }

  test("MERGE prunes untouched files via runtime group filtering") {
    val t = Files.createTempDirectory("gts_mergeprune").toString + "/t"
    VersionedTable.append(spark,
      (1 to 10).map(i => (i, "lo")).toDF("k", "v").coalesce(1), t)
    VersionedTable.append(spark,
      (100 to 110).map(i => (i, "hi")).toDF("k", "v").coalesce(1), t)
    val before = VersionedTable.latest(spark, t)._2
    spark.sql(s"CREATE TABLE graft_mp_t USING `graft-table` LOCATION '$t'")
    try {
      // MERGE's join condition cannot be footer-checked statically —
      // the dynamic _file subquery over the source keys is what prunes
      spark.sql(
        """MERGE INTO graft_mp_t t
          |USING (SELECT * FROM VALUES (105, 'HI'), (200, 'new') AS s(k, v)) s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
      val after = VersionedTable.latest(spark, t)._2
      assert(before.count(after.contains) === 1,
        s"lo-range file must survive the merge untouched: $before -> $after")
      val got = VersionedTable.read(spark, t).as[(Int, String)]
        .collect().toMap
      assert(got === ((1 to 10).map(i => i -> "lo") ++
        (100 to 110).map(i => i -> (if (i == 105) "HI" else "hi")) ++
        Seq(200 -> "new")).toMap)
    } finally spark.sql("DROP TABLE graft_mp_t")
  }

  test("DML can predicate on the _commit_version metadata column") {
    val t = Files.createTempDirectory("gts_vpred").toString + "/t"
    VersionedTable.append(spark, Seq((1, "v1")).toDF("k", "v"), t) // v1
    VersionedTable.append(spark, Seq((2, "v2")).toDF("k", "v"), t) // v2
    spark.sql(s"CREATE TABLE graft_vp_t USING `graft-table` LOCATION '$t'")
    try {
      // retag only the rows that arrived in commit 2
      spark.sql(
        "UPDATE graft_vp_t SET v = 'late' WHERE _commit_version = 2")
      assert(VersionedTable.read(spark, t).as[(Int, String)]
        .collect().toMap === Map(1 -> "v1", 2 -> "late"))
    } finally spark.sql("DROP TABLE graft_vp_t")
  }

  test("SQL UPDATE rewrites only footer-intersecting files") {
    val t = Files.createTempDirectory("gts_rlo_prune").toString + "/t"
    VersionedTable.append(spark,
      (1 to 10).map(i => (i, "lo")).toDF("k", "v").coalesce(1), t)
    VersionedTable.append(spark,
      (100 to 110).map(i => (i, "hi")).toDF("k", "v").coalesce(1), t)
    val before = VersionedTable.latest(spark, t)._2
    spark.sql(s"CREATE TABLE graft_prune_t USING `graft-table` LOCATION '$t'")
    try {
      spark.sql("UPDATE graft_prune_t SET v = 'HI' WHERE k >= 100")
      val after = VersionedTable.latest(spark, t)._2
      assert(before.count(after.contains) === 1,
        s"the lo-range file must carry over untouched: $before -> $after")
      val got = VersionedTable.read(spark, t).as[(Int, String)]
        .collect().toMap
      assert(got === ((1 to 10).map(i => i -> "lo") ++
        (100 to 110).map(i => i -> "HI")).toMap)
    } finally spark.sql("DROP TABLE graft_prune_t")
  }

  test("native streaming sink: writeStream into the table, exactly once") {
    val t = Files.createTempDirectory("gts_ws").toString + "/t"
    // the provider needs a schema for an empty table: seed one commit
    VersionedTable.append(spark, Seq(0).toDF("k"), t)
    val ckpt = Files.createTempDirectory("gts_ws_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    def run(): Unit = {
      val q = mem.toDF().toDF("k")
        .writeStream.format("graft-table")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(t)
      q.awaitTermination(60000)
    }
    mem.addData(1, 2)
    run()
    def ks: Seq[Int] = VersionedTable.read(spark, t)
      .as[Int].collect().sorted.toSeq
    assert(ks === Seq(0, 1, 2))
    // restart with more data: only the new batch lands; epochs are
    // recorded as txn watermarks on the table itself
    mem.addData(3)
    run()
    assert(ks === Seq(0, 1, 2, 3))
    val h = VersionedTable.history(spark, t).select("txns")
      .as[Map[String, Long]].collect().last
    assert(h.keys.exists(_.startsWith("stream-")), h)
    // the native sink's commits are ordinary appends to the changefeed
    assert(VersionedTable.readChanges(spark, t, 1).select("k")
      .as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
  }

  test("format-level streaming pipeline: table -> transform -> table") {
    // the capstone symmetry: BOTH ends are the format — no foreachBatch,
    // no custom code, just readStream/writeStream over two lake tables
    val src = Files.createTempDirectory("gts_pipe_src").toString + "/t"
    val dst = Files.createTempDirectory("gts_pipe_dst").toString + "/t"
    val ckpt = Files.createTempDirectory("gts_pipe_ckpt").toString
    VersionedTable.append(spark, Seq(1, 2, 3, 4).toDF("k"), src)
    VersionedTable.append(spark, Seq(0).toDF("k"), dst) // schema seed
    def tick(): Unit = {
      val q = spark.readStream.format("graft-table").load(src)
        .where(col("k") % 2 === 0)
        .writeStream.format("graft-table")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination(60000)
    }
    tick()
    def dstKs: Seq[Int] = VersionedTable.read(spark, dst)
      .as[Int].collect().sorted.toSeq
    assert(dstKs === Seq(0, 2, 4))
    // idle tick: no new source commits, no duplicates
    tick()
    assert(dstKs === Seq(0, 2, 4))
    // incremental: only the new commit flows
    VersionedTable.append(spark, Seq(5, 6).toDF("k"), src)
    tick()
    assert(dstKs === Seq(0, 2, 4, 6))
  }

  test("startingVersion skips history; offsets round-trip json") {
    val t = Files.createTempDirectory("gts_sv").toString + "/t"
    VersionedTable.append(spark, Seq(1).toDF("k"), t)
    VersionedTable.append(spark, Seq(2).toDF("k"), t)
    val ckpt = Files.createTempDirectory("gts_sv_ckpt").toString
    val got = new scala.collection.mutable.ArrayBuffer[Int]
    val q = spark.readStream.format("graft-table")
      .option("startingVersion", "1").load(t)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset
          [org.apache.spark.sql.Row], _: Long) =>
        got.synchronized { got ++= batch.select("k").as[Int].collect() }; ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(got.synchronized(got.toSeq) === Seq(2))
    val off = graft.sources.VersionOffset(7L)
    assert(graft.sources.VersionOffset.fromJson(off.json()) === off)
  }
}
