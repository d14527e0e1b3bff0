package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{GraftCatalog, VersionedTable}

/** The SQL catalog over versioned lake tables: CREATE/CTAS/ALTER/DROP/
  * RENAME/SHOW through `graft_cat.ns.table` identifiers, atomic CTAS,
  * time travel, and DML routed through the manifest protocol.
  */
class GraftCatalogSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_cat_wh").toString
    spark.conf.set("spark.sql.catalog.gcat",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.warehouse", dir)
    dir
  }

  private def sql(q: String) = spark.sql(q)

  test("namespace + create + insert + select round trip") {
    wh
    sql("CREATE NAMESPACE gcat.bronze")
    sql("CREATE TABLE gcat.bronze.events (k BIGINT, v STRING)")
    sql("INSERT INTO gcat.bronze.events VALUES (1, 'a'), (2, 'b')")
    assert(sql("SELECT * FROM gcat.bronze.events ORDER BY k")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b")))
    // SHOW surfaces it; the second create refuses; IF NOT EXISTS no-ops
    assert(sql("SHOW TABLES IN gcat.bronze").collect()
      .map(_.getString(1)).toSet === Set("events"))
    intercept[Exception] { sql("CREATE TABLE gcat.bronze.events (x INT)") }
    sql("CREATE TABLE IF NOT EXISTS gcat.bronze.events (x INT)")
    // the physical table is a plain versioned lake table under the
    // warehouse — path API and catalog API see the same thing
    assert(VersionedTable.read(spark, s"$wh/bronze/events").count() === 2L)
  }

  test("atomic CTAS: data lands with the table; failed CTAS leaves nothing") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.ctas")
    sql("CREATE TABLE gcat.ctas.nums AS SELECT id AS n, id * 2 AS d " +
      "FROM range(5)")
    assert(sql("SELECT sum(n), sum(d) FROM gcat.ctas.nums")
      .as[(Long, Long)].head() === ((10L, 20L)))
    // the CTAS table carries a declared schema (commitStagedChanges)
    assert(VersionedTable.tableSchema(spark, s"$wh/ctas/nums")
      .map(_.fieldNames.toSeq) === Some(Seq("n", "d")))
    // a CTAS whose query throws must leave NO table and NO directory
    intercept[Exception] {
      sql("CREATE TABLE gcat.ctas.bad AS " +
        "SELECT raise_error('boom') FROM range(3)")
    }
    assert(!sql("SHOW TABLES IN gcat.ctas").collect()
      .map(_.getString(1)).contains("bad"))
    assert(!new java.io.File(s"$wh/ctas/bad").exists())
  }

  test("ALTER TABLE ADD COLUMNS: evolution through SQL, old rows null") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.evo")
    sql("CREATE TABLE gcat.evo.t (k BIGINT, v STRING)")
    sql("INSERT INTO gcat.evo.t VALUES (1, 'a')")
    sql("ALTER TABLE gcat.evo.t ADD COLUMNS (score DOUBLE)")
    sql("INSERT INTO gcat.evo.t VALUES (2, 'b', 0.9)")
    val rows = sql("SELECT k, score FROM gcat.evo.t ORDER BY k")
      .as[(Long, Option[Double])].collect().toSeq
    assert(rows === Seq((1L, None), (2L, Some(0.9))))
    // DESCRIBE shows the evolved schema
    val described = sql("DESCRIBE TABLE gcat.evo.t").collect()
      .map(_.getString(0)).toSeq
    assert(described.contains("score"))
  }

  test("ALTER TABLE RENAME/DROP COLUMN: field-id evolution through SQL") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.evo2")
    sql("CREATE TABLE gcat.evo2.t (k BIGINT, v STRING)")
    sql("INSERT INTO gcat.evo2.t VALUES (1, 'a'), (2, 'b')")
    sql("ALTER TABLE gcat.evo2.t RENAME COLUMN v TO label")
    // pre-rename files resolve by field id under the new name
    assert(sql("SELECT k, label FROM gcat.evo2.t ORDER BY k")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b")))
    sql("INSERT INTO gcat.evo2.t VALUES (3, 'c')")
    sql("ALTER TABLE gcat.evo2.t DROP COLUMN label")
    assert(sql("SELECT * FROM gcat.evo2.t").schema.fieldNames.toSeq ===
      Seq("k"))
    // re-added name: fresh id, no resurrection of dropped data
    sql("ALTER TABLE gcat.evo2.t ADD COLUMNS (label STRING)")
    assert(sql("SELECT label FROM gcat.evo2.t WHERE label IS NOT NULL")
      .count() === 0L)
  }

  test("CREATE OR REPLACE TABLE: atomic data+schema flip, old versions " +
      "time-travelable, failed replace leaves the table intact") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.rep")
    sql("CREATE TABLE gcat.rep.t (k BIGINT, v STRING)")
    sql("INSERT INTO gcat.rep.t VALUES (1, 'a'), (2, 'b')")
    val vOld = VersionedTable.latest(spark, s"$wh/rep/t")._1
    // replace with a DIFFERENT schema
    sql("CREATE OR REPLACE TABLE gcat.rep.t AS SELECT id AS n FROM range(3)")
    assert(sql("SELECT * FROM gcat.rep.t").schema.fieldNames.toSeq ===
      Seq("n"))
    assert(sql("SELECT sum(n) FROM gcat.rep.t").as[Long].head() === 3L)
    // the old incarnation is still time-travelable under its own schema
    val old = sql(s"SELECT * FROM gcat.rep.t VERSION AS OF $vOld")
    assert(old.schema.fieldNames.toSeq === Seq("k", "v"))
    assert(old.count() === 2L)
    // a FAILED replace leaves the current table untouched
    intercept[Exception] {
      sql("CREATE OR REPLACE TABLE gcat.rep.t AS " +
        "SELECT raise_error('boom') AS x FROM range(3)")
    }
    assert(sql("SELECT * FROM gcat.rep.t").schema.fieldNames.toSeq ===
      Seq("n"))
    assert(sql("SELECT count(*) FROM gcat.rep.t").as[Long].head() === 3L)
    // plain REPLACE TABLE (no AS SELECT): empty table under new schema
    sql("REPLACE TABLE gcat.rep.t (x DOUBLE, y STRING)")
    assert(sql("SELECT * FROM gcat.rep.t").schema.fieldNames.toSeq ===
      Seq("x", "y"))
    assert(sql("SELECT count(*) FROM gcat.rep.t").as[Long].head() === 0L)
    // the replaced incarnation is renameable (fresh field ids)
    sql("ALTER TABLE gcat.rep.t RENAME COLUMN y TO label")
    assert(sql("SELECT * FROM gcat.rep.t").schema.fieldNames.toSeq ===
      Seq("x", "label"))
  }

  test("table properties: SET/UNSET TBLPROPERTIES persist in the " +
      "manifest and survive data commits") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.props")
    sql("CREATE TABLE gcat.props.t (k BIGINT)")
    sql("ALTER TABLE gcat.props.t SET TBLPROPERTIES " +
      "('owner.team' = 'data eng', 'retention.days' = '30')")
    assert(VersionedTable.tableProperties(spark, s"$wh/props/t") ===
      Map("owner.team" -> "data eng", "retention.days" -> "30"))
    // data commits carry properties forward; UNSET removes one
    sql("INSERT INTO gcat.props.t VALUES (1)")
    sql("ALTER TABLE gcat.props.t UNSET TBLPROPERTIES ('retention.days')")
    assert(VersionedTable.tableProperties(spark, s"$wh/props/t") ===
      Map("owner.team" -> "data eng"))
    // surfaced on the loaded table (SHOW TBLPROPERTIES / DESCRIBE)
    val shown = sql("SHOW TBLPROPERTIES gcat.props.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("owner.team") === Some("data eng"))
    assert(!shown.contains("retention.days"))
    // history records the property commits
    assert(VersionedTable.history(spark, s"$wh/props/t")
      .where(col("op") === "properties").count() === 2L)
  }

  test("time travel: SELECT ... VERSION AS OF, and writes to a pinned " +
      "snapshot refuse") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.tt")
    sql("CREATE TABLE gcat.tt.t (k BIGINT)")        // v1
    sql("INSERT INTO gcat.tt.t VALUES (1)")          // v2
    sql("INSERT INTO gcat.tt.t VALUES (2)")          // v3
    assert(sql("SELECT count(*) FROM gcat.tt.t VERSION AS OF 2")
      .as[Long].head() === 1L)
    assert(sql("SELECT count(*) FROM gcat.tt.t VERSION AS OF 3")
      .as[Long].head() === 2L)
    intercept[Exception] {
      sql("SELECT * FROM gcat.tt.t VERSION AS OF 99").collect()
    }
    // the reader-option spelling reaches the same snapshot
    assert(spark.read.format("graft-table").option("versionAsOf", "2")
      .load(s"$wh/tt/t").count() === 1L)
    // TIMESTAMP AS OF now = the latest snapshot; far past = no commit
    assert(sql("SELECT count(*) FROM gcat.tt.t TIMESTAMP AS OF " +
      "current_timestamp()").as[Long].head() === 2L)
    intercept[Exception] {
      sql("SELECT * FROM gcat.tt.t TIMESTAMP AS OF " +
        "TIMESTAMP '1999-01-01 00:00:00'").collect()
    }
  }

  test("DML through the catalog: UPDATE / DELETE / MERGE INTO") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.dml")
    sql("CREATE TABLE gcat.dml.t (k BIGINT, v STRING)")
    sql("INSERT INTO gcat.dml.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sql("UPDATE gcat.dml.t SET v = 'B' WHERE k = 2")
    sql("DELETE FROM gcat.dml.t WHERE k = 3")
    Seq((1L, "A"), (4L, "d")).toDF("k", "v").createOrReplaceTempView("dml_src")
    sql("""MERGE INTO gcat.dml.t t USING dml_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(sql("SELECT * FROM gcat.dml.t ORDER BY k")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "A"), (2L, "B"), (4L, "d")))
    // INSERT OVERWRITE = atomic snapshot flip
    sql("INSERT OVERWRITE gcat.dml.t VALUES (9, 'z')")
    assert(sql("SELECT * FROM gcat.dml.t").as[(Long, String)]
      .collect().toSeq === Seq((9L, "z")))
  }

  test("rename and drop; identifier safety") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.adm")
    sql("CREATE TABLE gcat.adm.t1 (k BIGINT)")
    sql("INSERT INTO gcat.adm.t1 VALUES (7)")
    // the RENAME TO target is catalog-relative (no catalog qualifier)
    sql("ALTER TABLE gcat.adm.t1 RENAME TO adm.t2")
    assert(sql("SELECT k FROM gcat.adm.t2").as[Long].head() === 7L)
    assert(sql("SHOW TABLES IN gcat.adm").collect()
      .map(_.getString(1)).toSet === Set("t2"))
    sql("DROP TABLE gcat.adm.t2")
    assert(sql("SHOW TABLES IN gcat.adm").collect().isEmpty)
    // traversal-shaped identifiers never resolve to paths outside the
    // warehouse (quoted to survive the SQL parser)
    intercept[Exception] { sql("CREATE TABLE gcat.adm.`..` (k INT)") }
    intercept[Exception] { sql("CREATE TABLE gcat.adm.`a/b` (k INT)") }
    // dropping a namespace with tables needs CASCADE
    sql("CREATE TABLE gcat.adm.keep (k INT)")
    intercept[Exception] { sql("DROP NAMESPACE gcat.adm") }
    sql("DROP NAMESPACE gcat.adm CASCADE")
    assert(!new java.io.File(s"$wh/adm").exists())
  }

  test("catalog-level streaming: readStream.table -> writeStream.toTable, " +
      "exactly-once") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.stt")
    sql("CREATE TABLE gcat.stt.src (k BIGINT)")
    sql("CREATE TABLE gcat.stt.dst (k BIGINT)")
    sql("INSERT INTO gcat.stt.src VALUES (1), (2), (3)")
    val ck = Files.createTempDirectory("gcat_stt").toString
    def drain(): Unit = {
      val q = spark.readStream.table("gcat.stt.src")
        .writeStream
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("gcat.stt.dst")
      q.awaitTermination(60000)
    }
    drain()
    assert(sql("SELECT k FROM gcat.stt.dst ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L))
    // an idle restart ships nothing; an increment ships exactly itself
    drain()
    assert(sql("SELECT count(*) FROM gcat.stt.dst").as[Long].head() === 3L)
    sql("INSERT INTO gcat.stt.src VALUES (4)")
    drain()
    assert(sql("SELECT k FROM gcat.stt.dst ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("catalog streams: readStream/writeStream against catalog table paths") {
    wh
    // the catalog names the same dirs the format-level stream APIs use —
    // a catalog table doubles as a streaming source/sink by path
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.st")
    sql("CREATE TABLE gcat.st.src (k BIGINT)")
    sql("INSERT INTO gcat.st.src VALUES (1), (2)")
    val out = Files.createTempDirectory("gcat_stream").toString
    val q = spark.readStream.format("graft-table").load(s"$wh/st/src")
      .writeStream.format("graft-table")
      .option("checkpointLocation", s"$out/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(s"$out/dst")
    q.awaitTermination(60000)
    assert(VersionedTable.read(spark, s"$out/dst").count() === 2L)
  }
}
