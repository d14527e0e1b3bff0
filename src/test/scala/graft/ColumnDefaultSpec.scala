package graft

import java.nio.file.Files

import graft.sources.{GraftCatalog, VersionedTable}

/** Column DEFAULT values through the DSv2 catalog: CREATE ... DEFAULT,
  * INSERT filling omitted columns, the DEFAULT keyword, ALTER ADD COLUMN
  * DEFAULT with exists-default read-back for pre-column files, and
  * SET/DROP DEFAULT affecting future inserts only.
  */
class ColumnDefaultSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_def_wh").toString
    spark.conf.set("spark.sql.catalog.gdef",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdef.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdef.ns")
    dir
  }

  private def sql(q: String) = spark.sql(q)

  test("CREATE TABLE with DEFAULT: omitted columns and the DEFAULT " +
      "keyword fill from the declared default") {
    wh
    sql("CREATE TABLE gdef.ns.t1 (k BIGINT, v STRING DEFAULT 'missing', " +
      "n INT DEFAULT 7)")
    sql("INSERT INTO gdef.ns.t1 (k) VALUES (1)")
    sql("INSERT INTO gdef.ns.t1 VALUES (2, 'x', DEFAULT)")
    sql("INSERT INTO gdef.ns.t1 (k, n) VALUES (3, 9)")
    val got = sql("SELECT * FROM gdef.ns.t1 ORDER BY k")
      .as[(Long, String, Int)].collect().toSeq
    assert(got === Seq((1L, "missing", 7), (2L, "x", 7), (3L, "missing", 9)))
  }

  test("ALTER TABLE ADD COLUMN DEFAULT: pre-column rows read the " +
      "exists default, not null; new inserts take the current default") {
    wh
    sql("CREATE TABLE gdef.ns.t2 (k BIGINT)")
    sql("INSERT INTO gdef.ns.t2 VALUES (1), (2)") // files WITHOUT the column
    sql("ALTER TABLE gdef.ns.t2 ADD COLUMN score INT DEFAULT 42")
    // the old parquet files lack `score` entirely; the scan must fill the
    // exists default — a null here would be the schema-evolution default,
    // which DEFAULT-carrying columns override
    val old = sql("SELECT k, score FROM gdef.ns.t2 ORDER BY k")
      .as[(Long, Int)].collect().toSeq
    assert(old === Seq(1L -> 42, 2L -> 42),
      "pre-column files must read back the exists default")
    sql("INSERT INTO gdef.ns.t2 (k) VALUES (3)")
    sql("INSERT INTO gdef.ns.t2 VALUES (4, NULL)") // explicit null stays null
    val all = sql("SELECT k, score FROM gdef.ns.t2 ORDER BY k")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSeq
    assert(all === Seq(1L -> Some(42), 2L -> Some(42), 3L -> Some(42),
      4L -> None))
  }

  test("SET / DROP DEFAULT: future inserts change, exists default and " +
      "old rows do not") {
    wh
    sql("CREATE TABLE gdef.ns.t3 (k BIGINT)")
    sql("INSERT INTO gdef.ns.t3 VALUES (1)")
    sql("ALTER TABLE gdef.ns.t3 ADD COLUMN tag STRING DEFAULT 'born'")
    sql("ALTER TABLE gdef.ns.t3 ALTER COLUMN tag SET DEFAULT 'later'")
    sql("INSERT INTO gdef.ns.t3 (k) VALUES (2)")
    sql("ALTER TABLE gdef.ns.t3 ALTER COLUMN tag DROP DEFAULT")
    sql("INSERT INTO gdef.ns.t3 (k) VALUES (3)")
    val got = sql("SELECT k, tag FROM gdef.ns.t3 ORDER BY k")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toSeq
    // row 1 predates the column -> exists default 'born' (SET DEFAULT
    // later must NOT rewrite history); row 2 under 'later'; row 3 after
    // DROP -> null
    assert(got === Seq(1L -> Some("born"), 2L -> Some("later"), 3L -> None))
  }

  test("invalid defaults fail the DDL, not the insert") {
    wh
    // non-constant: references a column
    intercept[Exception] {
      sql("CREATE TABLE gdef.ns.bad1 (k BIGINT, v BIGINT DEFAULT k + 1)")
    }
    // does not parse
    intercept[Exception] {
      sql("CREATE TABLE gdef.ns.bad2 (k BIGINT, v INT DEFAULT )")
    }
    // half-created tables must not survive a failed CREATE
    assert(!sql("SHOW TABLES IN gdef.ns").collect()
      .map(_.getString(1)).toSet.exists(_.startsWith("bad")))
  }

  test("defaults survive the manifest round trip (metadata on the " +
      "declared schema line)") {
    wh
    sql("CREATE TABLE gdef.ns.t4 (k BIGINT, v STRING DEFAULT 'd')")
    val schema = VersionedTable.tableSchema(spark, s"$wh/ns/t4")
      .getOrElse(fail("no declared schema"))
    val f = schema("v")
    assert(f.metadata.getString(VersionedTable.CurrentDefaultKey) === "'d'")
    assert(f.metadata.contains(VersionedTable.ExistsDefaultKey))
  }
}
