package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{GraftCatalog, VersionedTable}

/** CHECK constraints (`graft.constraint.<name>` table properties, Delta
  * `delta.constraints.*` semantics): ADD-time validation over the
  * current (delete-aware) snapshot, inline write-time enforcement on
  * every data-file write with SQL three-valued logic (NULL passes),
  * and rename/drop protection for referenced columns.
  */
class ConstraintSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("constraint").toString + "/t"

  private def chain(t: Throwable): String = {
    var cur = t; val sb = new StringBuilder
    while (cur != null) { sb.append(cur.getMessage).append(' '); cur = cur.getCause }
    sb.toString
  }

  private val kq = StructType(Seq(
    StructField("k", LongType), StructField("q", LongType)))

  test("writes enforce the constraint: valid rows land, a violating " +
      "batch throws with the constraint name and commits nothing") {
    val t = tmp()
    VersionedTable.create(spark, t, kq)
    VersionedTable.alterProperties(spark, t,
      Map("graft.constraint.q_pos" -> "q > 0"))
    VersionedTable.append(spark, Seq((1L, 5L), (2L, 7L)).toDF("k", "q"), t)
    assert(VersionedTable.read(spark, t).count() === 2L)
    val e = intercept[Exception] {
      VersionedTable.append(spark, Seq((3L, 9L), (4L, -1L)).toDF("k", "q"), t)
    }
    assert(chain(e).contains("q_pos"), s"wanted constraint name in: ${chain(e)}")
    assert(VersionedTable.read(spark, t).count() === 2L,
      "failed append must not commit")
  }

  test("three-valued CHECK: NULL passes, only FALSE violates") {
    val t = tmp()
    VersionedTable.create(spark, t, kq)
    VersionedTable.alterProperties(spark, t,
      Map("graft.constraint.q_pos" -> "q > 0"))
    VersionedTable.append(spark,
      Seq((1L, Some(5L)), (2L, None)).toDF("k", "q"), t)
    assert(VersionedTable.read(spark, t).count() === 2L)
  }

  test("ADD-time validation: violating existing rows refuse the " +
      "property; rows dead under a MoR delete layer do not count") {
    val t = tmp()
    VersionedTable.create(spark, t, kq)
    VersionedTable.append(spark, Seq((1L, 5L), (2L, -3L)).toDF("k", "q"), t)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.alterProperties(spark, t,
        Map("graft.constraint.q_pos" -> "q > 0"))
    }
    assert(e.getMessage.contains("existing rows violate"))
    assert(!VersionedTable.tableProperties(spark, t)
      .contains("graft.constraint.q_pos"))
    // kill the violating row with a merge-on-read delete (no rewrite) —
    // the ADD-time scan must read the delete-aware snapshot
    VersionedTable.deleteByKeys(spark, t, Seq(2L).toDF("k"))
    VersionedTable.alterProperties(spark, t,
      Map("graft.constraint.q_pos" -> "q > 0"))
    assert(VersionedTable.tableProperties(spark, t)
      .contains("graft.constraint.q_pos"))
  }

  test("malformed constraints fail the DDL: unresolvable, non-boolean, " +
      "non-deterministic, aggregate") {
    val t = tmp()
    VersionedTable.create(spark, t, kq)
    def refuse(sql: String, want: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        VersionedTable.alterProperties(spark, t,
          Map("graft.constraint.bad" -> sql))
      }
      assert(e.getMessage.contains(want),
        s"for '$sql' wanted '$want' in: ${e.getMessage}")
    }
    refuse("nope > 0", "does not analyze")
    refuse("q + 1", "must be BOOLEAN")
    refuse("rand() < 0.5", "non-deterministic")
    refuse("sum(q) > 0", "aggregates")
  }

  test("row-level ops enforce too: UPDATE into a violating state throws, " +
      "valid UPDATE and DELETE pass") {
    val t = tmp()
    VersionedTable.create(spark, t, kq)
    VersionedTable.alterProperties(spark, t,
      Map("graft.constraint.q_pos" -> "q > 0"))
    VersionedTable.append(spark, Seq((1L, 5L), (2L, 7L)).toDF("k", "q"), t)
    val e = intercept[Exception] {
      VersionedTable.update(spark, t, col("k") === 1L,
        Map("q" -> lit(-9L)))
    }
    assert(chain(e).contains("q_pos"))
    assert(VersionedTable.read(spark, t).where(col("q") < 0).isEmpty)
    VersionedTable.update(spark, t, col("k") === 1L, Map("q" -> lit(6L)))
    VersionedTable.delete(spark, t, col("k") === 2L)
    assert(VersionedTable.read(spark, t).as[(Long, Long)].collect()
      .toSet === Set((1L, 6L)))
  }

  test("rename/drop of a referenced column is refused until the " +
      "constraint is dropped; unreferenced columns evolve freely") {
    val t = tmp()
    VersionedTable.create(spark, t, kq)
    VersionedTable.append(spark, Seq((1L, 5L)).toDF("k", "q"), t)
    VersionedTable.alterProperties(spark, t,
      Map("graft.constraint.q_pos" -> "q > 0"))
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, t, "q", "qty")
    }
    assert(e1.getMessage.contains("q_pos"))
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, t, "q")
    }
    assert(e2.getMessage.contains("q_pos"))
    VersionedTable.renameColumn(spark, t, "k", "id") // unreferenced: fine
    VersionedTable.alterProperties(spark, t, Map.empty[String, String],
      unset = Seq("graft.constraint.q_pos"))
    VersionedTable.renameColumn(spark, t, "q", "qty")
    assert(VersionedTable.read(spark, t).columns.toSeq === Seq("id", "qty"))
  }

  test("declared NOT NULL columns are enforced as invariants on the " +
      "API write path, value-level") {
    val t = tmp()
    VersionedTable.create(spark, t, StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("q", LongType))))
    // the incoming frame CLAIMS nullable — enforcement is on values
    VersionedTable.append(spark,
      Seq((Some(1L), Some(5L)), (Some(2L), None)).toDF("k", "q"), t)
    assert(VersionedTable.read(spark, t).count() === 2L)
    val e = intercept[Exception] {
      VersionedTable.append(spark,
        Seq((Some(3L), Some(1L)), (None, Some(2L))).toDF("k", "q"), t)
    }
    assert(chain(e).contains("not-null:k"), chain(e))
    assert(VersionedTable.read(spark, t).count() === 2L)
  }

  test("SQL surface: TBLPROPERTIES at CREATE and ALTER enforce on " +
      "INSERT through the catalog") {
    val wh = Files.createTempDirectory("constraintcat").toString
    spark.conf.set("spark.sql.catalog.ck", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ck.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ck.ns")
    spark.sql("CREATE TABLE ck.ns.t (k BIGINT, q BIGINT) " +
      "TBLPROPERTIES('graft.constraint.q_pos' = 'q > 0')")
    spark.sql("INSERT INTO ck.ns.t VALUES (1, 5)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO ck.ns.t VALUES (2, -1)")
    }
    assert(chain(e).contains("q_pos"))
    assert(spark.table("ck.ns.t").count() === 1L)
    // a second constraint via ALTER; both now enforce
    spark.sql("ALTER TABLE ck.ns.t SET TBLPROPERTIES(" +
      "'graft.constraint.k_small' = 'k < 100')")
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO ck.ns.t VALUES (200, 5)")
    }
    assert(chain(e2).contains("k_small"))
    // CREATE-time validation failure must not leave a half-created table
    val e3 = intercept[Exception] {
      spark.sql("CREATE TABLE ck.ns.bad (k BIGINT) " +
        "TBLPROPERTIES('graft.constraint.b' = 'nope > 0')")
    }
    assert(chain(e3).contains("does not analyze"))
    assert(!spark.catalog.tableExists("ck.ns.bad"))
  }

  test("standard SQL constraint DDL: CREATE TABLE ... CHECK, ALTER " +
      "TABLE ADD/DROP CONSTRAINT") {
    val wh = Files.createTempDirectory("constraintddl").toString
    spark.conf.set("spark.sql.catalog.cd", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cd.ns")
    spark.sql("CREATE TABLE cd.ns.t (k BIGINT, q BIGINT, " +
      "CONSTRAINT q_pos CHECK (q > 0))")
    assert(VersionedTable.tableProperties(spark, s"$wh/ns/t")
      .get("graft.constraint.q_pos").exists(_.contains("q > 0")))
    spark.sql("INSERT INTO cd.ns.t VALUES (1, 5)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO cd.ns.t VALUES (2, -1)")
    }
    assert(chain(e).contains("q_pos"), chain(e))
    assert(spark.table("cd.ns.t").count() === 1L)
    // ADD CONSTRAINT validates against existing rows through the same
    // property path
    spark.sql("ALTER TABLE cd.ns.t ADD CONSTRAINT k_small CHECK (k < 100)")
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO cd.ns.t VALUES (200, 5)")
    }
    assert(chain(e2).contains("k_small"))
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE cd.ns.t ADD CONSTRAINT q_neg CHECK (q < 0)")
    }
    // Spark's own DSv2 pre-validation scan (NEW_CHECK_CONSTRAINT_
    // VIOLATION) fires before our property-path scan — either refusal
    // is the required behavior
    assert(chain(e3).contains("existing rows violate") ||
      chain(e3).contains("CHECK_CONSTRAINT_VIOLATION"), chain(e3))
    assert(!VersionedTable.tableProperties(spark, s"$wh/ns/t")
      .contains("graft.constraint.q_neg"))
    // DROP releases enforcement; IF EXISTS tolerates absence
    spark.sql("ALTER TABLE cd.ns.t DROP CONSTRAINT k_small")
    spark.sql("INSERT INTO cd.ns.t VALUES (200, 5)")
    assert(spark.table("cd.ns.t").count() === 2L)
    spark.sql("ALTER TABLE cd.ns.t DROP CONSTRAINT IF EXISTS nope")
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE cd.ns.t DROP CONSTRAINT nope")
    }
    assert(chain(e4).contains("nope"))
  }
}
