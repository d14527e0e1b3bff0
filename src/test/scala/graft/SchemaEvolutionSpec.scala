package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.VersionedTable

/** Column-append schema evolution on the versioned lake: declared
  * schemas in the manifest, empty CREATE, ALTER-style addColumns,
  * null-filled reads of pre-evolution files, write-side alignment, and
  * schema-aware time travel / changefeed / rewrites.
  */
class SchemaEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("sevo").toString + "/t"

  test("create declares a schema; empty reads and DSv2 scans are typed") {
    val t = tmp()
    val sc = StructType(Seq(
      StructField("k", IntegerType), StructField("v", StringType)))
    assert(VersionedTable.create(spark, t, sc) === 1L)
    val df = VersionedTable.read(spark, t)
    assert(df.schema.fieldNames.toSeq === Seq("k", "v"))
    assert(df.count() === 0L)
    // the DSv2 table serves the declared schema with zero data files
    val v2 = spark.read.format("graft-table").load(t)
    assert(v2.schema.fieldNames.toSeq === Seq("k", "v"))
    assert(v2.count() === 0L)
    // a second create refuses; ifNotExists is a no-op
    intercept[IllegalStateException] { VersionedTable.create(spark, t, sc) }
    assert(VersionedTable.create(spark, t, sc, ifNotExists = true) === 1L)
  }

  test("addColumns: old files read the new column as null; time travel " +
      "keeps the old schema") {
    val t = tmp()
    val sc = StructType(Seq(
      StructField("k", IntegerType), StructField("v", StringType)))
    VersionedTable.create(spark, t, sc)
    val v1 = VersionedTable.append(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    val vEvo = VersionedTable.addColumns(spark, t,
      Seq(StructField("score", DoubleType)))
    // metadata-only commit: no data files moved
    val hist = VersionedTable.history(spark, t)
      .where(col("version") === vEvo).head()
    assert(hist.getAs[String]("op") === "schema")
    assert(hist.getAs[Int]("files_added") === 0)
    assert(hist.getAs[Int]("files_removed") === 0)
    // old rows surface the column as null
    val now = VersionedTable.read(spark, t)
    assert(now.schema.fieldNames.toSeq === Seq("k", "v", "score"))
    assert(now.where(col("score").isNull).count() === 2L)
    // new writes fill it; old file still null
    VersionedTable.append(spark, Seq((3, "c", 0.5)).toDF("k", "v", "score"), t)
    val all = VersionedTable.read(spark, t).orderBy("k")
      .collect().map(r => (r.getInt(0), r.isNullAt(2)))
    assert(all.toSeq === Seq((1, true), (2, true), (3, false)))
    // time travel to before the evolution reads the OLD schema
    assert(VersionedTable.read(spark, t, v1).schema.fieldNames.toSeq ===
      Seq("k", "v"))
    // duplicate / non-nullable additions refuse
    intercept[IllegalArgumentException] {
      VersionedTable.addColumns(spark, t, Seq(StructField("K", LongType)))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.addColumns(spark, t,
        Seq(StructField("n", LongType, nullable = false)))
    }
  }

  test("renameColumn: old files resolve by field id under the new name; " +
      "time travel keeps per-snapshot names; writes align; DSv2 agrees") {
    val t = tmp()
    VersionedTable.create(spark, t, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    val vData = VersionedTable.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    VersionedTable.renameColumn(spark, t, "v", "label")
    // the physical column is still named "v" in the data file — the id
    // carried in the declared schema resolves it under the new name
    val now = VersionedTable.read(spark, t).orderBy("k")
    assert(now.schema.fieldNames.toSeq === Seq("k", "label"))
    assert(now.as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b")))
    // time travel: the pre-rename snapshot reads under its own names
    val old = VersionedTable.read(spark, t, vData)
    assert(old.schema.fieldNames.toSeq === Seq("k", "v"))
    assert(old.orderBy("k").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b")))
    // writes against the renamed schema align by the NEW name
    VersionedTable.append(spark, Seq((3L, "c")).toDF("k", "label"), t)
    assert(VersionedTable.read(spark, t).orderBy("k")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the DSv2 scan resolves ids the same way — pre- and post-rename
    // files in one scan, no nulls
    val v2 = spark.read.format("graft-table").load(t).orderBy("k")
    assert(v2.schema.fieldNames.toSeq === Seq("k", "label"))
    assert(v2.as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // refusals: collision and missing source
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, t, "label", "K")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, t, "nope", "x")
    }
  }

  test("dropColumn narrows reads; a re-added same-named column gets a " +
      "fresh id — dropped data never resurrects") {
    val t = tmp()
    VersionedTable.create(spark, t, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("score", DoubleType))))
    val vData = VersionedTable.append(spark,
      Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("k", "v", "score"), t)
    VersionedTable.dropColumn(spark, t, "score")
    val now = VersionedTable.read(spark, t)
    assert(now.schema.fieldNames.toSeq === Seq("k", "v"))
    // re-add the SAME name: new field id — the old physical column's
    // data must NOT surface under it
    VersionedTable.addColumns(spark, t, Seq(StructField("score", DoubleType)))
    val readd = VersionedTable.read(spark, t).orderBy("k")
      .select("k", "score").as[(Long, Option[Double])].collect().toSeq
    assert(readd === Seq((1L, None), (2L, None)))
    VersionedTable.append(spark,
      Seq((3L, "c", 9.9)).toDF("k", "v", "score"), t)
    assert(VersionedTable.read(spark, t).orderBy("k")
      .select("k", "score").as[(Long, Option[Double])].collect().toSeq ===
      Seq((1L, None), (2L, None), (3L, Some(9.9))))
    // time travel to before the drop still shows the original values
    assert(VersionedTable.read(spark, t, vData).orderBy("k")
      .select("score").as[Double].collect().toSeq === Seq(0.5, 1.5))
    // rename after the re-add keeps both generations straight
    VersionedTable.renameColumn(spark, t, "score", "quality")
    assert(VersionedTable.read(spark, t).orderBy("k")
      .select("quality").as[Option[Double]].collect().toSeq ===
      Seq(None, None, Some(9.9)))
  }

  test("rename/drop refuse on id-less files and on pending delete-layer " +
      "keys — materializeFieldIds/compact lift them") {
    val t = tmp()
    // legacy shape: first write declares no schema, files carry no ids
    VersionedTable.append(spark, Seq((1L, "a")).toDF("k", "v"), t)
    VersionedTable.declareSchema(spark, t,
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, t, "v", "label")
    }
    assert(e.getMessage.contains("materializeFieldIds"))
    // the one-commit upgrade: ids stamped on schema AND files together
    VersionedTable.materializeFieldIds(spark, t, numFiles = 1)
    VersionedTable.renameColumn(spark, t, "v", "label")
    assert(VersionedTable.read(spark, t).orderBy("k")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a")))
    // pending equality layer keyed on a column blocks its rename
    val t2 = tmp()
    VersionedTable.create(spark, t2, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    VersionedTable.append(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t2)
    VersionedTable.deleteByKeys(spark, t2, Seq(2L).toDF("k"))
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, t2, "k", "id")
    }
    assert(e2.getMessage.contains("delete layer"))
    VersionedTable.compact(spark, t2, numFiles = 1)
    VersionedTable.renameColumn(spark, t2, "k", "id")
    assert(VersionedTable.read(spark, t2).schema.fieldNames.toSeq ===
      Seq("id", "v"))
  }

  test("write alignment: order/case-insensitive by name, missing nullable " +
      "columns null-fill, lossless upcasts, extras refused unless evolving") {
    val t = tmp()
    VersionedTable.create(spark, t, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("score", DoubleType))))
    // reordered + case-mixed + missing 'score' + int k (upcast to long)
    VersionedTable.append(spark, Seq(("a", 1)).toDF("V", "k"), t)
    val r = VersionedTable.read(spark, t).head()
    assert(r.getLong(0) === 1L && r.getString(1) === "a" && r.isNullAt(2))
    // extra column refused without the flag...
    intercept[IllegalArgumentException] {
      VersionedTable.append(spark,
        Seq((2L, "b", 0.1, "en")).toDF("k", "v", "score", "lang"), t)
    }
    // ...and widens the schema with it
    VersionedTable.append(spark,
      Seq((2L, "b", 0.1, "en")).toDF("k", "v", "score", "lang"), t,
      evolveSchema = true)
    val evolved = VersionedTable.read(spark, t)
    assert(evolved.schema.fieldNames.toSeq === Seq("k", "v", "score", "lang"))
    assert(evolved.where(col("lang") === "en").count() === 1L)
    assert(evolved.where(col("lang").isNull).count() === 1L)
    // lossy cast refused (double -> long would truncate)
    intercept[IllegalArgumentException] {
      VersionedTable.append(spark,
        Seq((1.5, "x")).toDF("k", "v"), t)
    }
  }

  test("rewrites after evolution materialize the evolved columns") {
    val t = tmp()
    VersionedTable.create(spark, t, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    VersionedTable.append(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    VersionedTable.addColumns(spark, t, Seq(StructField("tag", StringType)))
    // update sets the evolved column on a pre-evolution file
    VersionedTable.update(spark, t, col("k") === 1L,
      Map("tag" -> lit("hot")))
    val rows = VersionedTable.read(spark, t).orderBy("k")
      .select("k", "tag").as[(Long, Option[String])].collect().toSeq
    assert(rows === Seq((1L, Some("hot")), (2L, None)))
    // compaction rewrites carry the declared schema (and the column
    // survives physically: read the compacted file with NO declared
    // schema to prove it's in the parquet itself)
    VersionedTable.compact(spark, t, numFiles = 1)
    val (_, files) = VersionedTable.latest(spark, t)
    val physical = spark.read.parquet(files.map(n => s"$t/$n"): _*)
    assert(physical.schema.fieldNames.toSeq === Seq("k", "v", "tag"))
    // delete on the evolved column works over mixed-vintage files
    VersionedTable.append(spark, Seq((3L, "c", "cold")).toDF("k", "v", "tag"), t)
    VersionedTable.delete(spark, t, col("tag") === "cold")
    assert(VersionedTable.read(spark, t).count() === 2L)
  }

  test("changefeed spans an evolution: one consistent unioned schema, " +
      "old increments null-filled") {
    val t = tmp()
    VersionedTable.create(spark, t, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    VersionedTable.append(spark, Seq((1L, "a")).toDF("k", "v"), t)
    VersionedTable.addColumns(spark, t, Seq(StructField("s", DoubleType)))
    VersionedTable.append(spark, Seq((2L, "b", 0.7)).toDF("k", "v", "s"), t)
    val feed = VersionedTable.readChanges(spark, t, fromVersion = 1L)
    assert(feed.schema.fieldNames.toSeq ===
      Seq("k", "v", "s", "_commit_version"))
    val got = feed.orderBy("k")
      .select("k", "s").as[(Long, Option[Double])].collect().toSeq
    assert(got === Seq((1L, None), (2L, Some(0.7))))
  }

  test("upsert aligns updates to the declared schema") {
    val t = tmp()
    VersionedTable.create(spark, t, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("s", DoubleType))))
    VersionedTable.append(spark,
      Seq((1L, "a", 0.1), (2L, "b", 0.2)).toDF("k", "v", "s"), t)
    // updates frame omits 's' and reorders — alignment null-fills it
    VersionedTable.upsert(spark, Seq(("B", 2L)).toDF("v", "k"), t, key = "k")
    val rows = VersionedTable.read(spark, t).orderBy("k")
      .as[(Long, String, Option[Double])].collect().toSeq
    assert(rows === Seq((1L, "a", Some(0.1)), (2L, "B", None)))
  }

  test("concurrently evolving appends merge their columns (neither lost)") {
    val t = tmp()
    VersionedTable.create(spark, t, StructType(Seq(
      StructField("k", LongType))))
    VersionedTable.append(spark, Seq(Tuple1(0L)).toDF("k"), t)
    // two writers evolve with DIFFERENT new columns; whichever commits
    // second must merge, not clobber (the widen-per-retry path)
    VersionedTable.append(spark, Seq((1L, "x")).toDF("k", "c1"), t,
      evolveSchema = true)
    VersionedTable.append(spark, Seq((2L, 9L)).toDF("k", "c2"), t,
      evolveSchema = true)
    val sc = VersionedTable.tableSchema(spark, t).get
    assert(sc.fieldNames.toSeq === Seq("k", "c1", "c2"))
    val rows = VersionedTable.read(spark, t).orderBy("k")
      .as[(Long, Option[String], Option[Long])].collect().toSeq
    assert(rows === Seq((0L, None, None), (1L, Some("x"), None),
      (2L, None, Some(9L))))
  }

  test("nested field ids: rename/drop a struct member; old files " +
      "resolve by id; arrays of structs too") {
    val t = tmp()
    VersionedTable.create(spark, t, StructType(Seq(
      StructField("k", LongType),
      StructField("s", StructType(Seq(
        StructField("a", LongType), StructField("b", StringType)))),
      StructField("arr", ArrayType(StructType(Seq(
        StructField("x", LongType))))))))
    VersionedTable.append(spark,
      spark.range(2).selectExpr("id AS k",
        "named_struct('a', id * 10, 'b', concat('v', id)) AS s",
        "array(named_struct('x', id + 100)) AS arr"), t)
    // rename a struct member: metadata-only commit, old file resolves
    val vRen = VersionedTable.renameColumn(spark, t, "s.b", "label")
    val hist = VersionedTable.history(spark, t)
      .where(col("version") === vRen).head()
    assert(hist.getAs[Int]("files_added") === 0)
    val now = VersionedTable.read(spark, t).orderBy("k")
    assert(now.schema("s").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("a", "label"))
    assert(now.selectExpr("k", "s.a", "s.label")
      .as[(Long, Long, String)].collect().toSeq ===
      Seq((0L, 0L, "v0"), (1L, 10L, "v1")))
    // array-of-struct member rename resolves through the LIST level
    VersionedTable.renameColumn(spark, t, "arr.x", "y")
    assert(VersionedTable.read(spark, t).orderBy("k")
      .selectExpr("arr[0].y").as[Long].collect().toSeq ===
      Seq(100L, 101L))
    // writes against the renamed nested schema align by the NEW name
    VersionedTable.append(spark,
      spark.range(2, 3).selectExpr("id AS k",
        "named_struct('a', id * 10, 'label', concat('v', id)) AS s",
        "array(named_struct('y', id + 100)) AS arr"), t)
    assert(VersionedTable.read(spark, t).orderBy("k")
      .selectExpr("k", "s.label").as[(Long, String)].collect().toSeq ===
      Seq((0L, "v0"), (1L, "v1"), (2L, "v2")))
    // DSv2 scan agrees (pre- and post-rename files in one scan)
    assert(spark.read.format("graft-table").load(t).orderBy("k")
      .selectExpr("s.label").as[String].collect().toSeq ===
      Seq("v0", "v1", "v2"))
    // refusals: collision beside the leaf, missing path, non-struct
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, t, "s.a", "LABEL")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, t, "s.nope", "x")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, t, "k.inner", "x")
    }
    // drop a nested member narrows reads; sibling survives
    VersionedTable.dropColumn(spark, t, "s.a")
    val dropped = VersionedTable.read(spark, t)
    assert(dropped.schema("s").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("label"))
  }

  test("moveColumn FIRST/AFTER: metadata-only reorder, catalog SQL " +
      "surface, values follow their names") {
    val t = tmp()
    VersionedTable.create(spark, t, StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType))))
    VersionedTable.append(spark,
      Seq((1L, "x", 0.5)).toDF("a", "b", "c"), t)
    val vMove = VersionedTable.moveColumn(spark, t, "c",
      VersionedTable.ColumnPosition.First)
    assert(VersionedTable.history(spark, t)
      .where(col("version") === vMove).head()
      .getAs[Int]("files_added") === 0) // no rewrite
    val r = VersionedTable.read(spark, t)
    assert(r.columns.toSeq === Seq("c", "a", "b"))
    assert(r.as[(Double, Long, String)].head() === ((0.5, 1L, "x")))
    VersionedTable.moveColumn(spark, t, "c",
      VersionedTable.ColumnPosition.After("a"))
    assert(VersionedTable.read(spark, t).columns.toSeq ===
      Seq("a", "c", "b"))
    // moving to the position it already holds is a no-op commit-wise
    val vBefore = VersionedTable.latest(spark, t)._1
    assert(VersionedTable.moveColumn(spark, t, "c",
      VersionedTable.ColumnPosition.After("a")) === vBefore)
    // unknown sibling refuses
    intercept[IllegalArgumentException] {
      VersionedTable.moveColumn(spark, t, "c",
        VersionedTable.ColumnPosition.After("nope"))
    }
    // SQL surface through the catalog
    val wh = java.nio.file.Files.createTempDirectory("sevo_wh").toString
    spark.conf.set("spark.sql.catalog.gsevo",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsevo.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsevo.ns")
    spark.sql("CREATE TABLE gsevo.ns.m (x BIGINT, y STRING, z DOUBLE)")
    spark.sql("INSERT INTO gsevo.ns.m VALUES (1, 'a', 2.0)")
    spark.sql("ALTER TABLE gsevo.ns.m ALTER COLUMN z FIRST")
    assert(spark.table("gsevo.ns.m").columns.toSeq ===
      Seq("z", "x", "y"))
    spark.sql("ALTER TABLE gsevo.ns.m ALTER COLUMN z AFTER x")
    assert(spark.table("gsevo.ns.m").columns.toSeq ===
      Seq("x", "z", "y"))
    assert(spark.table("gsevo.ns.m").as[(Long, Double, String)]
      .head() === ((1L, 2.0, "a")))
    // nested rename via SQL too — note positional VALUES follow the
    // REORDERED schema (x, z, y, s), the point of FIRST/AFTER
    spark.sql("ALTER TABLE gsevo.ns.m ADD COLUMNS (s STRUCT<p: BIGINT>)")
    spark.sql("INSERT INTO gsevo.ns.m VALUES (2, 3.0, 'b', " +
      "named_struct('p', 7L))")
    spark.sql("ALTER TABLE gsevo.ns.m RENAME COLUMN s.p TO q")
    assert(spark.sql("SELECT s.q FROM gsevo.ns.m WHERE x = 2")
      .as[Long].head() === 7L)
    spark.sql("DROP TABLE gsevo.ns.m")
  }

  test("equality-delete resolution reads candidates by FIELD ID even in " +
      "a session that never enabled fieldId.read: renamed key columns " +
      "of pre-rename files must match, not null out") {
    val t = tmp()
    VersionedTable.create(spark, t, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    VersionedTable.append(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), t)
    // rename the KEY column: pre-rename files store it as "k" — only
    // field-id matching can resolve it under "id"
    VersionedTable.renameColumn(spark, t, "k", "id")
    // pending equality-delete layer keyed on the NEW name
    VersionedTable.deleteByKeys(spark, t, Seq(2L).toDF("id"))
    // simulate a FRESH session: the conf every other graft read path
    // sets is off, so resolveEqualityDeletes must set it itself
    val conf = "spark.sql.parquet.fieldId.read.enabled"
    val saved = spark.conf.get(conf, "false")
    try {
      spark.conf.set(conf, "false")
      // DSv2 scan resolves the pending layer to positions at plan time;
      // name-matching would read key=null and serve the deleted row
      val got = spark.read.format("graft-table").load(t).orderBy("id")
        .as[(Long, String)].collect().toSeq
      assert(got === Seq((1L, "a"), (3L, "c")))
      // the copy-on-write rewrite path shares the same resolution map
      spark.conf.set(conf, "false")
      VersionedTable.compact(spark, t, numFiles = 1)
      spark.conf.set(conf, "false")
      val after = spark.read.format("graft-table").load(t).orderBy("id")
        .as[(Long, String)].collect().toSeq
      assert(after === Seq((1L, "a"), (3L, "c")))
    } finally spark.conf.set(conf, saved)
  }
}
