package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Normalize

class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  test("renameAll snake_cases spaced mixed-case headers (P1)") {
    val df = Seq(("a", 1)).toDF("Interval Start", "Wind Speed")
    assert(Normalize.renameAll(df).columns.toSeq ===
      Seq("interval_start", "wind_speed"))
  }

  test("renameAll is a no-op on already-normalized names") {
    val df = Seq((1, 2)).toDF("zone", "wind_speed_10m")
    assert(Normalize.renameAll(df).columns.toSeq === Seq("zone", "wind_speed_10m"))
  }

  test("castColumns + dropNullRows removes unparseable rows (P3, §7.4.3)") {
    val dirty = Seq(
      ("2024-05-01 00:00:00", "42000.55"),
      ("not-a-date", "42000.55"),
      ("2024-05-01 01:00:00", "garbage"),
      ("2024-05-01 02:00:00", "51000.10")
    ).toDF("time", "load")
    val cast = Normalize.castColumns(dirty,
      Map("time" -> TimestampType, "load" -> DecimalType(10, 2)))
    assert(cast.schema("time").dataType === TimestampType)
    assert(cast.schema("load").dataType === DecimalType(10, 2))
    val clean = Normalize.dropNullRows(cast)
    assert(clean.count() === 2)
  }

  test("parseTimestamp handles zone-offset strings (F2) in UTC session") {
    val df = Seq("2024-05-01 00:15:00-05:00").toDF("d")
    val parsed = df.select(
      Normalize.parseTimestamp($"d", "yyyy-MM-dd HH:mm:ssXXX").as("ts"))
    assert(parsed.head.getTimestamp(0).toInstant.toString === "2024-05-01T05:15:00Z")
  }

  test("dedup collapses exact duplicates; idempotent reprocessing (P4)") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "v")
    assert(Normalize.dedup(df).count() === 2)
    assert(Normalize.dedup(df.unionAll(df)).count() === 2)
  }

  test("nullCensus counts nulls per column in one row (P5)") {
    val df = Seq((Some(1), Option.empty[String]), (None, Some("x")),
      (Some(3), None)).toDF("a", "b")
    val row: Row = Normalize.nullCensus(df).head
    assert(row.getLong(0) === 1L)
    assert(row.getLong(1) === 2L)
  }

  test("typedProjection casts and renames (P2)") {
    val df = Seq(("3.5", "LZ_WEST")).toDF("Temperature", "Location")
    val out = Normalize.typedProjection(df,
      Seq(("Temperature", "temp_f", FloatType), ("Location", "zone", StringType)))
    assert(out.columns.toSeq === Seq("temp_f", "zone"))
    assert(out.head.getFloat(0) === 3.5f)
  }

  test("modePerGroup: max count wins, ties break to the smallest value") {
    import spark.implicits._
    val df = Seq(("u1", "b"), ("u1", "b"), ("u1", "a"),
      ("u2", "z"), ("u2", "y"), // tie -> 'y'
      ("u3", null)).toDF("k", "v")
    val out = Normalize.modePerGroup(df, Seq("k"), "v")
      .orderBy("k").select("k", "mode", "n_mode")
      .as[(String, String, Long)].collect()
    assert(out === Array(("u1", "b", 2L), ("u2", "y", 1L)))
    // u3: only nulls -> no mode row at all
  }

  test("imputeMedian: nulls filled per group, non-nulls untouched, " +
    "all-null group stays null") {
    import spark.implicits._
    val df = Seq(("g1", Some(1.0)), ("g1", Some(3.0)), ("g1", None),
      ("g2", Some(10.0)), ("g2", None),
      ("g3", None)).toDF("g", "v")
    val out = Normalize.imputeMedian(df, Seq("g"), "v")
      .orderBy("g", "v").select("g", "v")
      .as[(String, Option[Double])].collect()
    assert(out === Array(
      ("g1", Some(1.0)), ("g1", Some(2.0)), ("g1", Some(3.0)),
      ("g2", Some(10.0)), ("g2", Some(10.0)),
      ("g3", None)))
  }

  test("schemaAdvisor: suggestion ladder, null/empty handling, " +
      "mixed columns fall back to string") {
    val df = Seq(
      ("1", "1.5", "2024-01-02", "2024-01-02 03:04:05", "a", null),
      ("-22", "7", "2024-12-31", "2024-01-02 03:04:05.125", "2x", ""),
      ("3", "-0.25", "2024-06-15", "2024-01-02 03:04:05", "", "9"))
      .toDF("ints", "nums", "days", "times", "mixed", "sparse")
    val out = Normalize.schemaAdvisor(df,
      Seq("ints", "nums", "days", "times", "mixed", "sparse"))
      .orderBy("col_name")
      .select("col_name", "n_rows", "n_null", "suggested")
      .as[(String, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      ("days", 3L, 0L, "date"),
      ("ints", 3L, 0L, "bigint"),
      ("mixed", 3L, 1L, "string"), // "a"/"2x" match nothing
      ("nums", 3L, 0L, "double"),  // longs promote into double
      ("sparse", 3L, 2L, "bigint"),
      ("times", 3L, 0L, "timestamp")))
    // all-null column stays string
    val empty = Seq((null: String), "", null).toDF("c")
    val e = Normalize.schemaAdvisor(empty, Seq("c"))
      .select("n_null", "suggested").as[(Long, String)].head()
    assert(e === ((3L, "string")))
  }
}
