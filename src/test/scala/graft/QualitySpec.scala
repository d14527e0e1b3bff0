package graft

import graft.operators.Quality

class QualitySpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (1L, 50.0, "F"), (2L, -5.0, "O"), (3L, 120.0, "X")
  ).toDF("id", "price", "status")

  test("check counts violations per rule in one pass") {
    val row = Quality.check(df, Seq(
      Quality.notNull("id"),
      Quality.inRange("price", 0, 100),
      Quality.oneOf("status", Seq("F", "O")))).head
    assert(row.getLong(0) === 3)     // n_rows
    assert(row.getLong(1) === 0)     // id nulls
    assert(row.getLong(2) === 2)     // -5 and 120 out of range
    assert(row.getLong(3) === 1)     // X not allowed
  }

  test("enforce throws on violations, passes on clean data") {
    Quality.enforce(df, Seq(Quality.notNull("id")))
    val e = intercept[IllegalArgumentException] {
      Quality.enforce(df, Seq(Quality.inRange("price", 0, 100)))
    }
    assert(e.getMessage.contains("range_price=2"))
  }

  test("duplicateKeys reports multiplicity excess") {
    val d = Seq((1, "a"), (1, "a"), (1, "a"), (2, "b")).toDF("k", "v")
    val row = Quality.duplicateKeys(d, Seq("k", "v")).head
    assert(row.getLong(0) === 1)  // one duplicated key tuple
    assert(row.getLong(1) === 2)  // two excess rows
  }

  test("keySkew ranks heavy keys with exact share and skew multiplier") {
    // key a: 6 rows, b: 2, c: 2 → total 10, 3 keys
    val d = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val got = Quality.keySkew(d, "k", 2)
      .select("k", "cnt", "share_pct", "skew_x", "n_keys", "total_rows")
      .collect()
    assert(got.length === 2)
    val top = got.head
    assert(top.getString(0) === "a" && top.getLong(1) === 6L)
    assert(top.getDouble(2) === 60.0)  // 6/10
    assert(top.getDouble(3) === 1.8)   // 6·3/10
    assert(top.getLong(4) === 3L && top.getLong(5) === 10L)
    // tie between b and c breaks on key ascending
    assert(got(1).getString(0) === "b" && got(1).getDouble(3) === 0.6)
  }

  test("keySkew counts a null key as its own key (like the shuffle)") {
    val d = Seq(Some("a"), Some("a"), None, None, None).toDF("k")
    val got = Quality.keySkew(d, "k", 5).collect()
    assert(got.length === 2)
    assert(got.head.isNullAt(0) && got.head.getLong(1) === 3L)
    assert(got.head.getDouble(2) === 60.0)
  }

  test("volumeAnomalies: a spike day flags against the key's own " +
      "median/MAD; NULL keys stay monitored as their own series") {
    import org.apache.spark.sql.functions._
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-${d}%02d 10:00:00")
    // key a: 9 steady days of 4 rows + one 40-row spike day;
    // key NULL: steady (never flags) — but it must APPEAR
    val rows =
      (1 to 9).flatMap(d => Seq.fill(4)(("a", day(d)))) ++
        Seq.fill(40)(("a", day(10))) ++
        (1 to 5).flatMap(d => Seq.fill(3)((null: String, day(d))))
    val out = Quality.volumeAnomalies(rows.toDF("k", "ts"), "k", "ts")
      .select(col("k"), col("day"), col("n"), col("is_anomaly"))
      .collect()
    val aDays = out.filter(r => r.getString(0) == "a")
    assert(aDays.length === 10)
    val flagged = aDays.filter(_.getBoolean(3))
    assert(flagged.length === 1 && flagged.head.getLong(2) === 40L)
    val nullDays = out.filter(_.isNullAt(0))
    assert(nullDays.length === 5, "null-key series must stay monitored")
    assert(nullDays.forall(!_.getBoolean(3)))
  }

  test("fkOrphans: orphan rows/keys counted, null FKs set aside") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L),
      Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Quality.fkOrphans(child, parent, Seq("fk"), Seq("pk"))
      .select("n_rows", "n_null_fk", "n_checked", "n_orphan_rows",
        "n_orphan_keys", "orphan_fraction")
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(r._1 === 7L)
    assert(r._2 === 1L)      // the null FK is not a violation
    assert(r._3 === 6L)
    assert(r._4 === 3L)      // three rows point at missing key 9
    assert(r._5 === 1L)      // ... which is one distinct orphan key
    assert(r._6 === 0.5)
  }

  test("fkOrphans: clean references and composite keys report zero") {
    val child = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k1", "k2")
    val parent = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("p1", "p2")
    val r = Quality.fkOrphans(child, parent,
      Seq("k1", "k2"), Seq("p1", "p2"))
      .select("n_orphan_rows", "orphan_fraction")
      .as[(Long, Double)].head()
    assert(r === ((0L, 0.0)))
    // composite: a partial match is STILL an orphan
    val child2 = Seq((1L, "zzz")).toDF("k1", "k2")
    val r2 = Quality.fkOrphans(child2, parent,
      Seq("k1", "k2"), Seq("p1", "p2"))
      .select("n_orphan_rows").as[Long].head()
    assert(r2 === 1L)
  }

  // ---- idGaps (dq7) ----

  test("idGaps: every maximal missing run inside [min, max], exact " +
      "bounds, duplicates and nulls ignored") {
    val ids = Seq(1L, 2L, 2L, 5L, 6L, 9L, 15L)
      .map(Option(_)).:+(None: Option[Long]).toDF("id")
    val out = Quality.idGaps(ids, "id")
      .orderBy("gap_start")
      .select("gap_start", "gap_end", "n_missing")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((3L, 4L, 2L), (7L, 8L, 2L), (10L, 14L, 5L)))
  }

  test("idGaps: contiguous and singleton inputs report no gaps; " +
      "partitioning does not matter") {
    import org.apache.spark.sql.functions.col
    assert(Quality.idGaps(
      Seq(4L, 5L, 6L, 7L).toDF("id"), "id").count() === 0L)
    assert(Quality.idGaps(Seq(42L).toDF("id"), "id").count() === 0L)
    val big = spark.range(0, 2000).select(col("id"))
      .where(col("id") % 13 =!= 5 || col("id") < 100)
    val one = Quality.idGaps(big.coalesce(1), "id")
      .orderBy("gap_start").collect()
    val many = Quality.idGaps(big.repartition(17), "id")
      .orderBy("gap_start").collect()
    assert(one === many)
    // every gap is exactly one missing id (the %13 singles past 100)
    assert(one.forall(_.getLong(2) === 1L))
  }

  test("fdViolations: violating keys, covered rows, null rhs ignored") {
    val df = Seq(
      ("k1", Some("a")), ("k1", Some("a")),          // clean key
      ("k2", Some("a")), ("k2", Some("b")), ("k2", Some("b")), // violates
      ("k3", None), ("k3", None),                     // all-null rhs: d=0
      ("k4", Some("x")), ("k4", None))                // null ignored: d=1
      .toDF("k", "v")
    val r = Quality.fdViolations(df, Seq("k"), "v").head
    assert(r.getLong(0) === 4L) // n_keys
    assert(r.getLong(1) === 1L) // only k2 violates
    assert(r.getLong(2) === 3L) // k2's rows
    assert(r.getLong(3) === 2L) // worst cardinality
  }
}
