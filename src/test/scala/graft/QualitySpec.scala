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
}
