package graft

class SparkEntrySpec extends SparkTestBase {

  test("entry flagship query returns rows on sf0.001 (smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs non-empty on sf0.001") {
    for ((name, fn) <- SparkEntry.queries) {
      val n = fn(spark, sf).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }
}
