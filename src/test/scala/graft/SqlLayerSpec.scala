package graft

import org.apache.spark.sql.functions._

import graft.sql.SqlLayer

/** The spark.sql analytical layer: registered lake views + the SQL-facing
  * as-of surface.
  */
class SqlLayerSpec extends SparkTestBase {

  test("registered views answer the reference business questions") {
    SqlLayer.register(spark, sf)
    val monthly = SqlLayer.run(spark, SqlLayer.monthlyAvg).collect()
    assert(monthly.length === 12)
    assert(monthly.map(_.getInt(0)).toSeq === (1 to 12))
    val hourly = SqlLayer.run(spark, SqlLayer.hourlyAvg).collect()
    assert(hourly.length === 24)
    val pct = SqlLayer.run(spark, SqlLayer.pctDistribution).head
    val total = (0 until 4).map(pct.getDouble).sum
    assert(math.abs(total - 100.0) < 0.1)
  }

  test("asofView exposes the as-of join to analyst SQL") {
    SqlLayer.register(spark, sf)
    spark.table("orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_totalprice")).as("best_price"))
      .createOrReplaceTempView("order_prices")
    SqlLayer.asofView(spark, "events_priced",
      "events", "order_prices", "ts", "o_orderdate",
      by = Seq(("user_id", "o_custkey")),
      valueCols = Seq(("best_price", "asof_price")), inner = true)
    val viaSql = spark.sql(
      "SELECT count(*) AS n, count(asof_price) AS n_priced FROM events_priced")
      .head
    assert(viaSql.getLong(0) > 0)
    assert(viaSql.getLong(1) === viaSql.getLong(0)) // inner: all matched
    // agrees with the DataFrame form used by the oracled j2/j8 queries
    val df = graft.operators.AsOfJoin.merge(
      spark.table("events"), spark.table("order_prices"),
      "ts", "o_orderdate", Seq(("user_id", "o_custkey")),
      Seq(("best_price", "asof_price")), inner = true)
    assert(viaSql.getLong(0) === df.count())
  }
}
