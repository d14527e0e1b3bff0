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

  test("graft_asof marker in plain SQL rewrites to the as-of operator") {
    SqlLayer.register(spark, sf)
    spark.table("orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_totalprice")).as("best_price"))
      .createOrReplaceTempView("order_prices2")

    val sqlDf = spark.sql(
      """SELECT e.event_id, e.user_id, o.best_price AS asof_price
        |FROM events e JOIN order_prices2 o
        |  ON e.user_id = o.o_custkey AND graft_asof(e.ts, o.o_orderdate)
        |ORDER BY e.event_id""".stripMargin)
    assert(sqlDf.queryExecution.executedPlan.toString.contains("AsOfMergeJoin"))

    val dfForm = graft.operators.AsOfJoin.merge(
      spark.table("events"), spark.table("order_prices2"),
      "ts", "o_orderdate", Seq(("user_id", "o_custkey")),
      Seq(("best_price", "asof_price")), inner = true)
      .select(col("event_id"), col("user_id"), col("asof_price"))
      .orderBy("event_id")
    assert(sqlDf.collect().toSeq === dfForm.collect().toSeq)

    // LEFT join keeps unmatched rows with nulls
    val leftDf = spark.sql(
      """SELECT e.event_id, o.best_price AS asof_price
        |FROM events e LEFT JOIN order_prices2 o
        |  ON e.user_id = o.o_custkey AND graft_asof(e.ts, o.o_orderdate)
        |""".stripMargin)
    assert(leftDf.count() === spark.table("events").count())

    // comma-join + WHERE form: PushPredicateThroughJoin folds the
    // predicate into the join condition, then the rewrite fires on the
    // next fixpoint iteration of the same optimizer batch
    val whereForm = spark.sql(
      """SELECT e.event_id, o.best_price AS asof_price
        |FROM events e, order_prices2 o
        |WHERE e.user_id = o.o_custkey AND graft_asof(e.ts, o.o_orderdate)
        |ORDER BY e.event_id""".stripMargin)
    assert(whereForm.queryExecution.executedPlan.toString
      .contains("AsOfMergeJoin"))
    assert(whereForm.select("asof_price").collect().toSeq ===
      dfForm.select("asof_price").collect().toSeq)

    // self-join works UNALIASED through SQL (analyzer dedup ran on the
    // Join before the rewrite)
    val self = spark.sql(
      """SELECT a.event_id, b.value AS prev_value
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND graft_asof(a.ts, b.ts)
        |LIMIT 5""".stripMargin)
    assert(self.count() === 5)
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

  test("round-4 expressions are reachable from plain SQL") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((3L, 5L, "aa\nbb\naa aa")).toDF("x", "y", "text")
      .createOrReplaceTempView("sql_r4")
    val row = spark.sql(
      """SELECT graft_zvalue(3, x, y) AS z,
        |  graft_repetition_stats(text).dup_line_frac AS dlf,
        |  graft_quantize_roundtrip(array(1.0D, 2.0D, 3.0D))[1] AS q
        |FROM sql_r4""".stripMargin).head
    assert(row.getLong(0) === 39L) // 3 interleaved with 5, bits=3
    assert(row.getDouble(1) === 0.0)
    // reconstruction error bounded by scale/2 = (3-1)/255/2
    assert(math.abs(row.getDouble(2) - 2.0) <= 1.0 / 255 + 1e-12)
  }

  test("sequential-fold kernels are reachable from plain SQL") {
    graft.functions.GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  graft_ewma_fold(array(10.0D, 20.0D, 30.0D), 0.5)[2] AS e3,
        |  graft_holt_fold(array(10.0D, 20.0D), 0.5, 0.5).ls[1] AS l2,
        |  graft_km_fold(array(2L, 0L), array(10L, 8L))[1] AS s2
        |""".stripMargin).head
    assert(row.getDouble(0) === 22.5) // 0.5*30 + 0.5*(0.5*20 + 0.5*10)
    assert(row.getDouble(1) === 15.0) // 0.5*20 + 0.5*(10 + 0)
    assert(row.getDouble(2) === 0.8) // (10-2)/10 carried by the 0-step
    // coefficients must be literals (kernel parameters, not data)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_ewma_fold(array(1.0D), CAST(rand() AS DOUBLE))")
        .head
    }
    assert(e.getMessage.contains("literal"))
  }

  test("r13 analytics family is reachable through named-view factories") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, 1L, 1L, 10.0, 1.0), (1L, 2L, 2L, 20.0, 2.0),
      (1L, 3L, 3L, 30.0, 3.0), (1L, 4L, 4L, 40.0, 4.0))
      .toDF("k", "ts", "eid", "x", "y")
      .createOrReplaceTempView("sql_series")
    Seq((1L, "good data pipeline", "good data pipeline quality"))
      .toDF("doc_id", "a", "text").createOrReplaceTempView("sql_docs")
    SqlLayer.rollingCorrView(spark, "v_corr", "sql_series",
      Seq("k"), "ts", "x", "y", windowRows = 3, tieBreak = Seq("eid"))
    val corr = spark.sql(
      "SELECT roll_corr FROM v_corr ORDER BY ts DESC LIMIT 1").head.getDouble(0)
    assert(math.abs(corr - 1.0) < 1e-9) // perfectly linear pair
    SqlLayer.rakeView(spark, "v_rake", "sql_docs", "doc_id", "text",
      stopwords = Seq("the", "and"), topK = 5)
    assert(spark.sql("SELECT count(*) FROM v_rake").head.getLong(0) >= 1L)
    SqlLayer.llrView(spark, "v_llr", "sql_docs", "text", minCount = 1,
      topK = 5)
    assert(spark.sql(
      "SELECT count(*) FROM v_llr WHERE term_a = 'good'").head.getLong(0)
      >= 1L)
    SqlLayer.holtWintersView(spark, "v_hw", "sql_series",
      Seq("k"), "ts", "x", alpha = 0.5, beta = 0.5, gamma = 0.5,
      period = 2, tieBreak = Seq("eid"))
    assert(spark.sql("SELECT count(*) FROM v_hw").head.getLong(0) === 2L)
  }
}
