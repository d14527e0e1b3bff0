package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The analytical SQL layer (SURVEY.md §3.3): the reference submits analyst
  * SQL to BigQuery over its curated tables (`README.md:216-300`); here the
  * same queries run through `spark.sql` over lake tables registered as
  * temp views — parse → Catalyst analyze/optimize → the same physical
  * plans as the DataFrame forms.
  */
object SqlLayer {

  /** Register every parquet table under `sfDir` as a temp view, plus the
    * graft native functions (`graft_cosine`, `graft_jaccard`, ...) for SQL
    * use. `events.ts` arrives as a nanos-epoch long (see SparkEntry) and is
    * exposed converted to a timestamp.
    */
  def register(spark: SparkSession, sfDir: String,
      tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
        "part", "orders", "lineitem", "events", "documents", "embeddings")): Unit = {
    tables.foreach { name =>
      graft.sources.LakeReader.table(spark, sfDir, name)
        .createOrReplaceTempView(name)
    }
    graft.functions.GraftFunctions.register(spark)
  }

  /** Business Question 1 — average energy consumption by month
    * (`Queries/Average Energy Consumption by Month.sql`), on the lake's
    * `orders` stand-in.
    */
  val monthlyAvg: String =
    """SELECT month(o_orderdate) AS month,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice) AS avg_total
      |FROM orders GROUP BY month ORDER BY month""".stripMargin

  /** Business Question 2 — consumption by time of day
    * (`Queries/How does energy consumption vary by time of day_.sql`).
    */
  val hourlyAvg: String =
    """SELECT hour(ts) AS hour_of_day,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value
      |FROM events GROUP BY hour_of_day ORDER BY hour_of_day""".stripMargin

  /** Business Question 3 — percentage distribution of each source
    * (`Queries/Percentage Distribution of Each Energy.sql`).
    */
  val pctDistribution: String =
    """SELECT
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(sum(CAST(l_quantity + l_extendedprice + l_discount + l_tax AS DECIMAL(18,2))) AS DOUBLE) * 100, 2) AS pct_l_quantity,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(sum(CAST(l_quantity + l_extendedprice + l_discount + l_tax AS DECIMAL(18,2))) AS DOUBLE) * 100, 2) AS pct_l_extendedprice,
      |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / CAST(sum(CAST(l_quantity + l_extendedprice + l_discount + l_tax AS DECIMAL(18,2))) AS DOUBLE) * 100, 2) AS pct_l_discount,
      |  round(CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) / CAST(sum(CAST(l_quantity + l_extendedprice + l_discount + l_tax AS DECIMAL(18,2))) AS DOUBLE) * 100, 2) AS pct_l_tax
      |FROM lineitem""".stripMargin

  /** Business Question 4 — weather vs price (`README.md:290-300`). */
  val multiKeyAvg: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice), 2) AS average_price
      |FROM orders GROUP BY o_orderstatus, o_orderpriority
      |ORDER BY average_price DESC, o_orderstatus, o_orderpriority""".stripMargin

  def run(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)

  /** SQL surface for the as-of join: materializes
    * `AsOfJoin.auto(leftView, rightView, ...)` as a temp view so analyst
    * SQL can reference it directly (`SELECT ... FROM <name> ...`). Spark
    * has no `ASOF JOIN` grammar to hook into without a forked parser;
    * a named view over the strategy-selecting operator is the same
    * capability with zero parser risk — and the view's plan (broadcast
    * pick / dedicated sort-merge operator / bucketed composition) is
    * chosen by the same size heuristics as the DataFrame API.
    */
  def asofView(spark: SparkSession, name: String,
      leftView: String, rightView: String,
      leftTime: String, rightTime: String,
      by: Seq[(String, String)] = Nil,
      valueCols: Seq[(String, String)],
      inner: Boolean = false): DataFrame = {
    val df = graft.operators.AsOfJoin.auto(
      spark.table(leftView), spark.table(rightView),
      leftTime, rightTime, by, valueCols, inner)
    df.createOrReplaceTempView(name)
    df
  }

  // ---- named-view factories over the whole-operator analytics the SQL
  // grammar can't express directly (the asofView pattern): each
  // materializes the operator's output as a temp view, so the SQL-only
  // analyst reaches the r13 family too. The sequential-fold SCALAR
  // kernels are additionally registered as SQL functions by
  // `GraftFunctions.register` (graft_ewma_fold / graft_holt_fold /
  // graft_holt_winters_fold / graft_km_fold) for hand-rolled SQL.

  def holtWintersView(spark: SparkSession, name: String, table: String,
      keys: Seq[String], tsCol: String, measure: String,
      alpha: Double, beta: Double, gamma: Double, period: Int,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val df = graft.operators.Analytics.holtWinters(
      spark.table(table), keys, tsCol, measure, alpha, beta, gamma,
      period, tieBreak)
    df.createOrReplaceTempView(name)
    df
  }

  def rollingCorrView(spark: SparkSession, name: String, table: String,
      keys: Seq[String], tsCol: String, xCol: String, yCol: String,
      windowRows: Int, tieBreak: Seq[String] = Nil): DataFrame = {
    val df = graft.operators.Analytics.rollingCorrelation(
      spark.table(table), keys, tsCol, xCol, yCol, windowRows, tieBreak)
    df.createOrReplaceTempView(name)
    df
  }

  def rakeView(spark: SparkSession, name: String, table: String,
      idCol: String, textCol: String, stopwords: Seq[String],
      topK: Int = 50): DataFrame = {
    val df = graft.operators.TextAnalysis.rakeKeyphrases(
      spark.table(table), idCol, textCol, stopwords, topK)
    df.createOrReplaceTempView(name)
    df
  }

  def llrView(spark: SparkSession, name: String, table: String,
      textCol: String, minCount: Long = 5, topK: Int = 100): DataFrame = {
    val df = graft.operators.TextAnalysis.llrCollocations(
      spark.table(table), textCol, minCount, topK)
    df.createOrReplaceTempView(name)
    df
  }
}
