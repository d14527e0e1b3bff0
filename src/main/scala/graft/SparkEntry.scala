package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One `queries` entry per implemented operator from SURVEY.md §2 (plus the
  * LLM-pipeline extensions), each with a DuckDB oracle in [[oracleSql]]
  * where SQL-expressible. Column names are aligned between both sides; every
  * query ends in a deterministic total ORDER BY (all output columns or a
  * unique key) so results are hash-comparable.
  *
  * Double-typed aggregates go through [[Analytics.stableSum]] (exact decimal
  * accumulation) so results are order-independent — plain double sums differ
  * between engines in the last ulp.
  */
object SparkEntry {

  /** Table reader. `events.ts` is parquet TIMESTAMP(NANOS), which Spark
    * reads only as a nanos-epoch long (`spark.sql.legacy.parquet.nanosAsLong`);
    * convert to TimestampType (micros, floor) at the boundary so every
    * downstream operator sees a timestamp. Sub-microsecond truncation can
    * never flip a comparison/bucket against the reference data's
    * millisecond-or-coarser boundaries.
    */
  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  import Analytics.{stableAvg, stableSum}

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- flagship: TPC-H Q1-shaped pricing summary (A1+A4-family agg) ----
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          stableSum(col("l_quantity")).as("sum_qty"),
          stableSum(col("l_extendedprice")).as("sum_base_price"),
          stableAvg(col("l_quantity")).as("avg_qty"),
          stableAvg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- S1: scan with filter pushdown + column pruning ----
    "s1_scan_prune" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1996-01-01").cast(TimestampType))
        .select(col("l_orderkey"), col("l_extendedprice"))
        .orderBy("l_orderkey", "l_extendedprice")
    }),

    // ---- SET1/S2: union of same-schema inputs ----
    "set1_union" -> ((s, dir) => {
      val r = t(s, dir, "region").select(col("r_name").as("name"))
      val n = t(s, dir, "nation").select(col("n_name").as("name"))
      graft.sources.LakeReader.unionByName(Seq(r, n)).orderBy("name")
    }),

    // ---- P1: rename-all-columns snake_case normalization ----
    "p1_rename" -> ((s, dir) => {
      val spaced = t(s, dir, "events")
        .select(col("event_type").as("Event Type"), col("value").as("The Value"))
      Normalize.renameAll(spaced).orderBy("event_type", "the_value")
    }),

    // ---- P2: typed projection with cast+alias ----
    "p2_typed_projection" -> ((s, dir) => {
      Normalize.typedProjection(t(s, dir, "lineitem"), Seq(
        ("l_orderkey", "l_orderkey", LongType),
        ("l_linenumber", "l_linenumber", IntegerType),
        ("l_quantity", "qty_f", FloatType),
        ("l_shipdate", "ship_day", DateType)))
        .orderBy("l_orderkey", "l_linenumber", "qty_f", "ship_day")
    }),

    // ---- P3: cast-then-drop-null (unparseable rows vanish) ----
    "p3_cast_drop" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val raw = li.select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag").as("v"))
        .unionAll(li.select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast(StringType).as("v")))
      Normalize.dropNullRows(
        raw.withColumn("v", expr("try_cast(v AS DOUBLE)")))
        .orderBy("l_orderkey", "l_linenumber", "v")
    }),

    // ---- P4: dedup / distinct ----
    "p4_dedup" -> ((s, dir) => {
      Normalize.dedup(t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority")))
        .orderBy("o_orderstatus", "o_orderpriority")
    }),

    // ---- P5/A3: one-row per-column null census ----
    "p5_null_census" -> ((s, dir) =>
      Normalize.nullCensus(t(s, dir, "events"))),

    // ---- A1: global count ----
    "a1_count" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("n"))),

    // ---- A2: group-by count ----
    "a2_group_count" -> ((s, dir) =>
      Analytics.groupCount(t(s, dir, "customer"), "c_mktsegment")),

    // ---- A4: monthly average ----
    "a4_monthly_avg" -> ((s, dir) =>
      Analytics.monthlyAvg(t(s, dir, "orders"), "o_orderdate", "o_totalprice")),

    // ---- A5: hour-of-day average ----
    "a5_hourly_avg" -> ((s, dir) =>
      Analytics.hourlyAvg(t(s, dir, "events"), "ts", "value")),

    // ---- A6: percentage-of-total distribution ----
    "a6_pct_distribution" -> ((s, dir) =>
      Analytics.percentageDistribution(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // ---- A7: multi-key grouped average, ordered by aggregate desc ----
    "a7_multikey_avg" -> ((s, dir) =>
      Analytics.multiKeyAvg(t(s, dir, "orders"),
        Seq("o_orderstatus", "o_orderpriority"), "o_totalprice")),

    // ---- O1: total sort ----
    "o1_sort" -> ((s, dir) => {
      t(s, dir, "orders").orderBy(col("o_orderdate"), col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // ---- O3+O4: top-k (order by measure desc, limit) ----
    "o2_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)
    }),

    // ---- J1: equi + point-in-interval join ----
    "j1_interval" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      IntervalJoin.pointInInterval(
        li, o,
        li("l_shipdate"), o("o_orderdate"),
        o("o_orderdate") + expr("INTERVAL 30 DAYS"),
        Seq((li("l_orderkey"), o("o_orderkey"))))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_totalprice"))
        .orderBy("l_orderkey", "l_linenumber", "o_totalprice")
    }),

    // ---- J2: distributed backward as-of join ----
    "j2_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      // unique (key, time) right side => deterministic as-of
      val o = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_totalprice")).as("best_price"))
      AsOfJoin.backward(ev, o,
        leftTime = "ts", rightTime = "o_orderdate",
        by = Seq(("user_id", "o_custkey")),
        valueCols = Seq(("best_price", "asof_price")),
        inner = true)
        .select(col("event_id"), col("user_id"), col("asof_price"))
        .orderBy("event_id")
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "s1_scan_prune" ->
      """SELECT l_orderkey, l_extendedprice FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01'
        |ORDER BY l_orderkey, l_extendedprice""".stripMargin,

    "set1_union" ->
      """SELECT r_name AS name FROM region
        |UNION ALL SELECT n_name AS name FROM nation
        |ORDER BY name""".stripMargin,

    "p1_rename" ->
      """SELECT event_type, value AS the_value FROM events
        |ORDER BY event_type, the_value""".stripMargin,

    "p2_typed_projection" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS REAL) AS qty_f,
        |  CAST(l_shipdate AS DATE) AS ship_day
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, qty_f, ship_day""".stripMargin,

    "p3_cast_drop" ->
      """WITH raw AS (
        |  SELECT l_orderkey, l_linenumber, l_returnflag AS v FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, CAST(l_quantity AS VARCHAR) FROM lineitem)
        |SELECT l_orderkey, l_linenumber, TRY_CAST(v AS DOUBLE) AS v FROM raw
        |WHERE TRY_CAST(v AS DOUBLE) IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, v""".stripMargin,

    "p4_dedup" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "p5_null_census" ->
      """SELECT
        |  CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_id,
        |  CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ts,
        |  CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id,
        |  CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type,
        |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value,
        |  CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS props
        |FROM events""".stripMargin,

    "a1_count" -> "SELECT COUNT(*) AS n FROM lineitem",

    "a2_group_count" ->
      """SELECT c_mktsegment, COUNT(*) AS count FROM customer
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "a4_monthly_avg" ->
      """SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS month,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_o_totalprice
        |FROM orders GROUP BY month ORDER BY month""".stripMargin,

    "a5_hourly_avg" ->
      """SELECT CAST(EXTRACT(HOUR FROM ts) AS INT) AS hour_of_day,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS avg_value
        |FROM events GROUP BY hour_of_day ORDER BY hour_of_day""".stripMargin,

    "a6_pct_distribution" ->
      """SELECT
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(SUM(CAST(l_quantity + l_extendedprice + l_discount + l_tax AS DECIMAL(18,2))) AS DOUBLE) * 100, 2) AS pct_l_quantity,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(SUM(CAST(l_quantity + l_extendedprice + l_discount + l_tax AS DECIMAL(18,2))) AS DOUBLE) * 100, 2) AS pct_l_extendedprice,
        |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / CAST(SUM(CAST(l_quantity + l_extendedprice + l_discount + l_tax AS DECIMAL(18,2))) AS DOUBLE) * 100, 2) AS pct_l_discount,
        |  ROUND(CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) / CAST(SUM(CAST(l_quantity + l_extendedprice + l_discount + l_tax AS DECIMAL(18,2))) AS DOUBLE) * 100, 2) AS pct_l_tax
        |FROM lineitem""".stripMargin,

    "a7_multikey_avg" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice), 2) AS average_price
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY average_price DESC, o_orderstatus, o_orderpriority""".stripMargin,

    "o1_sort" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderdate, o_orderkey""".stripMargin,

    "o2_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "j1_interval" ->
      """SELECT l.l_orderkey, l.l_linenumber, o.o_totalprice
        |FROM lineitem l JOIN orders o
        |  ON l.l_orderkey = o.o_orderkey
        | AND l.l_shipdate BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 30 DAY
        |ORDER BY l.l_orderkey, l.l_linenumber, o.o_totalprice""".stripMargin,

    "j2_asof" ->
      """SELECT e.event_id, e.user_id, o.best_price AS asof_price
        |FROM events e ASOF JOIN (
        |  SELECT o_custkey, o_orderdate, MAX(o_totalprice) AS best_price
        |  FROM orders GROUP BY o_custkey, o_orderdate) o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
  )
}
