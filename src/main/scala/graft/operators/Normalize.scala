package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-cleaning / projection operators (SURVEY.md §2.2, §2.8).
  *
  * All are pure `DataFrame => DataFrame` transformations that stay inside
  * whole-stage codegen — no UDFs, no driver round-trips. At 100 TB these
  * are map-side-only (no shuffle) except [[dedup]], which shuffles on the
  * deduplication key set.
  */
object Normalize {

  /** snake_case column-name normalization — P1.
    * Ref: `pyspark_ercot_load_latest_BQ_archive_csv.py:41`
    * (`c.replace(' ', '_').lower()` applied to every column name).
    * Pure metadata operation: zero execution cost, preserves pushdown.
    */
  // Locale.ROOT: default-locale toLowerCase turns "I" into dotless "ı"
  // under a Turkish JVM locale, silently breaking every casts-map lookup
  def normName(c: String): String =
    c.replace(' ', '_').toLowerCase(java.util.Locale.ROOT)

  def renameAll(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normName).toIndexedSeq: _*)

  /** Cast the named columns, null-on-failure (non-ANSI) — F1/F3/F4/F5.
    * Ref: `...load_latest...py:58-66` (to_timestamp + DecimalType(10,2)).
    * Requires spark.sql.ansi.enabled=false so unparseable strings become
    * null (then [[dropNullRows]] removes them — the reference's implicit
    * invalid-row filter, SURVEY §7.4.3).
    */
  def castColumns(df: DataFrame, casts: Map[String, DataType]): DataFrame = {
    val cols = df.columns.map { c =>
      casts.get(c) match {
        case Some(dt) => col(c).cast(dt).as(c)
        case None     => col(c)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** `to_timestamp` with an explicit pattern (F2) for offset-bearing
    * strings, e.g. `2024-05-01 00:15:00-05:00` with `yyyy-MM-dd HH:mm:ssXXX`.
    * Ref: `test_pyspark_merge_spp_weather.py:49-51`. Values normalize to the
    * session time zone (pinned UTC).
    */
  def parseTimestamp(c: Column, pattern: String): Column =
    to_timestamp(c, pattern)

  /** Drop rows containing any null — P3. Ref `...load_latest...py:69`.
    * Combined with [[castColumns]] this silently removes rows whose
    * string→timestamp/decimal cast failed (cast yields null).
    */
  def dropNullRows(df: DataFrame): DataFrame = df.na.drop()

  /** Distinct over all columns — P4. Ref `...load_historical...py:69`.
    * This is the reference's only exactly-once story (re-processed files
    * collapse on append). Shuffles on all columns; at scale prefer
    * `dropDuplicates(naturalKey)` so the shuffle key is narrow.
    */
  def dedup(df: DataFrame): DataFrame = df.dropDuplicates()

  def dedup(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** One-row per-column null census — P5/A3. Ref `...load_latest...py:52`:
    * `SUM(CAST(c IS NULL AS INT))` for every column. Single partial+final
    * HashAggregate, no per-column jobs.
    */
  def nullCensus(df: DataFrame): DataFrame =
    df.select(df.columns.map(c =>
      sum(col(c).isNull.cast(IntegerType)).as(c)).toIndexedSeq: _*)

  /** Typed projection with cast+alias — P2.
    * Ref: `test_pyspark_merge_spp_weather.py:62-75` (12-column shaping of a
    * join result). `specs` = (inputColumn, outputName, targetType).
    */
  def typedProjection(df: DataFrame,
      specs: Seq[(String, String, DataType)]): DataFrame =
    df.select(specs.map { case (in, out, dt) =>
      col(in).cast(dt).as(out)
    }.toIndexedSeq: _*)

  /** Most frequent value per group (deterministic: ties break to the
    * SMALLEST value, so the answer is engine-portable). Nulls are never
    * a mode (they are what imputation fills). One count aggregate, one
    * group-local window over value-count rows — group cardinality sized,
    * never row sized.
    */
  def modePerGroup(df: DataFrame, keyCols: Seq[String],
      valCol: String): DataFrame = {
    require(keyCols.nonEmpty, "modePerGroup needs at least one key")
    import org.apache.spark.sql.expressions.Window
    val counts = df.where(col(valCol).isNotNull)
      .groupBy((keyCols :+ valCol).map(col): _*)
      .agg(count(lit(1)).as("n_mode"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(desc("n_mode"), col(valCol))
    counts.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(keyCols.map(col) :+ col(valCol).as("mode") :+
        col("n_mode"): _*)
  }

  /** Lexical schema advisor for ALL-STRING landings (the reference's
    * CSV shape, §2.1 S1): per column, count how many values match each
    * type recognizer and suggest the narrowest type covering every
    * non-null value. Recognizers are EXPLICIT anchored regexes (the
    * Java∩RE2 subset, shared verbatim with the oracle) — never engine
    * casts, which disagree across engines on string edge cases
    * ('12.5' → BIGINT truncates in one engine and nulls in another; an
    * ingest advisor must not inherit that).
    *
    * Suggestion ladder (first complete cover wins): bigint → double
    * (longs promote) → date → timestamp → string; empty strings count
    * as null, an all-null column stays string.
    *
    * ONE aggregate pass computes every column's counts (map-side
    * combine — at 100 TB the advice costs one scan, not one per
    * column); the per-column rows then unfold from the single row.
    */
  def schemaAdvisor(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "schemaAdvisor needs at least one column")
    val LongRe = "^-?[0-9]+$"
    val DoubleRe = "^-?[0-9]+\\.[0-9]+$"
    val DateRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
    val TsRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2} " +
      "[0-9]{2}:[0-9]{2}:[0-9]{2}(\\.[0-9]+)?$"
    val structs = cols.map { c =>
      val v = col(c).cast(StringType)
      def n(cond: Column) = sum(when(cond, 1L).otherwise(0L))
      struct(
        lit(c).as("col_name"),
        count(lit(1)).as("n_rows"),
        n(v.isNull || v === "").as("n_null"),
        n(v.rlike(LongRe)).as("n_long"),
        n(v.rlike(DoubleRe)).as("n_double"),
        n(v.rlike(DateRe)).as("n_date"),
        n(v.rlike(TsRe)).as("n_ts"))
    }
    val nonNull = col("c.n_rows") - col("c.n_null")
    df.agg(array(structs: _*).as("__a"))
      .select(explode(col("__a")).as("c"))
      .select(col("c.col_name").as("col_name"),
        col("c.n_rows").as("n_rows"), col("c.n_null").as("n_null"),
        col("c.n_long").as("n_long"), col("c.n_double").as("n_double"),
        col("c.n_date").as("n_date"), col("c.n_ts").as("n_ts"),
        when(nonNull === 0L, "string")
          .when(col("c.n_long") === nonNull, "bigint")
          .when(col("c.n_long") + col("c.n_double") === nonNull, "double")
          .when(col("c.n_date") === nonNull, "date")
          .when(col("c.n_ts") === nonNull, "timestamp")
          .otherwise("string").as("suggested"))
  }

  /** Median imputation: null `measure` values are replaced by the
    * per-group exact median (Spark's sort-based `percentile`, which is
    * bit-equal to `quantile_cont` — the a18 precedent); non-null values
    * pass through untouched and an all-null group stays null. The
    * median frame is group-count-sized and broadcast — the data is
    * scanned twice but never shuffled on rows.
    */
  def imputeMedian(df: DataFrame, keyCols: Seq[String],
      measure: String): DataFrame = {
    require(keyCols.nonEmpty, "imputeMedian needs at least one key")
    val med = df.where(col(measure).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(expr(s"percentile($measure, 0.5)").as("__med"))
    df.join(broadcast(med), keyCols, "left_outer")
      .withColumn(measure,
        coalesce(col(measure), col("__med")))
      .drop("__med")
  }
}
