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
}
