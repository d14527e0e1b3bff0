package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-quality gates for lake tables: declarative expectations evaluated
  * in ONE pass (single aggregate over the scan — at 100 TB the check costs
  * exactly one read, not one job per rule).
  *
  * Generalizes the reference's null-census logging (SURVEY §2.2 P5, its
  * only quality signal) into enforceable rules.
  */
object Quality {

  /** A named expectation: `predicate` must hold for every row. */
  case class Rule(name: String, predicate: Column)

  def notNull(c: String): Rule = Rule(s"not_null_$c", col(c).isNotNull)
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"range_$c", col(c).isNull || col(c).between(lo, hi))
  def matches(c: String, regex: String): Rule =
    Rule(s"matches_$c", col(c).isNull || col(c).rlike(regex))
  def oneOf(c: String, values: Seq[String]): Rule =
    Rule(s"one_of_$c", col(c).isNull || col(c).isin(values: _*))

  /** One row: total row count + violation count per rule. Sums are
    * coalesced so an EMPTY input (the routine no-new-files case) yields
    * zeros, not nulls.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      rules.map(r =>
        coalesce(sum(when(!r.predicate, 1).otherwise(0).cast(LongType)), lit(0L))
          .as("viol_" + r.name)): _*)

  /** Uniqueness expectation (needs a shuffle, so separate from [[check]]):
    * number of key tuples occurring more than once.
    */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .where(col("n") > 1)
      .agg(count(lit(1)).as("dup_keys"),
        coalesce(sum(col("n") - 1), lit(0L)).as("excess_rows"))

  /** Shuffle-key skew profile: the pre-flight diagnostic to run BEFORE
    * committing a join/groupBy key at scale. One count aggregation on
    * the key, one tiny global-stats broadcast back over the per-key
    * frame; emits the `topN` heaviest keys with
    *
    *   - `cnt`        exact rows under the key (null keys count as a key,
    *                  like the shuffle they model),
    *   - `share_pct`  round(cnt·100/total, 4) — this key's share of all
    *                  rows,
    *   - `skew_x`     round(cnt·n_keys/total, 4) — load relative to a
    *                  perfectly uniform key (1.0 = no skew); this is the
    *                  multiplier on the straggler task's runtime and the
    *                  salt factor that would level it.
    *
    * Counts are exact integers, the two ratios are single double
    * divisions of them (cross-engine bit-equal; `+0.0` canonicalizes the
    * zero-share case). Scale: the per-key frame is grouped map-side
    * first; only `topN` rows survive, and the global stats frame is ONE
    * row — nothing key-cardinality-sized reaches the driver.
    */
  def keySkew(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val perKey = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val totals = perKey.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("__total"),
      count(lit(1)).as("__n_keys"))
    perKey.crossJoin(broadcast(totals))
      .withColumn("share_pct",
        round(col("cnt").cast("double") * 100.0 / col("__total"), 4) + lit(0.0))
      .withColumn("skew_x",
        round(col("cnt").cast("double") * col("__n_keys") / col("__total"), 4)
          + lit(0.0))
      .orderBy(desc("cnt"), col(keyCol))
      .limit(topN)
      .select(col(keyCol), col("cnt"), col("share_pct"), col("skew_x"),
        col("__n_keys").as("n_keys"), col("__total").as("total_rows"))
  }

  /** Functional-dependency audit: does `lhs → rhs` actually hold in the
    * data? One summary row: total distinct lhs keys, how many map to
    * MORE than one distinct rhs value (the violations), the rows those
    * keys cover, and the worst key's rhs cardinality. The schema-design
    * / dirty-dimension screen: a claimed natural key with violations
    * is not a key, and an SCD attribute with violations needs
    * versioning before it can join. Nulls in rhs follow COUNT DISTINCT
    * semantics (ignored) — an all-null rhs key has cardinality 0, not
    * a violation.
    *
    * Scale shape: one (lhs, rhs-distinct) partial agg + one global
    * fold — exact integers, no window, no join.
    */
  def fdViolations(df: DataFrame, lhs: Seq[String],
      rhs: String): DataFrame = {
    require(lhs.nonEmpty, "fdViolations needs at least one lhs column")
    df.groupBy(lhs.map(col): _*)
      .agg(count_distinct(col(rhs)).as("__d"), count(lit(1)).as("__n"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("__d") > 1, 1L).otherwise(0L)).as("n_violating_keys"),
        sum(when(col("__d") > 1, col("__n")).otherwise(0L))
          .as("n_violating_rows"),
        max(col("__d")).as("max_rhs_per_key"))
  }

  /** Referential-integrity report: how many child rows carry a foreign
    * key with no matching parent row. `n_null_fk` rows (any fk column
    * null) are reported separately — SQL FK semantics never flag them
    * as violations. Orphans come from ONE left-anti join against the
    * DISTINCT parent keys (at 100 TB that is the standard shuffled
    * anti-join, broadcast when the key set is small); the report row
    * assembles exact counts, with the fraction as one double division.
    */
  def fkOrphans(child: DataFrame, parent: DataFrame,
      fkCols: Seq[String], pkCols: Seq[String]): DataFrame = {
    require(fkCols.nonEmpty && fkCols.size == pkCols.size,
      "fkOrphans needs matching, non-empty fk/pk column lists")
    val fkComplete = fkCols.map(col(_).isNotNull).reduce(_ && _)
    val checked = child.where(fkComplete)
    val parentKeys = parent
      .select(pkCols.map(col): _*)
      .where(pkCols.map(col(_).isNotNull).reduce(_ && _))
      .toDF(fkCols: _*)
      .distinct()
    val orphans = checked.select(fkCols.map(col): _*)
      .join(parentKeys, fkCols, "left_anti")
    val base = child.agg(
      count(lit(1)).as("n_rows"),
      sum(when(!fkComplete, 1L).otherwise(0L)).as("n_null_fk"),
      sum(when(fkComplete, 1L).otherwise(0L)).as("n_checked"))
    val orph = orphans.agg(
      count(lit(1)).as("n_orphan_rows"),
      count_distinct(col(fkCols.head),
        fkCols.tail.map(col): _*).as("n_orphan_keys"))
    base.crossJoin(broadcast(orph))
      .select(col("n_rows"), col("n_null_fk"), col("n_checked"),
        col("n_orphan_rows"), col("n_orphan_keys"),
        when(col("n_checked") === 0, lit(0.0))
          .otherwise(col("n_orphan_rows").cast("double") /
            col("n_checked").cast("double")).as("orphan_fraction"))
  }

  /** Ingest-volume anomaly report — the "did yesterday's load look
    * wrong?" monitor: per (key, day) row counts scored against the
    * key's own robust center (median) and scale (MAD), so one bad day
    * can't poison the baseline the way a mean/stddev monitor poisons
    * itself. A day flags when |n − median| > threshold·MAD; MAD = 0
    * (perfectly steady history) flags ANY deviation.
    *
    * Counts are exact; median/MAD use the exact interpolated
    * percentile both engines share (the robustStats convention), and
    * the flag is one deterministic double comparison. Emits EVERY
    * (key, day) with its flag — the monitor's full picture, not just
    * the alarms.
    *
    * Scale shape: one groupBy(key, day) over the source, then all
    * scoring on the per-day frame (days × keys rows) — two tiny
    * re-aggs broadcast back. One scan, one shuffle.
    */
  def volumeAnomalies(df: DataFrame, keyCol: String, tsCol: String,
      threshold: Double = 3.0): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    // null-SAFE joins: a null key (unclassified stream) is a real
    // series and must stay monitored, not silently vanish
    val daily = df.where(col(tsCol).isNotNull)
      .groupBy(col(keyCol), date_trunc("DAY", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val med = daily.groupBy(col(keyCol).as("__g"))
      .agg(expr("percentile(n, 0.5)").as("__med"))
    val withMed = daily.join(broadcast(med), col(keyCol) <=> col("__g"))
      .drop("__g")
    val mad = withMed.groupBy(col(keyCol).as("__g2"))
      .agg(expr("percentile(abs(CAST(n AS DOUBLE) - __med), 0.5)")
        .as("__mad"))
    withMed.join(broadcast(mad), col(keyCol) <=> col("__g2"))
      .select(col(keyCol), col("day"), col("n"),
        col("__med").as("median_n"), col("__mad").as("mad_n"),
        (abs(col("n").cast("double") - col("__med")) >
          lit(threshold) * col("__mad")).as("is_anomaly"))
  }

  /** Missing-range report over an integer id column — the ingest
    * completeness audit ("which sequence ranges never landed?"): every
    * maximal run of absent ids strictly inside [min, max] as
    * (gap_start, gap_end, n_missing), exact integers.
    *
    * Scale shape — NO global window over the ids: a gap boundary is a
    * LOCAL property (id present, id±1 absent), found with two hash
    * self-joins (anti on id−1 ⇒ run starts, anti on id+1 ⇒ run ends);
    * start/end lists then pair k-th-with-k-th through
    * [[Analytics.globalRowNumber]]'s range-partitioned numbering (the
    * lists alternate strictly, and they are GAP-count sized — tiny
    * relative to the data — so even their numbering pass is cheap).
    */
  def idGaps(df: DataFrame, idCol: String): DataFrame = {
    val ids = df.where(col(idCol).isNotNull)
      .select(col(idCol).cast(LongType).as("__id")).distinct()
      .localCheckpoint(true) // read 5x: bounds + both sides of 2 joins
    val bounds = ids.agg(min(col("__id")).as("__lo"),
      max(col("__id")).as("__hi"))
    // id present with id+1 absent (and not the global max) opens a gap
    val opens = ids.join(ids.select((col("__id") - 1L).as("__id")),
        Seq("__id"), "left_anti")
      .crossJoin(broadcast(bounds)).where(col("__id") < col("__hi"))
      .select((col("__id") + 1L).as("gap_start"))
    val closes = ids.join(ids.select((col("__id") + 1L).as("__id")),
        Seq("__id"), "left_anti")
      .crossJoin(broadcast(bounds)).where(col("__id") > col("__lo"))
      .select((col("__id") - 1L).as("gap_end"))
    Analytics.globalRowNumber(opens, Seq("gap_start"), out = "__k")
      .join(Analytics.globalRowNumber(closes, Seq("gap_end"), out = "__k"),
        "__k")
      .select(col("gap_start"), col("gap_end"),
        (col("gap_end") - col("gap_start") + 1L).as("n_missing"))
  }

  /** Fail-fast gate: throws if any rule is violated. */
  def enforce(df: DataFrame, rules: Seq[Rule]): Unit = {
    val row = check(df, rules).head()
    val bad = rules.zipWithIndex.collect {
      case (r, i) if row.getLong(i + 1) > 0 => s"${r.name}=${row.getLong(i + 1)}"
    }
    require(bad.isEmpty, s"quality gate failed: ${bad.mkString(", ")}")
  }
}
