package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Lake maintenance advisor: layout health of a graft table computed
  * from ONE manifest read (per-file rows/bytes/bounds already live in
  * the `#stats` lines), no data files touched. Answers the two
  * questions a 100 TB table's operator actually schedules around:
  *
  *  - '''small files''': how fragmented is the snapshot, and how many
  *    files would a compaction to `targetFileBytes` produce?
  *  - '''clustering health''': for a column, what fraction of file-pair
  *    min/max ranges OVERLAP? 0.0 = perfectly clustered (every range
  *    disjoint — a point predicate plans ~1 file); → 1.0 = no locality
  *    (every file overlaps every other — nothing prunes). This is the
  *    metric that says "re-cluster now", before query latency does.
  *
  * Driver-side over the manifest (files-count-sized, the clone/vacuum
  * discipline), not a distributed job: at any corpus size the input is
  * one manifest, never data.
  */
object TableHealth {

  private val reportSchema = StructType(Seq(
    StructField("version", LongType),
    StructField("n_files", LongType),
    StructField("n_rows", LongType),
    StructField("total_bytes", LongType),
    StructField("avg_file_bytes", LongType),
    StructField("small_files", LongType),
    StructField("small_file_fraction", DoubleType),
    StructField("recommended_files", LongType)))

  /** One-row fragmentation report. A file is "small" below half the
    * target; `recommended_files` = ⌈total/target⌉ (≥ 1). Files whose
    * stats line is absent (legacy commits) count toward `n_files` but
    * contribute no bytes/rows. */
  def layoutReport(spark: SparkSession, table: String,
      targetFileBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val (v, _) = VersionedTable.latest(spark, table)
    val files = VersionedTable.filesAt(spark, table, v)
    val stats = VersionedTable.parsedStatsAt(spark, table, Some(v))
    val bytes = files.flatMap(stats.get).flatMap(_.bytes)
    val rows = files.flatMap(stats.get).flatMap(_.rows)
    val total = bytes.sum
    val small = bytes.count(_ < targetFileBytes / 2)
    val row = Row(v, files.size.toLong, rows.sum, total,
      if (bytes.isEmpty) 0L else total / bytes.size,
      small.toLong,
      if (bytes.isEmpty) 0.0 else small.toDouble / bytes.size,
      math.max(1L, (total + targetFileBytes - 1) / targetFileBytes))
    spark.createDataFrame(
      java.util.Collections.singletonList(row), reportSchema)
  }

  private val overlapSchema = StructType(Seq(
    StructField("column", StringType),
    StructField("n_files", LongType),
    StructField("files_with_bounds", LongType),
    StructField("overlapping_pairs", LongType),
    StructField("possible_pairs", LongType),
    StructField("overlap_fraction", DoubleType)))

  /** One-row clustering-health report for `column`: the fraction of
    * file pairs whose [min, max] ranges intersect, via a sweep over
    * files sorted by min (O(F log F + overlaps)). Files without bounds
    * for the column (all-null, legacy) are excluded from the pair
    * denominator. */
  def boundsOverlap(spark: SparkSession, table: String,
      column: String): DataFrame = {
    val (v, _) = VersionedTable.latest(spark, table)
    val files = VersionedTable.filesAt(spark, table, v)
    val stats = VersionedTable.parsedStatsAt(spark, table, Some(v))
    val keys = VersionedTable.statsKeyCandidates(
      VersionedTable.tableSchema(spark, table), column)
    val ranges = files.flatMap(stats.get).flatMap { st =>
      keys.iterator.flatMap(st.cols.get).nextOption()
        .flatMap(cs => for { lo <- cs.min; hi <- cs.max } yield (lo, hi))
    }
    val n = ranges.size
    // sweep in min order: a later file overlaps an earlier one iff its
    // min is <= that file's max
    val sorted = ranges.sortWith((a, b) =>
      FileStats.cmp(a._1, b._1).exists(_ < 0))
    var overlaps = 0L
    var i = 0
    while (i < n) {
      var j = i + 1
      var open = true
      while (j < n && open) {
        if (FileStats.cmp(sorted(j)._1, sorted(i)._2).exists(_ <= 0))
          overlaps += 1
        else open = false // mins ascend: once past this max, all are
        j += 1
      }
      i += 1
    }
    val pairs = n.toLong * (n - 1) / 2
    val row = Row(column, files.size.toLong, n.toLong, overlaps, pairs,
      if (pairs == 0) 0.0 else overlaps.toDouble / pairs)
    spark.createDataFrame(
      java.util.Collections.singletonList(row), overlapSchema)
  }
}
