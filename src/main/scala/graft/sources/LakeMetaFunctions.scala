package graft.sources

import org.apache.spark.sql.{GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL metadata tables for the versioned lake — the Iceberg
  * `db.t.history` / `db.t.files` metadata-table idea and Delta's
  * `DESCRIBE HISTORY`, surfaced as table-valued functions (the same
  * mechanism as `table_changes`):
  *
  *   SELECT * FROM graft_history('graft.ns.t')   -- one row per commit
  *   SELECT * FROM graft_files('graft.ns.t')     -- one row per live file
  *
  * Both are pure manifest reads — one row per commit / per data file,
  * never a data scan, so they stay cheap at any table size (a 100 TB
  * snapshot's metadata is a few thousand manifest lines). Accepts a
  * catalog identifier or a raw `/path` like `table_changes`.
  */
object LakeMetaFunctions {

  private def tableArg(args: Seq[Expression], fn: String): String = {
    require(args.size == 1, s"$fn(table) takes 1 argument, got ${args.size}")
    require(args.head.foldable, s"$fn: table name must be a literal")
    args.head.eval() match {
      case null =>
        throw new IllegalArgumentException(s"$fn: table must not be null")
      case s => CdfCatalogSupport.resolveTablePath(
        SparkSession.active, s.toString)
    }
  }

  /** `graft_history('t')`: commit version, time, operation, file delta,
    * and streaming-txn watermarks — [[VersionedTable.history]] plus the
    * commit timestamp that backs `TIMESTAMP AS OF`.
    */
  def history(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val path = tableArg(args, "graft_history")
    val times = VersionedTable.versionTimestamps(spark, path).toMap
    import spark.implicits._
    val df = VersionedTable.history(spark, path)
    val withTime = df.as[(Long, Option[String], Int, Int, Map[String, Long])]
      .map { case (v, op, added, removed, txns) =>
        (v, new java.sql.Timestamp(times.getOrElse(v, 0L)),
          op, added, removed, txns)
      }
      .toDF("version", "commit_time", "op", "files_added",
        "files_removed", "txns")
    GraftSqlShim.analyzed(withTime)
  }

  /** `graft_files('t')`: the live snapshot's data files with their
    * manifest statistics — committed version, row count, byte size and
    * the raw per-column bounds JSON (absent stats → nulls).
    */
  def files(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val path = tableArg(args, "graft_files")
    val (version, names) = VersionedTable.latest(spark, path)
    val stats = VersionedTable.parsedStatsAt(spark, path, Some(version))
    val provenance = VersionedTable.fileVersions(spark, path)
    import spark.implicits._
    val rows = names.map { n =>
      val s = stats.get(n)
      (n, provenance.getOrElse(n, 0L),
        s.flatMap(_.rows), s.flatMap(_.bytes),
        s.map(st => FileStats.render(st.copy(rows = None, bytes = None))))
    }
    GraftSqlShim.analyzed(rows.toDF(
      "file", "committed_version", "row_count", "size_bytes", "stats"))
  }
}
