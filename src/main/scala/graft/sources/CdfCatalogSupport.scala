package graft.sources

import org.apache.spark.sql.{GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StructType

/** Catalog-level access to the change data feed.
  *
  * The path-based CDF source (`spark.read.format("graft-table")
  * .option("readChangeFeed", true).load(path)`) covers API users; these
  * two pieces give CATALOG and SQL users the same feed:
  *
  *  1. [[ResolveCdfRead]] — an analyzer rule that honors
  *     `option("readChangeFeed", true)` on `spark.read.table(...)` and
  *     `spark.readStream.table(...)`: the catalog resolves the
  *     identifier to a [[GraftTable]] as usual, then the rule swaps the
  *     relation for the table's [[GraftCdfTable]] twin (whose schema
  *     appends `_change_type`/`_commit_version`). Reference analog:
  *     Delta's CDCReader option handling on catalog tables.
  *
  *  2. `table_changes('catalog.ns.t' | '/path', from [, to])` — a SQL
  *     table-valued function (registered by [[graft.GraftExtensions]])
  *     over the same scan, with Delta-parity INCLUSIVE version bounds.
  *     Pure SQL cannot pass reader options, so this is the SQL surface
  *     of the feed.
  *
  * Both reuse the DSv2 CDF scan unchanged — streaming offsets, commit
  * pruning, and the exactly-once mirror semantics are identical to the
  * path-based feed.
  */
object CdfCatalogSupport {

  private def wantsCdf(
      opts: org.apache.spark.sql.util.CaseInsensitiveStringMap): Boolean = {
    val cdf = opts.getBoolean(GraftTableScan.ReadChangeFeedOption, false)
    require(!cdf || !opts.containsKey(GraftTableScan.VersionAsOfOption),
      "readChangeFeed cannot combine with versionAsOf — the feed IS the " +
        "history; bound it with startingVersion/endingVersion instead")
    cdf
  }

  private def attrsOf(schema: StructType): Seq[AttributeReference] =
    schema.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable, f.metadata)())

  /** Swap catalog-resolved graft relations carrying
    * `readChangeFeed=true` for their CDF twin. Safe as a fix-point
    * resolution rule: the swap happens while the relation is a leaf
    * being resolved (reader options only exist on
    * `spark.read[Stream].table`, where the relation is analyzed alone
    * before any parent operators are added).
    */
  case class ResolveCdfRead(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.resolveOperators {
        case r @ DataSourceV2Relation(
            t: GraftTable, _, _, _, options, tt)
            if wantsCdf(options) =>
          // Spark consumes option("versionAsOf", ...) into the
          // relation's TimeTravelSpec before this rule sees it
          require(tt.isEmpty,
            "readChangeFeed cannot combine with versionAsOf/VERSION AS " +
              "OF — the feed IS the history; bound it with " +
              "startingVersion/endingVersion instead")
          val cdf = t.changeFeedTable
          r.copy(table = cdf, output = attrsOf(cdf.schema()))
        case s @ StreamingRelationV2(
            _, _, t: GraftTable, opts, _, _, _, _) if wantsCdf(opts) =>
          val cdf = t.changeFeedTable
          s.copy(table = cdf, output = attrsOf(cdf.schema()))
      }
  }

  /** `table_changes(table, fromVersion [, toVersion])` — bounds are
    * INCLUSIVE commit versions (Delta parity); the scan's
    * `startingVersion` option is exclusive, so `from` maps to
    * `from - 1` with a floor at 0 (= full history).
    */
  def tableChanges(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 2 || args.size == 3,
      "table_changes(table, fromVersion[, toVersion]) takes 2 or 3 " +
        s"arguments, got ${args.size}")
    def str(e: Expression, what: String): String = {
      require(e.foldable, s"table_changes: $what must be a literal")
      e.eval() match {
        case null => throw new IllegalArgumentException(
          s"table_changes: $what must not be null")
        case s => s.toString
      }
    }
    def num(e: Expression, what: String): Long = {
      require(e.foldable, s"table_changes: $what must be a literal")
      e.eval() match {
        case n: Number => n.longValue
        case other => throw new IllegalArgumentException(
          s"table_changes: $what must be an integer, got $other")
      }
    }
    val spark = SparkSession.active
    val path = resolveTablePath(spark, str(args.head, "table name"))
    val from = num(args(1), "fromVersion")
    var reader = spark.read.format("graft-table")
      .option(GraftTableScan.ReadChangeFeedOption, "true")
      .option("startingVersion",
        (if (from <= 0L) 0L else from - 1L).toString)
    args.lift(2).foreach(e => reader =
      reader.option("endingVersion", num(e, "toVersion").toString))
    GraftSqlShim.analyzed(reader.load(path))
  }

  /** A name containing `/` is a raw table path; otherwise it is a
    * (possibly qualified) catalog identifier resolved against the
    * session's current catalog/namespace — which must be a
    * [[GraftCatalog]]. Shared by every lake TVF
    * (`table_changes`, [[LakeMetaFunctions]]).
    */
  private[sources] def resolveTablePath(spark: SparkSession,
      name: String): String = {
    if (name.contains('/')) return name
    val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(name)
    val cm = GraftSqlShim.catalogManager(spark)
    val (plugin, rest) =
      if (parts.length > 1 && cm.isCatalogRegistered(parts.head))
        (cm.catalog(parts.head), parts.tail)
      else (cm.currentCatalog, parts)
    val g = plugin match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"table_changes: catalog '${other.name}' is not a graft catalog " +
          "— qualify the table (e.g. table_changes('graft.ns.t', 1)) or " +
          "pass its path")
    }
    val ns =
      if (rest.length > 1) rest.init.toArray
      else cm.currentNamespace
    g.tableLocation(Identifier.of(ns, rest.last))
  }
}
