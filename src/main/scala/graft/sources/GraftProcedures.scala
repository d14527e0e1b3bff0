package graft.sources

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` surface for the lake's maintenance operations — the DSv2
  * [[org.apache.spark.sql.connector.catalog.ProcedureCatalog]] half of
  * [[GraftCatalog]] (Iceberg's `CALL cat.system.rewrite_data_files`
  * design, over graft's manifest protocol):
  *
  * {{{
  *   CALL graft.compact('ns.t', num_files => 4, zorder_by => 'a,b')
  *   CALL graft.vacuum('ns.t', retention_hours => 0)
  *   CALL graft.restore('ns.t', version => 3)
  *   CALL graft.materialize_field_ids('ns.t')
  *   CALL graft.mv_create('ns.view', 'ns.t', keys => 'g', measures => 'v')
  *   CALL graft.mv_refresh('ns.view')
  * }}}
  *
  * The `system` namespace is accepted too (`CALL graft.system.compact`).
  * Tables resolve like every lake TVF ([[CdfCatalogSupport
  * .resolveTablePath]]): a name with `/` is a raw path, anything else a
  * catalog identifier. Each procedure returns a one-row result set
  * (committed version / removed-file count) via `LocalScan` — the only
  * scan shape Spark's `CALL` executes. All are `isDeterministic=false`:
  * they commit table state.
  */
object GraftProcedures {

  private val Names = Seq("compact", "vacuum", "restore",
    "materialize_field_ids", "tag", "untag", "mv_create", "mv_refresh",
    "clone", "layout_report", "cluster_health")

  private[sources] def list(namespace: Array[String]): Array[Identifier] =
    Names.map(n => Identifier.of(namespace, n)).toArray

  private[sources] def isProcedureNamespace(ns: Array[String]): Boolean =
    ns.isEmpty || (ns.length == 1 && ns.head.equalsIgnoreCase("system"))

  private[sources] def load(ident: Identifier,
      owner: GraftCatalog): Option[UnboundProcedure] =
    if (!isProcedureNamespace(ident.namespace)) None
    else ident.name.toLowerCase(java.util.Locale.ROOT) match {
      case "compact" => Some(CompactProcedure(owner))
      case "vacuum" => Some(VacuumProcedure(owner))
      case "restore" => Some(RestoreProcedure(owner))
      case "materialize_field_ids" => Some(MaterializeFieldIdsProcedure(owner))
      case "tag" => Some(TagProcedure(owner))
      case "untag" => Some(UntagProcedure(owner))
      case "mv_create" => Some(MvCreateProcedure(owner))
      case "mv_refresh" => Some(MvRefreshProcedure(owner))
      case "clone" => Some(CloneProcedure(owner))
      case "layout_report" => Some(LayoutReportProcedure(owner))
      case "cluster_health" => Some(ClusterHealthProcedure(owner))
      case _ => None
    }

  private def param(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def param(name: String, dt: DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()



  private def oneRow(schema: StructType, values: Any*): JIterator[Scan] = {
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] =
        Array(new GenericInternalRow(values.toArray))
      override def readSchema(): StructType = schema
    }
    java.util.List.of(scan).iterator()
  }

  /** Boilerplate shared by the four procedures: name-forwarding,
    * single-result-row helpers, non-determinism (all commit state), and
    * table-argument resolution — an UNQUALIFIED name ('ns.t') resolves
    * against the procedure's OWNING catalog (the one named in the CALL),
    * not the session's current catalog; qualified names and raw paths
    * go through the shared TVF resolution.
    */
  private abstract class MaintenanceProcedure extends UnboundProcedure
      with BoundProcedure {
    protected def owner: GraftCatalog
    override def description(): String = name()
    override def isDeterministic: Boolean = false
    override def bind(inputType: StructType): BoundProcedure = this

    protected def tablePath(input: InternalRow): String = {
      require(!input.isNullAt(0), "table must not be null")
      resolveName(input.getUTF8String(0).toString)
    }

    /** The same resolution for any name-typed argument. */
    protected def resolveName(name: String): String = {
      if (name.contains('/'))
        return name
      val spark = SparkSession.active
      val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(name)
      if (parts.length > 1 && org.apache.spark.sql.GraftSqlShim
          .catalogManager(spark).isCatalogRegistered(parts.head))
        CdfCatalogSupport.resolveTablePath(spark, name)
      else
        owner.tableLocation(Identifier.of(parts.init.toArray, parts.last))
    }
  }

  private case class CompactProcedure(owner: GraftCatalog)
      extends MaintenanceProcedure {
    override def name(): String = "compact"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("num_files", IntegerType, "4"),
      param("zorder_by", StringType, "NULL"),
      param("curve", StringType, "'zorder'"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val path = tablePath(input)
      val numFiles = if (input.isNullAt(1)) 4 else input.getInt(1)
      val dims =
        if (input.isNullAt(2)) Nil
        else input.getUTF8String(2).toString.split(',').toSeq
          .map(_.trim).filter(_.nonEmpty)
          .map(org.apache.spark.sql.functions.col)
      val curve =
        if (input.isNullAt(3)) "zorder" else input.getUTF8String(3).toString
      val v = VersionedTable.compact(spark, path, numFiles,
        zorderDims = dims, curve = curve)
      oneRow(StructType(Seq(StructField("version", LongType))), v)
    }
  }

  private case class VacuumProcedure(owner: GraftCatalog)
      extends MaintenanceProcedure {
    override def name(): String = "vacuum"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("keep_from", LongType, "NULL"),
      param("retention_hours", LongType, "168"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val path = tablePath(input)
      val keepFrom =
        if (input.isNullAt(1)) VersionedTable.latest(spark, path)._1
        else input.getLong(1)
      val retentionMs =
        (if (input.isNullAt(2)) 168L else input.getLong(2)) * 3600L * 1000L
      val removed = VersionedTable.vacuum(spark, path, keepFrom, retentionMs)
      oneRow(StructType(Seq(StructField("files_removed", IntegerType))),
        removed)
    }
  }

  private case class RestoreProcedure(owner: GraftCatalog)
      extends MaintenanceProcedure {
    override def name(): String = "restore"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("version", LongType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val path = tablePath(input)
      require(!input.isNullAt(1), "version must not be null")
      val v = VersionedTable.restore(spark, path, input.getLong(1))
      oneRow(StructType(Seq(
        StructField("restored_to", LongType),
        StructField("version", LongType))), input.getLong(1), v)
    }
  }

  /** `CALL graft.clone('ns.src', 'ns.dst' [, version => 5])` — deep-copy
    * a snapshot into a NEW independent table (see
    * [[VersionedTable.cloneTable]]). Null version = latest.
    */
  private case class CloneProcedure(owner: GraftCatalog)
      extends MaintenanceProcedure {
    override def name(): String = "clone"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("source", StringType),
      param("target", StringType),
      param("version", LongType, "NULL"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val src = tablePath(input)
      require(!input.isNullAt(1), "target must not be null")
      val dst = resolveName(input.getUTF8String(1).toString)
      val ver = if (input.isNullAt(2)) None else Some(input.getLong(2))
      val v = VersionedTable.cloneTable(spark, src, dst, ver)
      oneRow(StructType(Seq(
        StructField("cloned_to", StringType),
        StructField("version", LongType))),
        org.apache.spark.unsafe.types.UTF8String.fromString(dst), v)
    }
  }

  /** `CALL graft.layout_report('ns.t' [, target_file_bytes => N])` —
    * the [[TableHealth.layoutReport]] fragmentation report from one
    * manifest read. */
  private case class LayoutReportProcedure(owner: GraftCatalog)
      extends MaintenanceProcedure {
    override def name(): String = "layout_report"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("target_file_bytes", LongType, "NULL"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val path = tablePath(input)
      val target = if (input.isNullAt(1)) 128L * 1024 * 1024
        else input.getLong(1)
      val r = TableHealth.layoutReport(spark, path, target).head()
      oneRow(StructType(Seq(
        StructField("version", LongType),
        StructField("n_files", LongType),
        StructField("n_rows", LongType),
        StructField("total_bytes", LongType),
        StructField("avg_file_bytes", LongType),
        StructField("small_files", LongType),
        StructField("small_file_fraction", DoubleType),
        StructField("recommended_files", LongType))),
        r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getLong(7))
    }
  }

  /** `CALL graft.cluster_health('ns.t', 'col')` — the
    * [[TableHealth.boundsOverlap]] clustering-health report. */
  private case class ClusterHealthProcedure(owner: GraftCatalog)
      extends MaintenanceProcedure {
    override def name(): String = "cluster_health"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("column", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val path = tablePath(input)
      require(!input.isNullAt(1), "column must not be null")
      val colName = input.getUTF8String(1).toString
      val r = TableHealth.boundsOverlap(spark, path, colName).head()
      oneRow(StructType(Seq(
        StructField("column", StringType),
        StructField("n_files", LongType),
        StructField("files_with_bounds", LongType),
        StructField("overlapping_pairs", LongType),
        StructField("possible_pairs", LongType),
        StructField("overlap_fraction", DoubleType))),
        org.apache.spark.unsafe.types.UTF8String.fromString(
          r.getString(0)),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))
    }
  }

  /** `CALL graft.tag('ns.t', 'prod' [, version => 5])` — create/move a
    * named snapshot ref; RESTORE-by-number, `VERSION AS OF 'prod'` and
    * reader option versionAsOf=prod resolve it; vacuum protects it.
    */
  private case class TagProcedure(owner: GraftCatalog)
      extends MaintenanceProcedure {
    override def name(): String = "tag"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("name", StringType),
      param("version", LongType, "NULL"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val path = tablePath(input)
      require(!input.isNullAt(1), "tag name must not be null")
      val tagName = input.getUTF8String(1).toString
      val version =
        if (input.isNullAt(2)) None else Some(input.getLong(2))
      val v = VersionedTable.tag(spark, path, tagName, version)
      val pinned = VersionedTable.tags(spark, path)(tagName)
      oneRow(StructType(Seq(
        StructField("tagged_version", LongType),
        StructField("version", LongType))), pinned, v)
    }
  }

  private case class UntagProcedure(owner: GraftCatalog)
      extends MaintenanceProcedure {
    override def name(): String = "untag"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("name", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val path = tablePath(input)
      require(!input.isNullAt(1), "tag name must not be null")
      val v = VersionedTable.untag(spark, path,
        input.getUTF8String(1).toString)
      oneRow(StructType(Seq(StructField("version", LongType))), v)
    }
  }

  private case class MaterializeFieldIdsProcedure(owner: GraftCatalog)
      extends MaintenanceProcedure {
    override def name(): String = "materialize_field_ids"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("num_files", IntegerType, "4"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val path = tablePath(input)
      val numFiles = if (input.isNullAt(1)) 4 else input.getInt(1)
      val v = VersionedTable.materializeFieldIds(spark, path, numFiles)
      oneRow(StructType(Seq(StructField("version", LongType))), v)
    }
  }

  /** `CALL graft.mv_create('ns.view', 'ns.src', keys => 'g',
    * measures => 'v')` — materialize an incremental rollup view
    * ([[graft.operators.IncrementalView]]) of `source` grouped by the
    * `;`-separated `keys` with decimal-exact sum/count state per
    * `;`-separated measure (`;` because a `name=expr` spec may itself
    * contain commas). The view name may be a raw path or an
    * identifier in the owning catalog (it need not exist — the commit
    * protocol lands at its warehouse location and the catalog lists it
    * from then on). Returns the source version the view reflects.
    */
  private case class MvCreateProcedure(owner: GraftCatalog)
      extends MaintenanceProcedure {
    override def name(): String = "mv_create"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("view", StringType),
      param("source", StringType),
      param("keys", StringType),
      param("measures", StringType),
      param("scale", IntegerType, "2"),
      param("minmax", StringType, "NULL"),
      param("approx_distinct", StringType, "NULL"),
      param("quantile", StringType, "NULL"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      require(!input.isNullAt(0), "view must not be null")
      val viewName = input.getUTF8String(0).toString
      val view =
        if (viewName.contains('/')) viewName
        else {
          val parts = spark.sessionState.sqlParser
            .parseMultipartIdentifier(viewName)
          // accept the owner-qualified form too ('gmv.ns.view' in
          // CALL gmv.mv_create) — same resolution every other name
          // argument gets; creating into ANOTHER catalog is refused
          val local =
            if (parts.length > 1 && org.apache.spark.sql.GraftSqlShim
                .catalogManager(spark).isCatalogRegistered(parts.head)) {
              require(parts.head.equalsIgnoreCase(owner.name()),
                s"mv_create creates the view in its own catalog " +
                  s"('${owner.name()}'); got '$viewName'")
              parts.tail
            } else parts
          owner.plannedTableLocation(
            Identifier.of(local.init.toArray, local.last))
        }
      require(!input.isNullAt(1), "source must not be null")
      val source = resolveName(input.getUTF8String(1).toString)
      // ';'-separated like the operator's property encoding — a
      // name=expr spec may itself contain commas (e.g. 'b=round(v, 1)')
      def specList(i: Int, what: String): Seq[String] = {
        require(!input.isNullAt(i), s"$what must not be null")
        input.getUTF8String(i).toString.split(';').toSeq
          .map(_.trim).filter(_.nonEmpty)
      }
      val scale = if (input.isNullAt(4)) 2 else input.getInt(4)
      def optList(i: Int): Seq[String] =
        if (input.isNullAt(i)) Nil
        else input.getUTF8String(i).toString.split(';').toSeq
          .map(_.trim).filter(_.nonEmpty)
      graft.operators.IncrementalView.create(spark, source, view,
        specList(2, "keys"), specList(3, "measures"), scale,
        optList(5), optList(6), optList(7))
      val stamped = VersionedTable.tableProperties(spark, view)(
        graft.operators.IncrementalView.SourceVersionProperty).toLong
      oneRow(StructType(Seq(StructField("source_version", LongType))),
        stamped)
    }
  }

  /** `CALL graft.mv_refresh('ns.view')` — fold the source commits past
    * the view's stamp into it via the change-data-feed. Returns the
    * number of source versions applied (0 = already fresh).
    */
  private case class MvRefreshProcedure(owner: GraftCatalog)
      extends MaintenanceProcedure {
    override def name(): String = "mv_refresh"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("view", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val path = tablePath(input)
      val applied = graft.operators.IncrementalView.refresh(spark, path)
      oneRow(StructType(Seq(StructField("versions_applied", LongType))),
        applied)
    }
  }
}
