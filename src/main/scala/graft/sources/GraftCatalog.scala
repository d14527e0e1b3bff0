package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A Spark `TableCatalog` over a warehouse directory of versioned lake
  * tables — the full SQL catalog surface for `graft-table`:
  *
  * {{{
  *   spark.sql.catalog.graft            = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.warehouse  = /lake/warehouse
  *
  *   CREATE NAMESPACE graft.bronze
  *   CREATE TABLE graft.bronze.events (k BIGINT, v STRING)
  *   CREATE TABLE graft.bronze.top AS SELECT * FROM src      -- atomic CTAS
  *   INSERT INTO graft.bronze.events VALUES (1, 'a')
  *   ALTER TABLE graft.bronze.events ADD COLUMNS (score DOUBLE)
  *   SELECT * FROM graft.bronze.events VERSION AS OF 3        -- time travel
  *   UPDATE / DELETE / MERGE INTO graft.bronze.events ...     -- row-level ops
  *   SHOW TABLES IN graft.bronze; DROP TABLE graft.bronze.events
  * }}}
  *
  * Identifier → location is pure layout: `warehouse/ns…/name`, a table
  * being any directory with a `_commits` manifest log. There is NO
  * separate metastore — the manifests ARE the metadata (schema included,
  * since [[VersionedTable.create]] records a `#schema` line), so the
  * catalog stays correct under concurrent writers on any fanout of
  * sessions sharing the warehouse path, exactly like path-addressed
  * Delta tables.
  *
  * CTAS is ATOMIC via [[StagingTableCatalog]]: `stageCreate` publishes
  * nothing; the staged write appends data files and the FIRST manifest
  * commit (which also records the declared schema) makes table+data
  * visible in one atomic step. A failed query aborts by deleting the
  * never-committed directory — readers can never observe an empty or
  * half-written CTAS target.
  *
  * Capability notes: partitioning transforms are refused (layout is
  * managed by z-order compaction instead — see
  * [[VersionedTable.compact]]); `REPLACE TABLE` is refused (use
  * `INSERT OVERWRITE`); `ALTER` supports column-append evolution plus
  * no-op property changes.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog with FunctionCatalog with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  // ---------- procedures (SQL CALL maintenance surface) ----------

  /** `CALL graft.compact/vacuum/restore/materialize_field_ids(...)` —
    * see [[GraftProcedures]]. Accepted bare or under the conventional
    * `system` namespace.
    */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (GraftProcedures.isProcedureNamespace(namespace))
      GraftProcedures.list(namespace)
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident, this).getOrElse(
      throw new IllegalArgumentException(
        s"no such procedure $name.${ident}: expected one of " +
          GraftProcedures.list(Array.empty).map(_.name).mkString(", ")))

  // ---------- functions (storage-partitioned-join support) ----------

  /** The catalog function namespace holds exactly [[GraftBucketFunction]]:
    * Spark resolves a scan's `KeyGroupedPartitioning(bucket(n, col))`
    * keys through the table's owning catalog, so without this hook no
    * bucketed scan could ever report a usable partitioning.
    */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) Array(Identifier.of(Array.empty, "bucket"))
    else if (fsys.exists(nsPath(namespace))) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace.isEmpty && ident.name == "bucket")
      GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = options.get("warehouse")
    require(w != null && w.nonEmpty,
      s"catalog $name needs spark.sql.catalog.$name.warehouse")
    warehouse = new Path(w).toString
  }

  override def name(): String = catalogName

  private def spark = SparkSession.active
  private def fsys: FileSystem =
    new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** path-safe identifier part: no separators, no traversal, no hidden
    * or metadata-colliding names
    */
  private def checkPart(part: String): String = {
    require(part.nonEmpty && !part.contains("/") && !part.contains("\\") &&
      part != "." && part != ".." && !part.startsWith("_") &&
      !part.startsWith("."),
      s"illegal catalog identifier part: '$part'")
    part
  }

  private def nsPath(ns: Array[String]): Path =
    ns.foldLeft(new Path(warehouse))((p, n) => new Path(p, checkPart(n)))

  private def tableDir(ident: Identifier): Path =
    new Path(nsPath(ident.namespace), checkPart(ident.name))

  private def isTable(p: Path): Boolean =
    fsys.exists(new Path(p, "_commits"))

  /** Warehouse location of a catalog table — the bridge `table_changes`
    * and other path-based surfaces use to reach a catalog-identified
    * table.
    */
  private[graft] def tableLocation(ident: Identifier): String = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    dir.toString
  }

  /** Warehouse location a NEW table of this name would occupy (the
    * table need not exist yet — `CALL mv_create` materializes into it;
    * once the commit protocol lands there the catalog lists it like
    * any other table). The namespace must exist.
    */
  private[graft] def plannedTableLocation(ident: Identifier): String = {
    val ns = nsPath(ident.namespace)
    if (!fsys.exists(ns)) throw new NoSuchNamespaceException(ident.namespace)
    tableDir(ident).toString
  }

  // ---------- tables ----------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace)
    if (!fsys.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fsys.listStatus(dir).filter(s => s.isDirectory && isTable(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    try isTable(tableDir(ident)) catch {
      case _: IllegalArgumentException => false
    }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val path = dir.toString
    val schema = VersionedTable.tableSchema(spark, path).getOrElse {
      val (_, files) = VersionedTable.latest(spark, path)
      if (files.isEmpty) throw new NoSuchTableException(ident)
      spark.read.parquet(s"$path/${files.head}").schema
    }
    new GraftTable(path, schema,
      tableProps = VersionedTable.tableProperties(spark, path))
  }

  /** SQL `VERSION AS OF <v>`: a read-only table pinned to one committed
    * snapshot, under the schema that snapshot was committed with.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val path = dir.toString
    // a bare number is a commit version; anything else resolves as a
    // TAG name (named snapshot ref — `VERSION AS OF 'prod'`)
    val v = VersionedTable.resolveVersionRef(spark, path, version)
    val schema = VersionedTable.tableSchema(spark, path, v).getOrElse {
      val files = VersionedTable.filesAt(spark, path, v) // throws if absent
      require(files.nonEmpty, s"version $v of $path is empty")
      spark.read.parquet(s"$path/${files.head}").schema
    }
    new GraftTable(path, schema, pinnedVersion = Some(v))
  }

  /** SQL `TIMESTAMP AS OF <t>`: the newest snapshot committed at or
    * before `timestamp` (microseconds since epoch, per the connector
    * contract). Commit time = the manifest file's mtime — written once,
    * atomically, so it is a faithful commit clock.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val tsMillis = timestamp / 1000L
    val v = VersionedTable.versionTimestamps(spark, dir.toString)
      .filter(_._2 <= tsMillis).map(_._1).maxOption.getOrElse(
        throw new NoSuchElementException(
          s"no commit of ${ident.name} at or before timestamp " +
            s"${java.time.Instant.ofEpochMilli(tsMillis)} (earliest " +
            "retained commit is newer, or the table was vacuumed past it)"))
    loadTable(ident, v.toString)
  }

  /** User-declared TBLPROPERTIES, minus the engine-reserved keys Spark
    * injects into every DDL (provider/location/owner/...). These are
    * persisted at CREATE so e.g. `TBLPROPERTIES('graft.clusterBy'='k')`
    * takes effect from the table's first append.
    */
  private def userProps(properties: JMap[String, String]): Map[String, String] =
    properties.asScala.toMap -- Seq(TableCatalog.PROP_PROVIDER,
      TableCatalog.PROP_LOCATION, TableCatalog.PROP_COMMENT,
      TableCatalog.PROP_OWNER, TableCatalog.PROP_EXTERNAL,
      TableCatalog.PROP_IS_MANAGED_LOCATION)

  private def declaredClusterCols(props: Map[String, String]): Seq[String] =
    props.get(VersionedTable.ClusterByProperty).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  /** CREATE-time layout transforms folded into the clustering property.
    * graft has ONE physical layout mechanism — range clustering + the
    * manifest's per-file stats bounds — so `CLUSTER BY` maps directly,
    * and identity / temporal (`years`/`months`/`days`/`hours`)
    * `PARTITIONED BY` transforms map to clustering on their source
    * columns: queries on the partition column still prune (file
    * skipping on tight stats bounds), with none of the
    * small-file/directory explosion hive-style partitioning hits at
    * 100 TB key cardinalities. Hash buckets have no range equivalent
    * and are refused. The folded spec is preflight-validated against
    * the declared schema, so a bad layout fails the DDL itself.
    */
  private def layoutProps(partitions: Array[Transform],
      properties: JMap[String, String], schema: StructType,
      what: String): JMap[String, String] = {
    import org.apache.spark.sql.connector.expressions._
    if (partitions.isEmpty) {
      Option(properties.get(VersionedTable.ClusterByProperty)).foreach(
        VersionedTable.validateClusterSpec(_, Some(schema), what))
      return properties
    }
    def single(r: NamedReference): String = {
      require(r.fieldNames.length == 1, s"$what: nested column " +
        s"'${r.fieldNames.mkString(".")}' cannot drive clustering")
      r.fieldNames.head
    }
    val temporal = Set("years", "months", "days", "hours")
    val cols = partitions.toSeq.flatMap {
      case ClusterByTransform(refs) => refs.map(single)
      case t if t.name == "identity" || temporal(t.name) =>
        t.references.toSeq.map(single)
      case t => throw new UnsupportedOperationException(
        s"$what: transform '$t' has no graft-table layout equivalent — " +
          "use CLUSTER BY, an identity or temporal PARTITIONED BY " +
          "column, or z-order compaction after load")
    }.distinct
    val spec = cols.mkString(",")
    Option(properties.get(VersionedTable.ClusterByProperty)).foreach(p =>
      require(p.split(',').map(_.trim).filter(_.nonEmpty).toSeq == cols,
        s"$what: declared layout ($spec) conflicts with TBLPROPERTIES " +
          s"${VersionedTable.ClusterByProperty}='$p'"))
    VersionedTable.validateClusterSpec(spec, Some(schema), what)
    val m = new java.util.HashMap[String, String](properties)
    m.put(VersionedTable.ClusterByProperty, spec)
    m
  }

  // declared so the SQL CHECK-constraint DDL reaches this catalog:
  // CREATE TABLE (..., CONSTRAINT n CHECK (p)) and ALTER TABLE ADD
  // CONSTRAINT route through TableInfo.constraints / AddConstraint
  // below instead of failing analysis. COLUMN_DEFAULT_VALUE turns on
  // the whole defaults surface: CREATE ... DEFAULT columns arrive with
  // CURRENT_DEFAULT/EXISTS_DEFAULT field metadata (Spark constant-folds
  // the exists value), INSERTs that omit a defaulted column are filled
  // by the analyzer from Table.columns(), and ALTER ... ADD COLUMN /
  // SET/DROP DEFAULT route through the TableChanges handled below.
  override def capabilities(): java.util.Set[TableCatalogCapability] =
    java.util.EnumSet.of(TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  /** DSv2 `Check` → the `graft.constraint.<name>` property the engine
    * enforces; every other constraint kind (PRIMARY KEY / UNIQUE /
    * FOREIGN KEY) is unenforceable here and refused loudly rather than
    * recorded as a fiction.
    */
  private def constraintProp(
      c: org.apache.spark.sql.connector.catalog.constraints.Constraint)
      : (String, String) = c match {
    case ck: org.apache.spark.sql.connector.catalog.constraints.Check
        if ck.predicateSql() != null =>
      VersionedTable.ConstraintPrefix + ck.name() -> ck.predicateSql()
    case other => throw new UnsupportedOperationException(
      s"graft-table supports CHECK constraints only, got ${other.toDDL}")
  }

  override def createTable(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): Table =
    createTable(ident, info.schema(), info.partitions(),
      withConstraintProps(info))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties0: JMap[String, String]): Table = {
    val properties = layoutProps(partitions, properties0, schema,
      "CREATE TABLE")
    VersionedTable.validateSchemaDefaults(spark, schema,
      s"CREATE TABLE $ident")
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    if (ident.namespace.nonEmpty && !fsys.exists(nsPath(ident.namespace)))
      throw new NoSuchNamespaceException(ident.namespace)
    try VersionedTable.create(spark, dir.toString, schema)
    catch {
      case _: IllegalStateException => // lost the create race
        throw new TableAlreadyExistsException(ident)
    }
    // a props commit right after create: nobody holds a handle to the
    // ident before createTable returns, so the two-commit birth is
    // invisible. A validation failure (bad clusterBy column, reserved
    // CDF name) must not leave a half-created table — undo the create.
    val props = userProps(properties)
    if (props.nonEmpty)
      try VersionedTable.alterProperties(spark, dir.toString, props)
      catch {
        case e: Throwable =>
          VersionedTable.invalidateCache(dir.toString)
          fsys.delete(dir, true)
          throw e
      }
    new GraftTable(dir.toString, schema)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val sets = changes.collect { case p: TableChange.SetProperty =>
      p.property -> p.value }
    val unsets = changes.collect { case p: TableChange.RemoveProperty =>
      p.property }
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    val moves = changes.collect {
      case m: TableChange.UpdateColumnPosition => m }
    val addCons = changes.collect { case a: TableChange.AddConstraint => a }
    val dropCons = changes.collect { case d: TableChange.DropConstraint => d }
    val setDefaults = changes.collect {
      case u: TableChange.UpdateColumnDefaultValue => u }
    changes.foreach {
      case _: TableChange.AddColumn | _: TableChange.SetProperty |
          _: TableChange.RemoveProperty | _: TableChange.RenameColumn |
          _: TableChange.DeleteColumn |
          _: TableChange.UpdateColumnPosition |
          _: TableChange.AddConstraint | _: TableChange.DropConstraint |
          _: TableChange.UpdateColumnDefaultValue => ()
      case other => throw new UnsupportedOperationException(
        s"graft-table ALTER supports ADD/RENAME/DROP COLUMN, " +
          s"FIRST/AFTER positions, CHECK constraints, column DEFAULTs " +
          s"and table properties, got $other")
    }
    if (sets.nonEmpty || unsets.nonEmpty)
      VersionedTable.alterProperties(spark, dir.toString, sets.toMap,
        unsets.toSeq)
    // ADD runs the same path as a property SET — alterProperties
    // analyzes the predicate and scans the current snapshot, so an
    // invalid or violated constraint fails the DDL itself
    addCons.foreach(a => VersionedTable.alterProperties(spark,
      dir.toString, Map(constraintProp(a.constraint()))))
    dropCons.foreach { d =>
      val key = VersionedTable.ConstraintPrefix + d.name()
      if (VersionedTable.tableProperties(spark, dir.toString).contains(key))
        VersionedTable.alterProperties(spark, dir.toString,
          Map.empty, Seq(key))
      else if (!d.ifExists) throw new IllegalArgumentException(
        s"no CHECK constraint '${d.name}' on $ident")
    }
    // multi-part field names address nested struct fields (dotted path)
    renames.foreach(r => VersionedTable.renameColumn(spark, dir.toString,
      r.fieldNames.mkString("."), r.newName))
    drops.foreach(d => VersionedTable.dropColumn(spark, dir.toString,
      d.fieldNames.mkString(".")))
    moves.foreach { m =>
      val pos = m.position() match {
        case _: TableChange.First => VersionedTable.ColumnPosition.First
        case a: TableChange.After =>
          VersionedTable.ColumnPosition.After(a.column())
        case other => throw new UnsupportedOperationException(
          s"unknown column position $other")
      }
      VersionedTable.moveColumn(spark, dir.toString,
        m.fieldNames.mkString("."), pos)
    }
    if (adds.nonEmpty) {
      val fields = adds.map { a =>
        require(a.fieldNames.length == 1,
          s"nested ADD COLUMN not supported: ${a.fieldNames.mkString(".")}")
        require(a.position() == null,
          "FIRST/AFTER column positions not supported — columns append")
        // ADD COLUMN ... DEFAULT: CURRENT_DEFAULT drives future inserts;
        // EXISTS_DEFAULT (the folded literal) is what rows written
        // BEFORE this commit read back — fixed here, at column birth,
        // and never changed by a later SET DEFAULT (Iceberg
        // initial-default semantics; the scan's parquet reader fills it
        // for files lacking the field)
        val meta = Option(a.defaultValue()) match {
          case Some(dv) =>
            val lit = dv.getValue()
            // the direct TableChange API can carry an expression-only
            // DefaultValue (SQL text, no folded literal) — refuse it the
            // same loud way the SET DEFAULT path below does, instead of
            // NPEing at lit.value()
            if (lit == null) throw new UnsupportedOperationException(
              s"ADD COLUMN ${a.fieldNames.head}: expression-only default " +
                "(no literal value) is not supported — provide a literal " +
                "default")
            val litSql = org.apache.spark.sql.catalyst.expressions
              .Literal(lit.value(), lit.dataType()).sql
            val cur = Option(dv.getSql).filter(_.nonEmpty).getOrElse(litSql)
            new org.apache.spark.sql.types.MetadataBuilder()
              .putString(VersionedTable.CurrentDefaultKey, cur)
              .putString(VersionedTable.ExistsDefaultKey, litSql)
              .build()
          case None => org.apache.spark.sql.types.Metadata.empty
        }
        org.apache.spark.sql.types.StructField(a.fieldNames.head, a.dataType,
          nullable = true, // appended columns must be nullable: old rows
                           // have no value (addColumns enforces it too)
          metadata = meta)
      }
      VersionedTable.validateSchemaDefaults(spark,
        org.apache.spark.sql.types.StructType(fields),
        s"ALTER TABLE $ident ADD COLUMNS")
      VersionedTable.addColumns(spark, dir.toString, fields)
    }
    // SET DEFAULT carries the new SQL text; DROP DEFAULT arrives as an
    // empty/absent value. EXISTS_DEFAULT is untouched either way. A
    // DefaultValue built from a V2 expression with NO SQL text must be
    // refused loudly — treating it as a drop would silently null future
    // inserts.
    setDefaults.foreach { u =>
      require(u.fieldNames.length == 1,
        s"nested column DEFAULT not supported: ${u.fieldNames.mkString(".")}")
      val cur = Option(u.newCurrentDefault())
      val sql = cur.flatMap(d => Option(d.getSql).filter(_.nonEmpty))
        .orElse(Option(u.newDefaultValue()).filter(_.nonEmpty))
      if (cur.isDefined && sql.isEmpty)
        throw new UnsupportedOperationException(
          s"SET DEFAULT on ${u.fieldNames.head}: expression-only default " +
            "(no SQL text) is not supported — provide the SQL form")
      VersionedTable.setColumnDefault(spark, dir.toString,
        u.fieldNames.head, sql)
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) false
    else {
      VersionedTable.invalidateCache(dir.toString)
      fsys.delete(dir, true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tableDir(oldIdent)
    val to = tableDir(newIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent)
    if (newIdent.namespace.nonEmpty && !fsys.exists(nsPath(newIdent.namespace)))
      throw new NoSuchNamespaceException(newIdent.namespace)
    VersionedTable.invalidateCache(from.toString)
    VersionedTable.invalidateCache(to.toString)
    if (!fsys.rename(from, to)) throw new java.io.IOException(
      s"failed to rename $from to $to")
  }

  // ---------- atomic CTAS ----------

  /** Stage a CREATE TABLE AS SELECT without publishing anything: the
    * write's first manifest commit (data files + `#schema` + `#op
    * create`) is the atomic point of table creation. Abort deletes the
    * never-committed directory.
    */
  override def stageCreate(ident: Identifier, ctasSchema: StructType,
      partitions: Array[Transform], properties0: JMap[String, String])
      : StagedTable = {
    // resolved OUTSIDE the anonymous StagedTable: inside it, a bare
    // `properties` silently resolves to Table's default properties()
    // (empty map), not this method's parameter
    val declaredProps = userProps(layoutProps(partitions, properties0,
      ctasSchema, "CREATE TABLE AS SELECT"))
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    if (ident.namespace.nonEmpty && !fsys.exists(nsPath(ident.namespace)))
      throw new NoSuchNamespaceException(ident.namespace)
    val path = dir.toString
    val inner = new GraftTable(path, ctasSchema,
      pendingClusterBy = declaredClusterCols(declaredProps))
    new StagedTable with SupportsWrite {
      override def name(): String = inner.name()
      @annotation.nowarn("cat=deprecation")
      override def schema(): StructType = ctasSchema
      override def capabilities(): java.util.Set[TableCapability] =
        inner.capabilities()
      override def newWriteBuilder(
          info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
          : org.apache.spark.sql.connector.write.WriteBuilder =
        inner.newWriteBuilder(info)
      override def commitStagedChanges(): Unit = {
        // the CTAS write appended data under a fresh table dir; its
        // commit (v1) carried no schema line (the table had none yet), so
        // record the declared schema now. An EMPTY CTAS result never
        // wrote — create the empty typed table here, still one visible
        // transition.
        if (VersionedTable.latest(spark, path)._1 == 0L)
          VersionedTable.create(spark, path, ctasSchema, ifNotExists = true)
        else if (VersionedTable.tableSchema(spark, path).isEmpty)
          VersionedTable.declareSchema(spark, path, ctasSchema)
        // TBLPROPERTIES land with the creating commit's epoch (the
        // CTAS data was already laid out: the write clustered on the
        // declared columns via pendingClusterBy). A validation failure
        // throws → Spark aborts the staged table.
        if (declaredProps.nonEmpty)
          VersionedTable.alterProperties(spark, path, declaredProps)
      }
      override def abortStagedChanges(): Unit = {
        // nothing was committed under this ident unless the write's
        // append landed; an aborted CTAS removes the whole staged dir
        VersionedTable.invalidateCache(path)
        fsys.delete(dir, true)
        ()
      }
    }
  }

  /** Stage a REPLACE TABLE [AS SELECT]: the replacement data writes
    * into the live table dir under staged (manifest-invisible) names,
    * and ONE `replace-table` commit flips data + schema together —
    * readers see the old table until that instant, and a failed
    * replacement (e.g. the SELECT throws) leaves it untouched. Old
    * versions stay time-travelable under their own schemas.
    */
  override def stageReplace(ident: Identifier, replSchema: StructType,
      partitions: Array[Transform], properties0: JMap[String, String])
      : StagedTable = {
    // resolved OUTSIDE the anonymous StagedTable (see stageCreate)
    val declaredProps = userProps(layoutProps(partitions, properties0,
      replSchema, "REPLACE TABLE"))
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val path = dir.toString
    val inner = new GraftTable(path, replSchema)
    new StagedTable with SupportsWrite {
      @volatile private var replaced = false
      override def name(): String = inner.name()
      @annotation.nowarn("cat=deprecation")
      override def schema(): StructType = replSchema
      override def capabilities(): java.util.Set[TableCapability] =
        inner.capabilities()
      override def newWriteBuilder(
          info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
          : org.apache.spark.sql.connector.write.WriteBuilder =
        new org.apache.spark.sql.connector.write.WriteBuilder
          with org.apache.spark.sql.connector.write.SupportsTruncate {
          // RTAS plans an overwrite-by-truncate; replaceTable IS a
          // whole-snapshot flip, so truncate changes nothing here
          override def truncate()
              : org.apache.spark.sql.connector.write.WriteBuilder = this
          override def build(): org.apache.spark.sql.connector.write.Write =
            new org.apache.spark.sql.connector.write.V1Write {
              override def toInsertableRelation()
                  : org.apache.spark.sql.sources.InsertableRelation =
                new org.apache.spark.sql.sources.InsertableRelation {
                  override def insert(data: org.apache.spark.sql.DataFrame,
                      overwrite: Boolean): Unit = {
                    // Spark aligned the query to replSchema positionally
                    val want = replSchema.fieldNames.toSeq
                    val clean = data.drop(GraftTableScan.VersionCol)
                    require(clean.columns.length == want.length,
                      s"cannot replace with ${clean.columns.toSeq} under " +
                        s"schema $want")
                    // declared layout applies to the replacement data
                    // itself — the property commit follows the flip
                    val cc = declaredClusterCols(declaredProps)
                      .filter(_ => declaredClusterCols(declaredProps)
                        .forall(c => want.exists(_.equalsIgnoreCase(c))))
                    VersionedTable.replaceTable(data.sparkSession,
                      VersionedTable.clusterFrame(clean.toDF(want: _*), cc),
                      path, replSchema, sortedBy = cc)
                    replaced = true
                    ()
                  }
                }
            }
        }
      override def commitStagedChanges(): Unit = {
        // plain REPLACE TABLE (no AS SELECT) never ran a write — flip
        // to an empty table under the new schema, still one commit
        if (!replaced) {
          VersionedTable.replaceTable(spark,
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              replSchema), path, replSchema)
          ()
        }
        // a replace-table commit carries only txn watermarks — old
        // properties are RESET (Delta REPLACE semantics); the declared
        // TBLPROPERTIES/layout then land fresh. Validated up front
        // (layoutProps preflight), so this cannot fail post-flip.
        if (declaredProps.nonEmpty)
          VersionedTable.alterProperties(spark, path, declaredProps)
        ()
      }
      override def abortStagedChanges(): Unit = ()
        // nothing committed: staged-but-unreferenced files (if the
        // write died mid-flight) are invisible and reaped by vacuum
    }
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String])
      : StagedTable =
    if (tableExists(ident)) stageReplace(ident, schema, partitions, properties)
    else stageCreate(ident, schema, partitions, properties)

  // TableInfo variants: fold declared CHECK constraints into the
  // property map the StructType forms consume, so CTAS/RTAS with a
  // constraint enforces it on the INITIAL data write too (the props —
  // including constraints — commit before the staged data in
  // commitStagedChanges). The interface defaults would drop them.
  private def withConstraintProps(
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : JMap[String, String] = {
    val props = new java.util.HashMap[String, String](info.properties())
    info.constraints().map(constraintProp).foreach {
      case (k, v) => props.put(k, v) }
    props
  }
  override def stageCreate(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable =
    stageCreate(ident, info.schema(), info.partitions(),
      withConstraintProps(info))
  override def stageReplace(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable =
    stageReplace(ident, info.schema(), info.partitions(),
      withConstraintProps(info))
  override def stageCreateOrReplace(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable =
    stageCreateOrReplace(ident, info.schema(), info.partitions(),
      withConstraintProps(info))

  // ---------- namespaces ----------

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = nsPath(namespace)
    if (namespace.nonEmpty && !fsys.exists(dir))
      throw new NoSuchNamespaceException(namespace)
    if (!fsys.exists(dir)) return Array.empty
    fsys.listStatus(dir)
      .filter(s => s.isDirectory && !isTable(s.getPath) &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(s => namespace :+ s.getPath.getName)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (try { val p = nsPath(namespace); fsys.exists(p) && !isTable(p) }
       catch { case _: IllegalArgumentException => false })

  override def loadNamespaceMetadata(
      namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Map(SupportsNamespaces.PROP_LOCATION -> nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    val dir = nsPath(namespace)
    if (fsys.exists(dir))
      throw new NamespaceAlreadyExistsException(namespace)
    fsys.mkdirs(dir)
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft-table namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    require(namespace.nonEmpty, "cannot drop the root namespace")
    val dir = nsPath(namespace)
    if (!namespaceExists(namespace)) false
    else {
      if (!cascade && fsys.listStatus(dir).nonEmpty)
        throw new NonEmptyNamespaceException(namespace)
      fsys.delete(dir, true)
    }
  }
}
