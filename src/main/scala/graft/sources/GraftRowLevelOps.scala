package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.graftshim.FileWriteShim
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** SQL `UPDATE` and `MERGE INTO` for graft-table, via
  * [[org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations]].
  *
  * Group-based (copy-on-write) shape: Spark's rewrite rules read the
  * table through [[GraftRowLevelOperation.newScanBuilder]], apply the
  * SET / matched-clause logic row-by-row in the query plan, and hand the
  * resulting rows to this write — which replaces the snapshot in ONE
  * atomic manifest commit (`#op update|merge|delete`). DELETE with a
  * filter-translatable condition keeps the faster `SupportsDelete`
  * metadata path (Spark's OptimizeMetadataOnlyDeleteFromTable); an
  * untranslatable DELETE condition now falls back to this rewrite
  * instead of failing.
  *
  * Granularity is per-FILE, pruned two ways: statically, files whose
  * parquet footer stats refute the pushed condition never scan
  * ([[VersionedTable.fileMayMatch]]); dynamically, Spark's runtime
  * group filtering runs a `_file` subquery for conditions no static
  * check can evaluate (MERGE's join against its source) and
  * [[GraftRowLevelScan.filter]] narrows the scan — and with it the
  * rewrite/commit set — to exactly the touched files. Everything else
  * carries into the new manifest untouched.
  *
  * The write itself is genuinely distributed: each executor task opens
  * Spark's own parquet writer ([[FileWriteShim]]) at a unique final name
  * inside the table directory (invisible until the manifest commit),
  * reports the name in its commit message, and the driver publishes one
  * manifest naming exactly the reported files.
  */
class GraftRowLevelOperation(path: String, dataSchema: StructType,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** Snapshot the scan planned against + the files it actually read —
    * shared with the write: the commit replaces exactly `scannedFiles`
    * (carrying the rest over) and aborts if the snapshot moved
    * (concurrent-modification, Delta's contract: the rewritten rows were
    * computed against a stale snapshot and cannot be committed).
    */
  @volatile private[sources] var snapshotFiles: Seq[String] = Nil
  @volatile private[sources] var scannedFiles: Seq[String] = Nil
  /** Pending merge-on-read layer the scan read under — the commit
    * aborts if it changed (a raced metadata-only delete would otherwise
    * be escaped by the replacement files' fresh names).
    */
  @volatile private[sources] var snapshotLayer: Set[String] = Set.empty

  override def command(): RowLevelOperation.Command = cmd

  // the rewrite plan must carry the grouping key so runtime group
  // filtering can resolve it (rows arrive at the writer with it; the
  // writer projects it away)
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(GraftTableScan.FileCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
      with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
      private var required: StructType = dataSchema
      private var pushed: Array[org.apache.spark.sql.sources.Filter] =
        Array.empty

      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      // GROUP-granularity contract: we may use the condition to skip
      // whole FILES (footer stats prove no row matches), but every row
      // of a kept file must flow — so we claim the filters fully handled
      // (empty residual: a Filter node would drop the non-matching rows
      // the rewrite must copy verbatim) and we never hand them to
      // parquet (row-group skipping would lose rows within kept files).
      override def pushFilters(
          filters: Array[org.apache.spark.sql.sources.Filter])
          : Array[org.apache.spark.sql.sources.Filter] = {
        pushed = filters
        Array.empty
      }
      override def pushedFilters()
          : Array[org.apache.spark.sql.sources.Filter] = pushed

      override def build(): Scan = new GraftRowLevelScan(path, dataSchema,
        required, pushed, GraftRowLevelOperation.this)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftReplaceBatchWrite(path, dataSchema, info.schema(),
            cmd.toString.toLowerCase(java.util.Locale.ROOT),
            GraftRowLevelOperation.this)
      }
    }
}

/** The operation's scan: all rows of the files it keeps, no residual
  * filtering. Files whose parquet footer stats refute every pushed
  * predicate are skipped at GROUP granularity — they carry over to the
  * new snapshot untouched.
  */
private[sources] class GraftRowLevelScan(path: String,
    dataSchema: StructType, required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter],
    op: GraftRowLevelOperation)
  extends org.apache.spark.sql.connector.read.Scan
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  private def spark = SparkSession.active

  private val readDataSchema = StructType(
    dataSchema.fields.filter(f => required.fieldNames.contains(f.name)))
  private val partSchema = GraftTableScan.metaSubset(required)

  override def readSchema(): StructType =
    StructType(readDataSchema.fields ++ partSchema.fields)
  override def description(): String =
    s"graft-table row-level scan $path (${pushed.mkString(", ")})"

  // ---- runtime GROUP filtering: Spark runs a subquery for the _file
  // values containing matching rows (e.g. MERGE's join keys, which no
  // static footer check can evaluate) and narrows this scan — and with
  // it the rewrite/commit set — to exactly those files ----
  @volatile private var runtimeKept: Option[Set[String]] = None

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(GraftTableScan.FileCol))

  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
    def strings(es: Seq[org.apache.spark.sql.connector.expressions.Expression])
        : Option[Set[String]] = {
      val vs = es.collect { case l: Literal[_] => l.value() }
      if (vs.size != es.size) None
      else Some(vs.map {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case s: String => s
        case other => other.toString
      }.toSet)
    }
    predicates.foreach { p =>
      val kids = p.children().toSeq
      val overFile = kids.headOption.exists {
        case r: NamedReference =>
          r.fieldNames().mkString(".") == GraftTableScan.FileCol
        case _ => false
      }
      val set = p.name() match {
        case "IN" if overFile => strings(kids.tail)
        case "=" if overFile => strings(kids.tail)
        case _ => None
      }
      set.foreach { s =>
        runtimeKept = Some(runtimeKept.fold(s)(_ intersect s))
      }
    }
  }

  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    new org.apache.spark.sql.connector.read.Batch {
      // BOTH pending merge-on-read layers apply inside this scan — a
      // rewrite reading dead rows would RESURRECT them into the
      // replacement files. Position layers filter directly; equality
      // layers resolve to positions by one plan-time job (same bounded
      // map as the batch read path).
      private lazy val posDeletes: Map[String, PositionBitmap] = {
        val pos = VersionedTable.pendingPositionDeletes(spark, path)
        val eq = VersionedTable.pendingEqualityDeletePositions(spark, path)
        if (eq.isEmpty) pos
        else if (pos.isEmpty) eq
        else (pos.keySet ++ eq.keySet).iterator.map { k =>
          k -> ((pos.get(k), eq.get(k)) match {
            case (Some(a), Some(b)) => a.union(b)
            case (a, b) => a.orElse(b).get
          })
        }.toMap
      }
      override def planInputPartitions()
          : Array[org.apache.spark.sql.connector.read.InputPartition] = {
        val conf = spark.sparkContext.hadoopConfiguration
        val f = new Path(path).getFileSystem(conf)
        op.snapshotLayer = VersionedTable.pendingLayer(spark, path)
        val (_, files) = VersionedTable.latest(spark, path)
        val kept = files
          .filter(n => runtimeKept.forall(_.contains(n)))
          .filter(n => VersionedTable.fileMayMatch(
            conf, new Path(path, n), pushed))
        op.snapshotFiles = files
        op.scannedFiles = kept
        // real provenance when the DML references _commit_version
        val provenance =
          if (!partSchema.fieldNames.contains(GraftTableScan.VersionCol))
            Map.empty[String, Long]
          else VersionedTable.fileVersions(spark, path)
        kept.zipWithIndex.map { case (n, i) =>
          val p = new Path(path, n)
          org.apache.spark.sql.graftshim.FileReadShim.filePartitionValues(i,
            Seq((p.toString, f.getFileStatus(p).getLen,
              GraftTableScan.metaValues(partSchema,
                provenance.getOrElse(n, 0L), n))))
        }.toArray
      }
      override def createReaderFactory()
          : org.apache.spark.sql.connector.read.PartitionReaderFactory = {
        // no pushed parquet filters here ever (fileMayMatch prunes whole
        // files only), so the ordinal == row_index contract holds
        val inner = org.apache.spark.sql.graftshim.FileReadShim
          .parquetReaderFactory(spark, readDataSchema, partSchema)
        if (posDeletes.isEmpty) inner
        else org.apache.spark.sql.graftshim.FileReadShim
          .posFilteringFactory(inner,
            spark.sparkContext.broadcast(posDeletes))
      }
    }
}

/** Distributed rewrite-the-scanned-files write: executors write parquet
  * files named `part-<uuid>.parquet` straight into the table dir; the
  * driver commits one manifest replacing exactly the files the
  * operation's scan read (unscanned files carry over untouched), and
  * aborts with ConcurrentModificationException if the snapshot moved.
  */
private[sources] class GraftReplaceBatchWrite(path: String,
    dataSchema: StructType, rowSchema: StructType,
    op: String, operation: GraftRowLevelOperation) extends BatchWrite {

  private def spark = SparkSession.active

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    // incoming rows may carry the table's metadata columns
    // (_commit_version, _file) — writers project them away
    val keep = rowSchema.fields.zipWithIndex
      .filterNot { case (f, _) =>
        f.name == GraftTableScan.VersionCol ||
          f.name == GraftTableScan.FileCol
      }.map(_._2)
    require(keep.nonEmpty, "nothing to write but the version column")
    // re-stamp the table schema's metadata (parquet field ids): the
    // rewrite plan's SET/merge expressions drop it, and partially
    // id-tagged files would read the untagged columns as null
    val byName = dataSchema.fields
      .map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> f).toMap
    val written = StructType(keep.map(rowSchema.fields(_)).map(f =>
      byName.get(f.name.toLowerCase(java.util.Locale.ROOT))
        .map(tf => f.copy(metadata = tf.metadata)).getOrElse(f)))
    require(written.map(f => (f.name, f.dataType)) ==
      dataSchema.map(f => (f.name, f.dataType)),
      s"row-level write schema $written != table schema $dataSchema")
    val (factory, conf) = FileWriteShim.parquetWriteSetup(spark, written)
    new GraftReplaceWriterFactory(path, factory, conf, written,
      rowSchema, keep)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case GraftWriteCommit(names) => names
    }.flatten.toSeq
    VersionedTable.commitReplaceFiles(spark, path,
      expectedSnapshot = operation.snapshotFiles,
      remove = operation.scannedFiles, add = files, op = op,
      expectedLayer = Some(operation.snapshotLayer))
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.collect { case GraftWriteCommit(names) => names }.flatten
      .foreach(n => f.delete(new Path(path, n), false))
  }
}

private[sources] case class GraftWriteCommit(files: Seq[String])
  extends WriterCommitMessage

/** Native streaming sink: the same distributed parquet writers as the
  * row-level path, with each epoch committed idempotently under
  * (queryId, epochId) via the manifest txn watermark — replayed epochs
  * delete their files instead of committing ([[VersionedTable
  * .commitStagedIdempotent]]). Append output mode only (a streaming
  * table sink that truncates per epoch would destroy the history the
  * changefeed serves).
  */
private[sources] class GraftStreamingWrite(path: String,
    dataSchema: StructType, rowSchema: StructType, queryId: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private def spark = SparkSession.active
  private val writerId = s"stream-$queryId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val keep = rowSchema.fields.zipWithIndex
      .filterNot { case (f, _) =>
        f.name == GraftTableScan.VersionCol ||
          f.name == GraftTableScan.FileCol
      }.map(_._2)
    val written = StructType(keep.map(rowSchema.fields(_)))
    require(written.map(f => (f.name, f.dataType)) ==
      dataSchema.map(f => (f.name, f.dataType)),
      s"streaming write schema $written != table schema $dataSchema")
    val (factory, conf) = FileWriteShim.parquetWriteSetup(spark, written)
    val inner = new GraftReplaceWriterFactory(path, factory, conf,
      written, rowSchema, keep)
    new org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] =
        inner.createWriter(partitionId, taskId)
    }
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case GraftWriteCommit(names) => names
    }.flatten.toSeq
    VersionedTable.commitStagedIdempotent(spark, path, files,
      writerId, epochId)
    ()
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val f = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.collect { case GraftWriteCommit(names) => names }.flatten
      .foreach(n => f.delete(new Path(path, n), false))
  }
}

private[sources] class GraftReplaceWriterFactory(path: String,
    factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: SerializableConfiguration, written: StructType,
    rowSchema: StructType, keep: Array[Int]) extends DataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val name = s"part-${UUID.randomUUID}.parquet"
      // Spark 4 prepends a physical __row_operation int column
      // (RowDeltaUtils.OPERATION_COLUMN) that LogicalWriteInfo.schema()
      // does NOT include — detect the offset from the first record and
      // bind field readers past it. Rows marked DELETE are dropped
      // (defensive: ReplaceData queries omit deleted rows already).
      private var opOffset = -1
      private var proj: UnsafeProjection = null
      private var rows = 0L
      private lazy val out = FileWriteShim.newWriter(
        factory, conf.value, written, s"$path/$name", partitionId, taskId)

      override def write(record: InternalRow): Unit = {
        if (proj == null) {
          opOffset = record.numFields - rowSchema.length
          require(opOffset == 0 || opOffset == 1,
            s"unexpected row width ${record.numFields} for schema " +
              s"$rowSchema (+optional operation column)")
          proj = UnsafeProjection.create(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(
              keep.map(i => BoundReference(i + opOffset,
                rowSchema.fields(i).dataType,
                rowSchema.fields(i).nullable): org.apache.spark.sql
                .catalyst.expressions.Expression)))
        }
        val drop = opOffset == 1 && !record.isNullAt(0) &&
          record.getInt(0) ==
            org.apache.spark.sql.catalyst.util.RowDeltaUtils.DELETE_OPERATION
        if (!drop) { out.write(proj(record)); rows += 1 }
      }
      override def commit(): WriterCommitMessage = {
        // empty partitions produce no file at all
        if (rows > 0) { out.close(); GraftWriteCommit(Seq(name)) }
        else GraftWriteCommit(Nil)
      }
      override def abort(): Unit =
        // only close if a row forced the writer open — touching the lazy
        // val here would CREATE an orphan file during abort
        if (rows > 0) try out.close() catch { case _: Exception => }
      override def close(): Unit = ()
    }
}
