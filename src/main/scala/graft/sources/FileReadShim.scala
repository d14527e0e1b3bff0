package org.apache.spark.sql.graftshim

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.{FilePartition, FileStatusCache, InMemoryFileIndex, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Access shim for Spark's file-source execution internals (all
  * `private[sql]`/`private[spark]`): the graft streaming source reuses
  * Spark's OWN vectorized parquet reader instead of hand-rolling row
  * materialization — same pattern as [[SparkShim]], one namespace file.
  */
object FileReadShim {

  /** A serializable factory producing Spark's vectorized parquet readers
    * for `readDataSchema`, appending `partitionSchema` values carried on
    * each [[PartitionedFile]] (how file sources attach partition
    * columns — here, the commit version).
    */
  def parquetReaderFactory(spark: SparkSession, readDataSchema: StructType,
      partitionSchema: StructType,
      pushedFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
      : PartitionReaderFactory = {
    // id-carrying schemas (rename/drop evolution) need the session's
    // field-id read confs on BEFORE the scan snapshots SQLConf here
    graft.sources.VersionedTable.ensureFieldIdRead(spark,
      Some(readDataSchema))
    // Build Spark's own ParquetScan (over an empty file index — partition
    // planning stays ours) and let ITS createReaderFactory prepare the
    // hadoop conf (ReadSupport class, requested schema, timezone, parquet
    // flags): replicating that setup by hand is exactly the fragile part
    // this shim exists to avoid.
    ParquetScan(
      spark,
      spark.sessionState.newHadoopConf(),
      new InMemoryFileIndex(spark, Nil, Map.empty, Some(readDataSchema),
        FileStatusCache.getOrCreate(spark), None, None),
      dataSchema = readDataSchema,
      readDataSchema = readDataSchema,
      readPartitionSchema = partitionSchema,
      pushedFilters = pushedFilters,
      options = CaseInsensitiveStringMap.empty(),
      pushedAggregate = None,
      partitionFilters = Nil,
      dataFilters = Nil).createReaderFactory()
  }

  /** One [[FilePartition]] over whole files, each tagged with a single
    * LONG partition value (the commit version that added it).
    */
  def filePartition(index: Int,
      files: Seq[(String, Long, Long)]): InputPartition =
    filePartitionValues(index,
      files.map { case (p, s, v) => (p, s, Seq[Any](v)) })

  /** General form: arbitrary partition-value tuples per file (Long and
    * String supported), matching the reader factory's partitionSchema.
    */
  def filePartitionValues(index: Int,
      files: Seq[(String, Long, Seq[Any])]): InputPartition =
    FilePartition(index, partitionedFiles(files))

  /** A [[FilePartition]] that also reports a partition KEY (the bucket
    * id of every file it holds) — the [[HasPartitionKey]] half of the
    * storage-partitioned-join contract; the scan reports the matching
    * `KeyGroupedPartitioning(bucket(n, col))`.
    */
  def keyedFilePartitionValues(index: Int,
      files: Seq[(String, Long, Seq[Any])], bucketId: Int): InputPartition =
    new FilePartition(index, partitionedFiles(files))
      with org.apache.spark.sql.connector.read.HasPartitionKey {
      override def partitionKey(): InternalRow =
        new GenericInternalRow(Array[Any](bucketId))
    }

  private def partitionedFiles(
      files: Seq[(String, Long, Seq[Any])]): Array[PartitionedFile] =
    files.map { case (path, size, values) =>
      PartitionedFile(
        partitionValues = new GenericInternalRow(values.map {
          case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
          case other => other
        }.toArray[Any]),
        filePath = SparkPath.fromPathString(path),
        start = 0L,
        length = size,
        locations = Array.empty,
        modificationTime = 0L,
        fileSize = size)
    }.toArray

  def emptyInternalRow: InternalRow = InternalRow.empty

  /** Table-relative names of the files in a [[FilePartition]] (for
    * factories that dispatch by file kind).
    */
  def partitionFileNames(p: InputPartition): Seq[String] =
    p.asInstanceOf[FilePartition].files.toSeq.map(_.toPath.getName)

  /** Wrap a reader factory to SKIP the rows named by a position-delete
    * layer: `dead` is a BROADCAST (one copy per executor, not one per
    * task closure) of file NAME → compressed ordinal bitmap.
    * Correctness contract (the caller's to uphold): each partition is
    * ONE whole file (start 0, full length) and the inner factory pushes
    * NO parquet filters — so the reader sees every physical row in
    * order and the running ordinal IS `_metadata.row_index`, the
    * coordinate the delete layer was written in. Rows-based on purpose:
    * per-row skipping composes with the record reader, not with
    * columnar batches.
    */
  def posFilteringFactory(inner: PartitionReaderFactory,
      dead: org.apache.spark.broadcast.Broadcast[
        Map[String, graft.sources.PositionBitmap]]): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def supportColumnarReads(p: InputPartition): Boolean = false
      override def createReader(p: InputPartition)
          : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
        val files = p.asInstanceOf[FilePartition].files
        require(files.length == 1,
          "position-filtered scans plan exactly one file per partition")
        val isDead: Long => Boolean =
          dead.value.get(files.head.toPath.getName) match {
            case Some(bm) => bm.probe()
            case None => _ => false
          }
        val in = inner.createReader(p)
        new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
          private var ordinal = -1L
          override def next(): Boolean = {
            while (in.next()) {
              ordinal += 1
              if (!isDead(ordinal)) return true
            }
            false
          }
          override def get(): InternalRow = in.get()
          override def close(): Unit = in.close()
        }
      }
    }
}
