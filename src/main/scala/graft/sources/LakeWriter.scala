package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sink-side operators (SURVEY.md §2.1, S4-S7).
  *
  * The reference appends/overwrites BigQuery tables via a temporary GCS
  * bucket (`...load_latest...py:76-80`); the engine's curated zone is a
  * Parquet lake — same append/overwrite semantics, columnar scans for the
  * analytical layer, and no external service.
  */
object LakeWriter {

  /** S4 — append to a curated lake table. Ref `...load_latest...py:76-80`. */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Partitioned append — the 100 TB form of S4: directory-partition on
    * low-cardinality time/zone columns so readers prune partitions at plan
    * time (`PartitionFilters` in the scan). E.g. partition the curated
    * load table by `date(interval_start)`.
    */
  def appendPartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed managed table — co-locates join/agg keys at write time so
    * repeated equi-joins/aggs on `bucketCols` run with NO exchange on the
    * bucketed side(s). Requires `saveAsTable` (bucket metadata lives in the
    * catalog). `sortCols` additionally pre-sorts within buckets, enabling
    * exchange-free sort-merge joins.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Z-order-clustered overwrite: range-partition + sort on the Morton
    * interleave of `dims` (see [[graft.functions.GraftFunctions.ZValue]])
    * so each of the `numFiles` output files covers a bounded sub-grid in
    * EVERY dimension. Parquet min/max column stats then skip whole files
    * (and row groups) for selective predicates on ANY of the dims — a
    * plain sort only data-skips on its leading column. At 100 TB this is
    * the difference between scanning a full day of events and the ~1/64
    * of files whose (user, hour) box intersects the query.
    *
    * `dims` must be non-negative integral bucket columns (mask to
    * `bits` low bits; pre-bucket wide domains, e.g. `id % 1024`,
    * `unix_micros(ts) div 3600000000L % 1024`).
    */
  def zOrderWrite(df: DataFrame, dims: Seq[org.apache.spark.sql.Column],
      bits: Int, path: String, numFiles: Int): Unit = {
    val z = graft.functions.GraftFunctions.zvalue(bits)(dims: _*)
    df.withColumn("__graft_z", z)
      .repartitionByRange(numFiles, org.apache.spark.sql.functions.col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
  }

  /** S5 — overwrite a curated lake table. Ref `mergeHistoricalWeather.py:100-105`. */
  def overwrite(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S6 — CSV sink with header. Ref `mergeHistoricalWeather.py:62-66`.
    * Timestamps go out in Spark's DEFAULT CSV format, which carries
    * milliseconds only — date/second/milli-granular instants round-trip
    * through [[LakeReader.csvFolder]] losslessly, micros-precision ones
    * truncate (use [[jsonOverwrite]] for micros-lossless text
    * interchange; the reference's CSV feeds are second-granular).
    */
  def csvOverwrite(df: DataFrame, path: String): Unit =
    df.write.format("csv").option("header", "true").mode("overwrite").save(path)

  /** JSON-lines sink: the interchange format for consumers without a
    * columnar reader (downstream services, quick inspection). Timestamps
    * serialize as ISO-8601 under the engine's fixed UTC session zone, so
    * a schema'd [[LakeReader.jsonFolder]] read round-trips values
    * exactly; doubles use shortest-round-trip rendering (same
    * guarantee).
    */
  def jsonOverwrite(df: DataFrame, path: String): Unit =
    df.write
      // Spark's default JSON timestampFormat carries milliseconds only;
      // micros-precision instants would silently truncate on the way out
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .mode("overwrite").json(path)

  /** ORC sink — Hive-ecosystem interop twin of [[overwrite]]. */
  def orcOverwrite(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Small-file compaction: continuous appends (15-min cadence feeds)
    * accumulate many tiny parquet files, degrading scan planning and task
    * granularity. Rewrites the table into `numFiles` files, then swaps in
    * the compacted files and removes EXACTLY the input files that were
    * snapshotted before the rewrite — files appended concurrently (the
    * 15-min cadence writers) are never touched, and the table path never
    * disappears. Readers between the two steps may briefly see the
    * compacted rows twice; appends are never lost.
    *
    * ==NOT crash-safe — prefer [[VersionedTable.compact]]==
    * A crash between the rename-in and the input deletes leaves those
    * rows DUPLICATED until the same compaction is re-run or cleaned up;
    * directory tables have no commit log to recover from, and readers
    * cannot tell the half-compacted state from a healthy table. Treat
    * this method as deprecated for any table that matters:
    * [[VersionedTable.compact]] provides the same operation with
    * manifest-commit atomicity (crash = clean rollback to the previous
    * snapshot). This form survives only as the reference-faithful
    * directory-table behavior. Returns the new file count.
    */
  def compact(spark: SparkSession, path: String, numFiles: Int): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0
    val tmp = new Path(path + "__compact_tmp")
    val df = spark.read.parquet(path)
    // Snapshot of the files this compaction will subsume — the read job
    // plans against exactly this list.
    val inputs = df.inputFiles.map(new Path(_))
    df.repartition(numFiles).write.mode("overwrite").parquet(tmp.toString)
    val newFiles = fs.listStatus(tmp)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    newFiles.foreach { s =>
      fs.rename(s.getPath, new Path(p, "compact-" + s.getPath.getName))
    }
    inputs.foreach(f => fs.delete(f, false))
    fs.delete(tmp, true)
    fs.listStatus(p).count(s => s.getPath.getName.endsWith(".parquet"))
  }

  /** S7 (safe form) — archive EXACTLY the files a scan consumed
    * (`df.inputFiles`): files that land in the source dir after the scan
    * planned are left for the next run instead of being swept into the
    * archive unread. Returns the number of files moved.
    */
  def archiveFiles(spark: SparkSession, files: Seq[String],
      archiveDir: String): Int = {
    if (files.isEmpty) return 0
    val fs: FileSystem = new Path(files.head)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(archiveDir)
    if (!fs.exists(dst)) fs.mkdirs(dst)
    var moved = 0
    files.foreach { f =>
      val p = new Path(f)
      if (fs.exists(p) && fs.rename(p, new Path(dst, p.getName))) moved += 1
    }
    moved
  }

  /** S7 — archive processed source files: move every data file from
    * `sourceDir` to `archiveDir` (ref's copy+delete loop,
    * `...load_latest...py:86-117`). Driver-side metadata operation in the
    * reference too; `FileSystem.rename` is atomic per file on HDFS-likes.
    * Returns the number of files moved. NOTE: sweeps whatever is in the
    * folder AT ARCHIVE TIME — prefer [[archiveFiles]] with the scan's
    * `inputFiles` snapshot when writers may race the job.
    */
  def archive(spark: SparkSession, sourceDir: String, archiveDir: String): Int = {
    val src = new Path(sourceDir)
    val fs: FileSystem = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(src)) return 0
    val dst = new Path(archiveDir)
    if (!fs.exists(dst)) fs.mkdirs(dst)
    val files = fs.listStatus(src).filter(_.isFile)
    files.foreach { st =>
      fs.rename(st.getPath, new Path(dst, st.getPath.getName))
    }
    files.length
  }
}
