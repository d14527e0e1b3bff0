package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-audit-publish (WAP) staging sessions over graft tables — the
  * Iceberg/Delta release pattern where a producer writes a candidate
  * batch, an auditor validates it against the live data, and only a
  * passing batch becomes visible, atomically.
  *
  * Zero-copy by construction: [[write]] stages data files INTO the
  * table directory through the central staging path (schema alignment,
  * CHECK constraints, NOT NULL invariants, bucket/cluster layout all
  * apply), but no manifest references them — every reader of the table
  * keeps seeing the base snapshot. [[publish]] turns the whole session
  * into ONE committed version through the idempotent writer-txn
  * protocol (`graft-wap-<id>` + epoch 1), so a crashed-and-retried
  * publish commits exactly once. [[abort]] deletes the staged files on
  * the spot.
  *
  * Durability: the session is journaled in `_wap-<id>.marker` inside
  * the table dir (base version + staged file list, rewritten after
  * every write), so [[resume]] recovers a handle after a process crash.
  * An ABANDONED session needs no cleanup call: its staged files are
  * unreferenced by any manifest and fall to `vacuum`'s retention sweep,
  * which also reclaims the marker — a live session must therefore be
  * shorter than the vacuum retention window (same liveness contract as
  * the staging directories).
  *
  * At 100 TB nothing here is driver-sized: staging is the ordinary
  * distributed write path, audit reads are ordinary scans, and publish
  * moves zero bytes (it commits names).
  */
object Wap {

  /** An open session: `files` are staged (invisible) table-relative
    * data files; `baseVersion` is the snapshot the session began on. */
  final case class Handle(table: String, wapId: String,
      baseVersion: Long, files: Seq[String])

  private def fsOf(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerPath(table: String, wapId: String): Path =
    new Path(table, s"_wap-$wapId.marker")

  private def requireId(wapId: String): Unit = require(
    wapId.nonEmpty && wapId.forall(c => c.isLetterOrDigit ||
      c == '-' || c == '_'),
    s"wap id must be [A-Za-z0-9_-]+, got '$wapId'")

  private def writeMarker(f: FileSystem, h: Handle): Unit = {
    // one small control file; a crash mid-write leaves a corrupt marker
    // that resume() rejects loudly, and the staged files age out under
    // vacuum — never silent data
    val out = f.create(markerPath(h.table, h.wapId), true)
    try out.write((s"base=${h.baseVersion}\n" +
      h.files.map(_ + "\n").mkString).getBytes("UTF-8"))
    finally out.close()
  }

  private def readMarker(f: FileSystem, table: String,
      wapId: String): Handle = {
    val p = markerPath(table, wapId)
    require(f.exists(p), s"no open WAP session '$wapId' on $table")
    val data = new Array[Byte](f.getFileStatus(p).getLen.toInt)
    val in = f.open(p)
    try in.readFully(data) finally in.close()
    val lines = new String(data, "UTF-8").split("\n")
      .filter(_.nonEmpty).toSeq
    require(lines.nonEmpty && lines.head.startsWith("base="),
      s"corrupt WAP marker for '$wapId' on $table — abort the session")
    Handle(table, wapId, lines.head.stripPrefix("base=").toLong,
      lines.tail)
  }

  /** Open a session on an existing table. Fails if a session with this
    * id is already open, or if this id already PUBLISHED (the writer-txn
    * watermark remembers it — ids are single-use so a late duplicate
    * publish can never double-commit). */
  def begin(spark: SparkSession, table: String, wapId: String): Handle = {
    requireId(wapId)
    val (v, _) = VersionedTable.latest(spark, table)
    require(v >= 1, s"WAP needs an existing table, $table has no commits")
    val f = fsOf(spark, table)
    require(!f.exists(markerPath(table, wapId)),
      s"WAP session '$wapId' is already open on $table")
    require(VersionedTable
      .lastCommittedEpoch(spark, table, s"graft-wap-$wapId").isEmpty,
      s"WAP id '$wapId' was already published on $table — ids are " +
        "single-use")
    val h = Handle(table, wapId, v, Nil)
    writeMarker(f, h)
    h
  }

  /** Recover the open session `wapId` from its marker (crash recovery). */
  def resume(spark: SparkSession, table: String, wapId: String): Handle = {
    requireId(wapId)
    readMarker(fsOf(spark, table), table, wapId)
  }

  /** Stage `df` into the session: a full distributed write through the
    * table's alignment/constraint/layout path, visible to nobody. */
  def write(spark: SparkSession, h: Handle, df: DataFrame): Handle = {
    val f = fsOf(spark, h.table)
    require(f.exists(markerPath(h.table, h.wapId)),
      s"WAP session '${h.wapId}' on ${h.table} is not open")
    val staged = VersionedTable.stageAligned(spark, df, h.table)
    val nh = h.copy(files = h.files ++ staged)
    writeMarker(f, nh)
    nh
  }

  /** What the table WOULD contain after publish: the current snapshot
    * plus the staged rows — the auditor's view. Base rows keep full
    * delete-layer semantics (it is the ordinary snapshot read). */
  def auditView(spark: SparkSession, h: Handle): DataFrame = {
    val base = VersionedTable.read(spark, h.table)
    if (h.files.isEmpty) base
    else base.unionByName(spark.read.schema(base.schema)
      .parquet(h.files.map(n => new Path(h.table, n).toString): _*))
  }

  /** Just the staged rows (for audits that validate the new batch in
    * isolation — row counts, constraint sweeps, dedup probes). */
  def stagedRows(spark: SparkSession, h: Handle): DataFrame = {
    val base = VersionedTable.read(spark, h.table)
    if (h.files.isEmpty) base.limit(0)
    else spark.read.schema(base.schema)
      .parquet(h.files.map(n => new Path(h.table, n).toString): _*)
  }

  /** Atomically make the session visible as one new version and close
    * it. Idempotent under retry (writer-txn watermark). With
    * `requireBaseUnchanged` the commit is STRICT: if anything committed
    * after [[begin]], publish throws and the session STAYS OPEN (staged
    * files intact) for the caller to audit against the moved base and
    * retry, or abort. Without it, appends merge with whatever landed
    * since — the default, correct for append-only feeds.
    */
  def publish(spark: SparkSession, h: Handle,
      requireBaseUnchanged: Boolean = false): Long = {
    val f = fsOf(spark, h.table)
    require(f.exists(markerPath(h.table, h.wapId)),
      s"WAP session '${h.wapId}' on ${h.table} is not open")
    // deleteOnDuplicate=false: a crashed-and-retried publish re-commits
    // the SAME file names the first commit already referenced — the
    // streaming-sink duplicate path (delete the retry's fresh copies)
    // would here delete committed data out from under the manifest
    val v = VersionedTable.commitStagedIdempotent(spark, h.table,
      h.files, writerId = s"graft-wap-${h.wapId}", epoch = 1L,
      requireVersion = if (requireBaseUnchanged) Some(h.baseVersion)
        else None,
      deleteOnDuplicate = false)
    f.delete(markerPath(h.table, h.wapId), false)
    VersionedTable.invalidateCache(h.table)
    v
  }

  /** Discard the session: staged files deleted now, marker removed.
    * Two guards protect committed data: the session must still be open
    * (marker present — a stale handle after a clean publish/abort
    * refuses), and the writer-txn watermark must NOT already record
    * this id — a publish that committed but crashed BEFORE deleting
    * its marker leaves a marker whose files the manifest now
    * references; aborting that "session" would delete live data, so it
    * is refused with a pointer to the committed state (the marker is
    * cleaned up instead, completing the interrupted publish). */
  def abort(spark: SparkSession, h: Handle): Unit = {
    val f = fsOf(spark, h.table)
    require(f.exists(markerPath(h.table, h.wapId)),
      s"WAP session '${h.wapId}' on ${h.table} is not open (already " +
        "published or aborted) — nothing to abort")
    if (VersionedTable
        .lastCommittedEpoch(spark, h.table, s"graft-wap-${h.wapId}")
        .nonEmpty) {
      // crash window between commit and marker delete: the files are
      // committed data — finish the publish's cleanup, refuse the abort
      f.delete(markerPath(h.table, h.wapId), false)
      throw new IllegalStateException(
        s"WAP id '${h.wapId}' already PUBLISHED on ${h.table} (crash " +
          "between commit and marker cleanup) — the staged files are " +
          "committed data; marker removed, nothing aborted")
    }
    val cur = readMarker(f, h.table, h.wapId)
    cur.files.foreach(n => f.delete(new Path(h.table, n), false))
    f.delete(markerPath(h.table, h.wapId), false)
  }
}
