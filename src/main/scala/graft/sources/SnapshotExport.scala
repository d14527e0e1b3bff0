package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** External-reader snapshot export: write a `manifest.txt` of absolute
  * data-file paths for the CURRENT snapshot, so engines that speak only
  * parquet (DuckDB, Trino via symlink-style manifests, plain
  * `spark.read.parquet`) can read the table without graft — the
  * Delta/Hive "symlink format manifest" interop pattern.
  *
  * Correctness gate: a pending merge-on-read delete layer is REFUSED —
  * the raw files still contain the logically-deleted rows, and an
  * external reader has no way to subtract them. `compact` materializes
  * the layer; export after that. (Refusing loudly beats silently
  * resurrecting deleted rows for every downstream consumer.)
  *
  * The manifest names immutable committed files, so it stays valid
  * until a vacuum reclaims a file the exported snapshot references —
  * the same retention contract as time travel.
  */
object SnapshotExport {

  /** Write `outFile` (one absolute path per line, sorted) for the
    * latest snapshot. Returns (version exported, number of files). */
  def exportManifest(spark: SparkSession, table: String,
      outFile: String): (Long, Int) = {
    val (v, _) = VersionedTable.latest(spark, table)
    require(v >= 1, s"$table has no committed version to export")
    require(VersionedTable.pendingLayer(spark, table).isEmpty,
      s"$table has a pending merge-on-read delete layer: raw data files " +
        "would resurrect deleted rows for external readers — run " +
        "compact() to materialize the layer, then export")
    val files = VersionedTable.filesAt(spark, table, v).sorted
    val tableUri = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
      .makeQualified(new Path(table))
    val body = files.map(n => s"${new Path(tableUri, n)}\n").mkString
    val outPath = new Path(outFile)
    val f = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(outPath.getParent).foreach(f.mkdirs)
    val out = f.create(outPath, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    (v, files.size)
  }

  /** Read a manifest written by [[exportManifest]] back into the file
    * list (for drivers that hand the paths to another engine). */
  def readManifest(spark: SparkSession, manifest: String): Seq[String] = {
    val p = new Path(manifest)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val data = new Array[Byte](f.getFileStatus(p).getLen.toInt)
    val in = f.open(p)
    try in.readFully(data) finally in.close()
    new String(data, "UTF-8").split("\n").filter(_.nonEmpty).toSeq
  }
}
