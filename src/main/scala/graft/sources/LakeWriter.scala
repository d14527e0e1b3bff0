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

  /** S5 — overwrite a curated lake table. Ref `mergeHistoricalWeather.py:100-105`. */
  def overwrite(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S6 — CSV sink with header. Ref `mergeHistoricalWeather.py:62-66`. */
  def csvOverwrite(df: DataFrame, path: String): Unit =
    df.write.format("csv").option("header", "true").mode("overwrite").save(path)

  /** S7 — archive processed source files: move every data file from
    * `sourceDir` to `archiveDir` (ref's copy+delete loop,
    * `...load_latest...py:86-117`). Driver-side metadata operation in the
    * reference too; `FileSystem.rename` is atomic per file on HDFS-likes.
    * Returns the number of files moved.
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
