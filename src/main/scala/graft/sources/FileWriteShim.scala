package org.apache.spark.sql.graftshim

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Write-side sibling of [[FileReadShim]]: executor-side parquet row
  * writers built from Spark's own machinery (all `private[sql]`). The
  * driver calls the REAL `ParquetFileFormat.prepareWrite` — the exact
  * conf preparation every normal parquet write goes through (write
  * support class, catalyst schema, legacy/timestamp/field-id flags,
  * compression) — and ships the resulting factory + conf to executors,
  * which open writers at unique final paths. The manifest commit is what
  * makes files visible, so writing directly into the table directory is
  * safe.
  */
object FileWriteShim {

  /** Driver: Spark's own parquet writer factory + the prepared conf. */
  def parquetWriteSetup(spark: SparkSession, schema: StructType)
      : (OutputWriterFactory, SerializableConfiguration) = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty[String, String], schema)
    (factory, new SerializableConfiguration(job.getConfiguration))
  }

  /** Executor: an [[OutputWriter]] writing InternalRows to `path`. */
  def newWriter(factory: OutputWriterFactory, conf: Configuration,
      schema: StructType, path: String, partitionId: Int,
      taskId: Long): OutputWriter = {
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft-write", 0), TaskType.MAP, partitionId),
      taskId.toInt & Int.MaxValue)
    factory.newInstance(path, schema,
      new TaskAttemptContextImpl(conf, attempt))
  }
}
