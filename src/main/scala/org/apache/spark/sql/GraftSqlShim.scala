package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Bridge for building a DataFrame from a custom LogicalPlan
  * ([[graft.plans.AsOfJoinNode]]). `Dataset.ofRows` is `private[sql]`, so
  * this one-object shim lives in the `org.apache.spark.sql` package — the
  * standard technique for third-party Catalyst operator libraries.
  */
object GraftSqlShim {

  /** DataFrame over `plan`, analyzed/optimized by the session's Catalyst. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** The analyzed logical plan backing `df`. */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** The session's v2 catalog manager (`private[sql]` on SessionState) —
    * needed by `table_changes(...)` to resolve a catalog identifier to
    * its warehouse path.
    */
  def catalogManager(spark: SparkSession)
      : org.apache.spark.sql.connector.catalog.CatalogManager =
    spark.asInstanceOf[CSparkSession].sessionState.catalogManager

  /** V2 runtime-filter predicate → V1 `Filter` (`PredicateUtils.toV1` is
    * `private[sql]`) — the graft-table scan evaluates runtime join
    * filters against manifest file stats in this form.
    */
  def predicateToV1(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(p)
}
