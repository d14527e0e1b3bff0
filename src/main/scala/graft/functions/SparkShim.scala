package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst [[Expression]]s and the public [[Column]] API.
  *
  * Spark 4 moved Column onto ColumnNode internals; the converter
  * (`classic.ExpressionUtils`) is `private[sql]`, so this one-file shim
  * lives under the `org.apache.spark.sql` package namespace to reach it —
  * the conventional pattern for libraries that ship custom expressions.
  */
object SparkShim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over an RDD of INTERNAL rows — skips the external-Row
    * round trip `createDataFrame(RDD[Row], schema)` pays per row
    * (r15: globalRowNumber's numbering pass). `private[sql]` on the
    * classic SparkSession, reachable from this shim package.
    */
  def internalCreateDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
