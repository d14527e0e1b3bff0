package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog-exposed `bucket(n, col)` function backing
  * storage-partitioned joins over [[VersionedTable.BucketByProperty]]
  * tables. Spark resolves the scan-reported
  * `KeyGroupedPartitioning(bucket(n, col))` through the table's
  * catalog ([[GraftCatalog.loadFunction]]); two sides whose bound
  * functions share [[BoundFunction.canonicalName]] and bucket count
  * are join-compatible WITHOUT an exchange (Iceberg's bucket-SPJ
  * design).
  *
  * The semantics MUST equal the write side: files are laid out by
  * `df.repartition(n, col)` = `pmod(murmur3(col, seed=42), n)`, so the
  * function evaluates the exact same hash (nulls hash to the seed,
  * like Spark's `HashPartitioning`).
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col) — pmod(murmur3(col), numBuckets), the " +
      "graft-table write layout hash"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.size == 2,
      s"bucket takes (numBuckets, col), got ${inputType.size} arguments")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket: numBuckets must be INT, got " +
        inputType.fields(0).dataType.simpleString)
    val keyType = inputType.fields(1).dataType
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] =
        Array(IntegerType, keyType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      // equality of canonical names is the SPJ compatibility contract —
      // include the key type so e.g. INT- and STRING-bucketed sides
      // never pass as exchange-free-joinable
      override def canonicalName(): String =
        s"graft.bucket(${keyType.catalogString})"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        val v = input.get(1, keyType)
        val h = Murmur3HashFunction.hash(v, keyType, 42L)
        (((h % n) + n) % n).toInt
      }
    }
  }
}
