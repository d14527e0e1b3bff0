package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{cmEstimate, cmMerge, countMin}
import graft.functions.{CmCodec, CmSketch}

/** Count-Min sketch: never undercounts, merge associativity, the
  * exact-domain regime, and the persisted-bytes roundtrip.
  */
class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  test("estimates never undercount and are exact for a collision-free domain") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sk = docs.agg(countMin(col("source"), 4, 1024).as("sk"))
    val est = docs.select(col("source")).distinct()
      .crossJoin(broadcast(sk))
      .select(col("source"), cmEstimate(col("sk"), col("source")).as("est"))
    val exact = docs.groupBy("source").count()
    val joined = est.join(exact, "source").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("count"),
        s"undercount for ${r.getString(0)}")
    }
    // ~20 sources in 4 rows of 1024 cells: collision-free => exact
    joined.foreach { r =>
      assert(r.getAs[Long]("est") === r.getAs[Long]("count"))
    }
  }

  test("merge of per-group sketches equals the direct whole-data sketch") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val direct = docs.agg(countMin(col("source"), 4, 256).as("sk"))
      .head.getAs[Array[Byte]](0)
    val merged = docs.groupBy("lang")
      .agg(countMin(col("source"), 4, 256).as("sk"))
      .agg(cmMerge(col("sk")).as("sk"))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, merged))
  }

  test("merge refuses mismatched shapes loudly") {
    val a = new CmSketch(2, 64)
    val b = new CmSketch(4, 64)
    val e = intercept[IllegalArgumentException](a.mergeIn(b))
    assert(e.getMessage.contains("different shape"))
  }

  test("serialization roundtrip preserves the table and count") {
    val sk = new CmSketch(3, 32)
    Seq("a", "b", "a", "c").foreach(s =>
      sk.add(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    val back = CmCodec.deserialize(CmCodec.serialize(sk))
    assert(back.depth === 3 && back.width === 32 && back.n === 4)
    assert(back.table === sk.table)
    assert(back.estimate(
      org.apache.spark.unsafe.types.UTF8String.fromString("a")) === 2L)
  }

  test("null items are skipped; empty merge input yields null") {
    val est = Seq(Some("x"), None, Some("x")).toDF("s")
      .agg(countMin(col("s"), 2, 16).as("sk"))
      .select(cmEstimate(col("sk"), lit("x")))
      .head.getLong(0)
    assert(est === 2L)
    val merged = Seq.empty[Array[Byte]].toDF("sk")
      .agg(cmMerge(col("sk")).as("m")).head
    assert(merged.isNullAt(0))
  }

  test("SQL surface: graft_countmin / graft_cm_merge / graft_cm_estimate") {
    spark.read.parquet(s"$sf/documents.parquet")
      .createOrReplaceTempView("cm_docs")
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_cm_estimate(graft_cm_merge(sk), 'en') AS est FROM (
        |  SELECT graft_countmin(lang, 4, 512) AS sk FROM cm_docs GROUP BY source
        |)""".stripMargin).head.getLong(0)
    val exact = spark.sql(
      "SELECT count(*) FROM cm_docs WHERE lang = 'en'").head.getLong(0)
    assert(r === exact)
  }
}
