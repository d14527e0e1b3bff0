package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{GraftCatalog, VersionedTable}

/** Hash-bucketed tables (`graft.bucketBy`) and storage-partitioned
  * joins: every data file holds one murmur3 bucket of the key and
  * carries it in its name, the scan reports
  * `KeyGroupedPartitioning(bucket(n, k))`, and two tables bucketed the
  * same way JOIN WITH NO EXCHANGE on either side — the 100 TB fact-fact
  * join killer feature (Iceberg bucket-SPJ parity).
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  private val wh = Files.createTempDirectory("bkt").toString
  spark.conf.set("spark.sql.catalog.bkt", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.bkt.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS bkt.ns")

  private def withSpj[A](body: => A): A = {
    val key = "spark.sql.sources.v2.bucketing.enabled"
    val prev = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    try body finally spark.conf.set(key, prev)
  }

  private def shuffles(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))

  private def mk(name: String, rows: Int, seed: Int): String = {
    spark.sql(s"CREATE TABLE bkt.ns.$name (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.bucketBy'='k,4')")
    spark.range(rows).toDF("k")
      .withColumn("v", format_string(s"$name-%d", col("k")))
      .orderBy(xxhash64(col("k"), lit(seed)))
      .write.format("graft-table").mode("append")
      .insertInto(s"bkt.ns.$name")
    s"$wh/ns/$name"
  }

  test("writes produce bucket-pure, bucket-named files") {
    val path = mk("pure", 1000, 1)
    val (_, files) = VersionedTable.latest(spark, path)
    assert(files.nonEmpty)
    assert(files.forall(f => f.matches("part-b\\d+of4-.*\\.parquet")), files)
    // each file holds exactly the rows whose murmur3 bucket is its name
    files.foreach { f =>
      val b = "part-b(\\d+)of4-.*".r.findFirstMatchIn(f).get.group(1).toInt
      val got = spark.read.parquet(s"$path/$f")
        .select(pmod(hash(col("k")), lit(4)).as("b"))
        .distinct().as[Int].collect().toSeq
      assert(got == Seq(b), s"file $f claims bucket $b, holds $got")
    }
  }

  test("same-bucketing join plans with ZERO exchanges; result correct") {
    mk("fact", 2000, 2)
    mk("dim", 500, 3)
    withSpj {
      val j = spark.sql(
        "SELECT f.k, f.v, d.v AS dv FROM bkt.ns.fact f " +
          "JOIN bkt.ns.dim d ON f.k = d.k " +
          "WHERE d.k IS NOT NULL")
      // force sort-merge so the broadcast path can't mask the SPJ
      val noBc = spark.sql(
        "SELECT /*+ MERGE(d) */ f.k, d.v AS dv FROM bkt.ns.fact f " +
          "JOIN bkt.ns.dim d ON f.k = d.k")
      assert(shuffles(noBc) === 0,
        noBc.queryExecution.executedPlan.toString)
      assert(noBc.count() === 500L)
      assert(j.count() === 500L)
      assert(j.where(col("k") === 123).head().getString(2) === "dim-123")
    }
  }

  test("aggregation on the bucket key needs no exchange") {
    val path = mk("agg", 1500, 4)
    withSpj {
      val g = spark.sql(
        "SELECT k, count(*) AS c FROM bkt.ns.agg GROUP BY k")
      assert(shuffles(g) === 0, g.queryExecution.executedPlan.toString)
      assert(g.count() === 1500L)
      assert(g.agg(sum("c")).head().getLong(0) === 1500L)
    }
    assert(path.nonEmpty)
  }

  test("delete layers and foreign files disable SPJ soundly; compact restores") {
    val path = mk("layered", 800, 5)
    withSpj {
      def join = spark.sql(
        "SELECT /*+ MERGE(b) */ a.k FROM bkt.ns.layered a " +
          "JOIN bkt.ns.layered b ON a.k = b.k")
      assert(shuffles(join) === 0)
      // a pending equality-delete layer hides rows footer-planning can't
      // see per-bucket — reporting must stop, answers stay right
      VersionedTable.deleteByKeys(spark, path, Seq(1L, 2L).toDF("k"))
      assert(shuffles(join) > 0, "layered snapshot must not report SPJ")
      assert(join.count() === 798L)
      // compaction materializes the layer AND re-buckets — SPJ returns
      VersionedTable.compact(spark, path, numFiles = 4)
      assert(shuffles(join) === 0)
      assert(join.count() === 798L)
    }
  }

  test("bucketing is set-once; rename follows; drop refused") {
    val path = mk("fixed", 100, 6)
    intercept[IllegalArgumentException] {
      VersionedTable.alterProperties(spark, path,
        Map(VersionedTable.BucketByProperty -> "k,8"))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.alterProperties(spark, path, Map.empty,
        unset = Seq(VersionedTable.BucketByProperty))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, path, "k")
    }
    VersionedTable.renameColumn(spark, path, "k", "key")
    assert(VersionedTable.tableProperties(spark, path)
      .get(VersionedTable.BucketByProperty) === Some("key,4"))
    // post-rename writes keep bucketing on the renamed column
    Seq((5000L, "late")).toDF("key", "v").write.format("graft-table")
      .mode("append").insertInto("bkt.ns.fixed")
    val (_, files) = VersionedTable.latest(spark, path)
    assert(files.forall(_.matches("part-b\\d+of4-.*\\.parquet")))
  }

  test("row-level rewrites keep files bucketed (upsert survivors)") {
    val path = mk("rw", 600, 7)
    VersionedTable.upsert(spark,
      Seq((10L, "updated"), (9999L, "new")).toDF("k", "v"), path, "k")
    val (_, files) = VersionedTable.latest(spark, path)
    assert(files.forall(_.matches("part-b\\d+of4-.*\\.parquet")),
      "survivor rewrites and update rows must stay bucket-pure")
    withSpj {
      val j = spark.sql(
        "SELECT /*+ MERGE(b) */ a.v FROM bkt.ns.rw a " +
          "JOIN bkt.ns.rw b ON a.k = b.k WHERE a.k = 10")
      assert(shuffles(j) === 0)
      assert(j.head().getString(0) === "updated")
    }
  }
}
