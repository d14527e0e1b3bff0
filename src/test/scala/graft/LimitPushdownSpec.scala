package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.{GraftTableScan, VersionedTable}

/** LIMIT / ORDER-BY-LIMIT pushdown into the graft-table scan: manifest
  * row counts and column bounds certify a file subset that provably
  * covers every valid result, so `ORDER BY k LIMIT 5` on a clustered
  * 100 TB table plans a handful of files instead of all of them. The
  * push is always PARTIAL — Spark re-applies the real sort and limit
  * above — so pruning is a pure optimization, and every gate (filters,
  * runtime DPP, delete layers, missing stats) fails toward planning
  * everything.
  */
class LimitPushdownSpec extends SparkTestBase {
  import spark.implicits._

  // per-table telemetry: the global hook races under parallel suites
  private def planned(t: String): (Int, Int) = GraftTableScan.plannedFor(t)
  private def load(t: String) = spark.read.format("graft-table").load(t)

  private def noCoalesce[A](body: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }

  /** Clustered table: keys 0..999 over 4 tight-range files. */
  private def clustered(): String = {
    val t = Files.createTempDirectory("lim").toString + "/t"
    VersionedTable.create(spark, t, new StructType()
      .add("k", "long").add("v", "double"))
    VersionedTable.alterProperties(spark, t,
      Map(VersionedTable.ClusterByProperty -> "k"))
    noCoalesce {
      VersionedTable.append(spark,
        spark.range(1000).toDF("k").withColumn("v", col("k") / 10.0)
          .orderBy(xxhash64(col("k"))), t)
    }
    assert(VersionedTable.latest(spark, t)._2.size === 4)
    t
  }

  test("ORDER BY k LIMIT n plans ONE file of four; result exact") {
    val t = clustered()
    val asc = load(t).orderBy("k").limit(5).collect().map(_.getLong(0))
    assert(asc.toSeq === (0L until 5L))
    assert(planned(t) === ((1, 4)), "top-n must plan only the lowest-range file")
    val desc = load(t).orderBy(col("k").desc).limit(5)
      .collect().map(_.getLong(0))
    assert(desc.toSeq === (999L to 995L by -1L))
    assert(planned(t) === ((1, 4)), "desc top-n plans only the highest-range file")
  }

  test("bare LIMIT plans just enough files by row count") {
    val t = clustered()
    assert(load(t).limit(3).collect().length === 3)
    assert(planned(t) === ((1, 4)))
    // a limit bigger than the table keeps everything and still answers
    assert(load(t).limit(5000).collect().length === 1000)
    assert(planned(t) === ((4, 4)))
  }

  test("any filter voids the certification: no limit pruning") {
    val t = clustered()
    val r = load(t).where(col("v") >= 0.0).orderBy("k").limit(5)
      .collect().map(_.getLong(0))
    assert(r.toSeq === (0L until 5L))
    assert(planned(t)._1 === 4, "filtered rows per file are unknown — " +
      "row-count certification must not fire")
  }

  test("nulls route correctly: ASC keeps the null file first, DESC " +
      "prunes it") {
    val t = Files.createTempDirectory("limn").toString + "/t"
    VersionedTable.create(spark, t, new StructType()
      .add("k", "long").add("v", "string"))
    // one all-null file, one valued file — separate commits
    VersionedTable.append(spark,
      Seq[(Option[Long], String)]((None, "n1"), (None, "n2"))
        .toDF("k", "v").coalesce(1), t)
    VersionedTable.append(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1), t)
    val asc = load(t).orderBy("k").limit(2).collect()
    assert(asc.forall(_.isNullAt(0)), "ASC nulls-first: top-2 are nulls")
    val desc = load(t).orderBy(col("k").desc).limit(2)
      .collect().map(_.getLong(0))
    assert(desc.toSeq === Seq(3L, 2L))
    assert(planned(t) === ((1, 2)),
      "DESC nulls-last: the all-null file is provably outside top-n")
  }

  test("a pending delete layer voids row counts: no pruning, right rows") {
    val t = clustered()
    VersionedTable.deleteByKeys(spark, t, Seq(0L, 1L).toDF("k"))
    val r = load(t).orderBy("k").limit(3).collect().map(_.getLong(0))
    assert(r.toSeq === Seq(2L, 3L, 4L))
    assert(planned(t)._1 === 4,
      "deleted rows make manifest row counts overcount — keep all files")
  }
}
