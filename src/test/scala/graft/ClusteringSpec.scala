package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.{GraftCatalog, GraftTableScan, VersionedTable}

/** Clustering-on-write (`graft.clusterBy`): ingest commits range-
  * partition + sort on the declared columns, so the manifest `#stats`
  * bounds are tight from the first append and plan-time file skipping
  * fires without waiting for a z-order compaction. At 100 TB this is
  * the difference between "fast after OPTIMIZE" and "fast always" —
  * Delta liquid-clustering / Iceberg write-order semantics.
  */
class ClusteringSpec extends SparkTestBase {
  import spark.implicits._

  // per-table telemetry: the global hook races under parallel suites
  private def planned(t: String): (Int, Int) = GraftTableScan.plannedFor(t)
  private def load(t: String) = spark.read.format("graft-table").load(t)

  /** Shuffled 1000-row frame: k in [0,1000) in RANDOM row order, so any
    * range locality in the written files comes from clustering alone.
    */
  private def shuffled(seed: Int) =
    spark.range(1000).toDF("k")
      .withColumn("s", format_string("doc-%04d", col("k")))
      .withColumn("v", col("k") / 10.0)
      .orderBy(xxhash64(col("k"), lit(seed)))

  /** Run `body` with AQE partition coalescing off so a clustered write
    * fans out to the session's 4 shuffle partitions (the test fixture
    * is tiny; AQE would rightly coalesce it to one file and leave
    * nothing to prune).
    */
  private def noCoalesce[A](body: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }

  private def newTable(): String = {
    val t = Files.createTempDirectory("clus").toString + "/t"
    VersionedTable.create(spark, t, new StructType()
      .add("k", "long").add("s", "string").add("v", "double"))
    VersionedTable.alterProperties(spark, t,
      Map(VersionedTable.ClusterByProperty -> "k"))
    t
  }

  test("appends of unsorted data write range-clustered, prunable files") {
    val t = newTable()
    noCoalesce { VersionedTable.append(spark, shuffled(1), t) }
    val (_, files) = VersionedTable.latest(spark, t)
    assert(files.size === 4, "clustered append fans out to 4 range files")
    assert(load(t).where(col("k") === 555).count() === 1L)
    assert(planned(t) === ((1, 4)),
      "a point lookup on shuffled-but-clustered input plans ONE file")
    assert(load(t).where(col("k").between(10, 240)).count() === 231L)
    assert(planned(t)._1 === 1, "250-row ranges: [10,240] sits in one file")

    // a second unsorted append clusters independently — the point
    // query now hits exactly one file per commit
    noCoalesce { VersionedTable.append(spark, shuffled(2), t) }
    assert(load(t).where(col("k") === 555).count() === 2L)
    assert(planned(t) === ((2, 8)))
  }

  test("a frame missing a cluster column still appends (layout, not gate)") {
    val t = Files.createTempDirectory("clus_nc").toString + "/t"
    // pre-schema table: no declared schema, narrower frames allowed
    VersionedTable.append(spark, spark.range(3).toDF("k"), t)
    VersionedTable.alterProperties(spark, t,
      Map(VersionedTable.ClusterByProperty -> "k"))
    VersionedTable.append(spark, Seq("x").toDF("s"), t)
    assert(VersionedTable.read(spark, t).count() === 4L)
  }

  test("alterProperties validates cluster columns exist and are orderable") {
    val t = Files.createTempDirectory("clus_v").toString + "/t"
    VersionedTable.create(spark, t, new StructType()
      .add("k", "long")
      .add("m", org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType)))
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.alterProperties(spark, t,
        Map(VersionedTable.ClusterByProperty -> "nope"))
    }
    assert(e1.getMessage.contains("not a top-level column"))
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.alterProperties(spark, t,
        Map(VersionedTable.ClusterByProperty -> "m"))
    }
    assert(e2.getMessage.contains("unorderable"))
    intercept[IllegalArgumentException] {
      VersionedTable.alterProperties(spark, t,
        Map(VersionedTable.ClusterByProperty -> " , "))
    }
  }

  test("rename carries the clustering property; drop refuses on it") {
    val t = newTable()
    noCoalesce { VersionedTable.append(spark, shuffled(3), t) }
    VersionedTable.renameColumn(spark, t, "k", "key")
    assert(VersionedTable.tableProperties(spark, t)
      .get(VersionedTable.ClusterByProperty) === Some("key"))
    // writes after the rename cluster on the renamed column
    noCoalesce { VersionedTable.append(spark,
      shuffled(4).withColumnRenamed("k", "key"), t) }
    assert(load(t).where(col("key") === 77).count() === 2L)
    assert(planned(t) === ((2, 8)), "pre- and post-rename files both prune")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, t, "key")
    }
    assert(e.getMessage.contains(VersionedTable.ClusterByProperty))
  }

  test("compact without dims preserves the clustered layout") {
    val t = newTable()
    noCoalesce {
      VersionedTable.append(spark, shuffled(5), t)
      VersionedTable.append(spark, shuffled(6), t)
    }
    noCoalesce { VersionedTable.compact(spark, t, numFiles = 4) }
    val (_, files) = VersionedTable.latest(spark, t)
    assert(files.size === 4)
    assert(load(t).where(col("k") === 321).count() === 2L)
    assert(planned(t) === ((1, 4)),
      "compaction re-clusters instead of round-robining the layout away")
    // answers survive the re-layout
    assert(load(t).agg(sum("k")).head().getLong(0) === 2L * 999 * 1000 / 2)
  }

  test("upsert update rows are clustered; the table stays prunable") {
    val t = newTable()
    noCoalesce {
      VersionedTable.append(spark, shuffled(7), t)
      VersionedTable.upsert(spark,
        shuffled(8).where(col("k") < 100).withColumn("v", lit(-1.0)),
        t, "k")
    }
    assert(load(t).where(col("k") === 55).select("v").head().getDouble(0)
      === -1.0)
    val (p, n) = planned(t)
    assert(p < n, "post-upsert point lookup still skips files")
  }

  test("CREATE TABLE ... TBLPROPERTIES clusterBy works end to end") {
    val dir = Files.createTempDirectory("clus_cat").toString
    spark.conf.set("spark.sql.catalog.clc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.clc.warehouse", dir)
    spark.sql("CREATE NAMESPACE clc.ns")
    spark.sql("CREATE TABLE clc.ns.t (k BIGINT, s STRING) " +
      "TBLPROPERTIES ('graft.clusterBy'='k')")
    assert(VersionedTable.tableProperties(spark, s"$dir/ns/t")
      .get(VersionedTable.ClusterByProperty) === Some("k"))
    noCoalesce {
      shuffled(9).select("k", "s").write.format("graft-table")
        .mode("append").insertInto("clc.ns.t")
    }
    assert(spark.table("clc.ns.t").where(col("k") === 123).count() === 1L)
    assert(planned(s"$dir/ns/t")._1 === 1, "catalog-born clustering prunes")
    // an invalid clusterBy column fails the DDL and leaves NO table
    intercept[Exception] {
      spark.sql("CREATE TABLE clc.ns.bad (k BIGINT) " +
        "TBLPROPERTIES ('graft.clusterBy'='zzz')")
    }
    assert(!spark.sql("SHOW TABLES IN clc.ns").collect()
      .map(_.getString(1)).contains("bad"))
    assert(!new java.io.File(s"$dir/ns/bad").exists())
  }

  test("PARTITIONED BY / CLUSTER BY transforms map to range clustering") {
    val dir = Files.createTempDirectory("clus_pt").toString
    spark.conf.set("spark.sql.catalog.clp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.clp.warehouse", dir)
    spark.sql("CREATE NAMESPACE clp.ns")
    spark.sql("CREATE TABLE clp.ns.p (k BIGINT, s STRING) PARTITIONED BY (k)")
    assert(VersionedTable.tableProperties(spark, s"$dir/ns/p")
      .get(VersionedTable.ClusterByProperty) === Some("k"))
    spark.sql("CREATE TABLE clp.ns.c (k BIGINT, s STRING) CLUSTER BY (k)")
    assert(VersionedTable.tableProperties(spark, s"$dir/ns/c")
      .get(VersionedTable.ClusterByProperty) === Some("k"))
    spark.sql(
      "CREATE TABLE clp.ns.d (ts TIMESTAMP, v DOUBLE) PARTITIONED BY (days(ts))")
    assert(VersionedTable.tableProperties(spark, s"$dir/ns/d")
      .get(VersionedTable.ClusterByProperty) === Some("ts"))
    // the mapped layout actually prunes
    noCoalesce {
      shuffled(10).select(col("k"), col("s")).write.format("graft-table")
        .mode("append").insertInto("clp.ns.p")
    }
    assert(spark.table("clp.ns.p").where(col("k") === 42).count() === 1L)
    assert(planned(s"$dir/ns/p")._1 === 1, "PARTITIONED BY-born clustering prunes")
    // hash buckets have no range equivalent — refused, nothing created
    intercept[Exception] {
      spark.sql("CREATE TABLE clp.ns.b (k BIGINT) " +
        "PARTITIONED BY (bucket(4, k))")
    }
    assert(!new java.io.File(s"$dir/ns/b").exists())
    // conflicting explicit property + transform is refused
    intercept[Exception] {
      spark.sql("CREATE TABLE clp.ns.x (k BIGINT, j BIGINT) " +
        "PARTITIONED BY (k) TBLPROPERTIES ('graft.clusterBy'='j')")
    }
    assert(!new java.io.File(s"$dir/ns/x").exists())
  }

  test("CTAS with a layout clause persists it; REPLACE resets and re-declares") {
    val dir = Files.createTempDirectory("clus_ct").toString
    spark.conf.set("spark.sql.catalog.clr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.clr.warehouse", dir)
    spark.sql("CREATE NAMESPACE clr.ns")
    shuffled(11).createOrReplaceTempView("clus_src")
    noCoalesce {
      spark.sql("CREATE TABLE clr.ns.t CLUSTER BY (k) AS " +
        "SELECT k, s FROM clus_src")
    }
    val path = s"$dir/ns/t"
    assert(VersionedTable.tableProperties(spark, path)
      .get(VersionedTable.ClusterByProperty) === Some("k"))
    assert(spark.table("clr.ns.t").count() === 1000L)
    // the CTAS data ITSELF is clustered — a point query prunes before
    // any post-CTAS write or compaction
    assert(spark.table("clr.ns.t").where(col("k") === 500).count() === 1L)
    assert(planned(path) === ((1, 4)), "CTAS initial files prune")
    noCoalesce {
      shuffled(12).select(col("k"), col("s")).write.format("graft-table")
        .mode("append").insertInto("clr.ns.t")
    }
    assert(spark.table("clr.ns.t").where(col("k") === 7).count() === 2L)
    assert(planned(path) === ((2, 8)), "post-CTAS appends prune too")
    // REPLACE without a layout clause resets the property...
    spark.sql("REPLACE TABLE clr.ns.t (k BIGINT, s STRING)")
    assert(VersionedTable.tableProperties(spark, path)
      .get(VersionedTable.ClusterByProperty) === None)
    // ...and REPLACE ... AS SELECT with one re-declares it, clustering
    // the replacement data itself
    noCoalesce {
      spark.sql("REPLACE TABLE clr.ns.t CLUSTER BY (k) AS " +
        "SELECT k, s FROM clus_src")
    }
    assert(VersionedTable.tableProperties(spark, path)
      .get(VersionedTable.ClusterByProperty) === Some("k"))
    assert(spark.table("clr.ns.t").count() === 1000L)
    assert(spark.table("clr.ns.t").where(col("k") === 500).count() === 1L)
    assert(planned(path)._1 === 1, "RTAS replacement files prune")
  }
}
