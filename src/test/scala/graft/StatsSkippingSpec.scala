package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{GraftTableScan, VersionedTable}

/** Manifest-level per-file column stats (`#stats` lines) + plan-time and
  * runtime file skipping in the `graft-table` batch scan: filtered scans
  * of a clustered table must launch tasks ONLY for the files whose
  * bounds can match — at 100 TB the difference between a full-listing
  * scan and a handful of tasks — while every answer stays byte-identical
  * to an unskipped read.
  */
class StatsSkippingSpec extends SparkTestBase {
  import spark.implicits._

  /** 1000 rows in 10 range-clustered files: file i holds k in
    * [i*100, i*100+99], s = "doc-%04d", ts hourly from epoch, v = k/10.0,
    * and nv null everywhere except file 7.
    */
  private def clustered(t: String): Unit = {
    val df = spark.range(1000).toDF("k")
      .withColumn("s", format_string("doc-%04d", col("k")))
      .withColumn("ts", expr("timestamp_micros(k * 3600000000)"))
      .withColumn("v", col("k") / 10.0)
      .withColumn("nv", when(col("k").between(700, 799), col("k")))
      .repartitionByRange(10, col("k"))
      .sortWithinPartitions("k")
    VersionedTable.append(spark, df, t)
  }

  // per-table telemetry: the global hook races under parallel suites
  private def planned(t: String): (Int, Int) = GraftTableScan.plannedFor(t)

  private def load(t: String) = spark.read.format("graft-table").load(t)

  test("point, range, string, timestamp and null predicates skip files") {
    val t = Files.createTempDirectory("sk_a").toString + "/t"
    clustered(t)
    val (_, files) = VersionedTable.latest(spark, t)
    assert(files.size === 10, "fixture should be 10 range-clustered files")

    assert(load(t).where(col("k") === 555).count() === 1L)
    assert(planned(t) === ((1, 10)), "point lookup plans exactly one file")

    assert(load(t).where(col("k").between(120, 280)).count() === 161L)
    assert(planned(t) === ((2, 10)), "range filter plans the two hit files")

    assert(load(t).where(col("s") === "doc-0042").count() === 1L)
    assert(planned(t) === ((1, 10)), "string bounds prune")

    assert(load(t).where(col("s").startsWith("doc-09")).count() === 100L)
    assert(planned(t) === ((1, 10)), "startsWith prunes by prefix bounds")

    // int64-micros timestamps (stage() upgrades INT96 sessions) make
    // event-time predicates skippable — the #1 predicate of a lake
    assert(load(t)
      .where(col("ts") < expr("timestamp_micros(200 * 3600000000)"))
      .count() === 200L)
    assert(planned(t) === ((2, 10)), "timestamp bounds prune")

    assert(load(t).where(col("nv").isNotNull).count() === 100L)
    assert(planned(t) === ((1, 10)), "all-null files skipped by IsNotNull")

    assert(load(t).where(col("nv").isNull).count() === 900L)
    assert(planned(t) === ((9, 10)),
      "file 7 records zero nulls in nv, so IsNull skips exactly it")

    // an impossible predicate plans nothing at all
    assert(load(t).where(col("k") === 5000).count() === 0L)
    assert(planned(t) === ((0, 10)))
  }

  test("skipped answers equal unskipped answers (option off)") {
    val t = Files.createTempDirectory("sk_eq").toString + "/t"
    clustered(t)
    val pred = col("k").between(42, 357) && col("v") < 30.0
    val fast = load(t).where(pred).select("k", "s", "v").collect().toSet
    assert(planned(t)._1 < planned(t)._2, "predicate should have pruned")
    val slow = spark.read.format("graft-table")
      .option("statsSkipping", "false").load(t)
      .where(pred).select("k", "s", "v").collect().toSet
    assert(planned(t) === ((10, 10)), "option off plans everything")
    assert(fast === slow)
  }

  test("stats survive column rename: bounds are field-id keyed") {
    val t = Files.createTempDirectory("sk_rn").toString + "/t"
    VersionedTable.create(spark, t, new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("s", "string"))
    VersionedTable.append(spark,
      spark.range(1000).toDF("k")
        .withColumn("s", format_string("doc-%04d", col("k")))
        .repartitionByRange(10, col("k")).sortWithinPartitions("k"), t)
    VersionedTable.renameColumn(spark, t, "k", "key")
    assert(load(t).where(col("key") === 17).count() === 1L)
    assert(planned(t) === ((1, 10)),
      "stats written under the old name still prune via the field id")
  }

  test("a table without stats lines plans everything, correctly") {
    val t = Files.createTempDirectory("sk_old").toString + "/t"
    clustered(t)
    // simulate a pre-stats manifest: strip the #stats lines in place
    val mf = new java.io.File(s"$t/_commits").listFiles().filter(
      _.getName.startsWith("v")).maxBy(_.getName)
    val kept = scala.io.Source.fromFile(mf).getLines()
      .filterNot(_.startsWith("#stats ")).mkString("\n") + "\n"
    val tmp = new java.io.File(mf.getParentFile, "rewrite.tmp")
    java.nio.file.Files.write(tmp.toPath, kept.getBytes("UTF-8"))
    assert(mf.delete() && tmp.renameTo(mf))
    VersionedTable.invalidateCache(t)
    assert(load(t).where(col("k") === 555).count() === 1L)
    assert(planned(t) === ((10, 10)), "no stats -> no skipping, no failure")
  }

  test("every commit carries stats forward; metadata-only commits too") {
    val t = Files.createTempDirectory("sk_carry").toString + "/t"
    clustered(t)
    VersionedTable.append(spark,
      Seq((2000L, "doc-2000",
        new java.sql.Timestamp(0), 0.0, Option.empty[Long]))
        .toDF("k", "s", "ts", "v", "nv"), t)
    VersionedTable.alterProperties(spark, t, Map("graft.x" -> "1"))
    val (v, files) = VersionedTable.latest(spark, t)
    val lines = scala.io.Source.fromFile(
      s"$t/_commits/v${"%08d".format(v)}").getLines().toSeq
    val statFiles = lines.filter(_.startsWith("#stats "))
      .map(_.stripPrefix("#stats ").takeWhile(_ != ' ')).toSet
    assert(statFiles === files.toSet,
      "one #stats line per live data file, including carried-forward ones")
    // and the new single-row file is immediately skippable
    assert(load(t).where(col("k") === 2000).count() === 1L)
    assert(planned(t) === ((1, 11)))
  }

  test("merge-on-read delete layers compose with file skipping") {
    val t = Files.createTempDirectory("sk_mor").toString + "/t"
    VersionedTable.create(spark, t, new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("s", "string"))
    VersionedTable.append(spark,
      spark.range(1000).toDF("k")
        .withColumn("s", format_string("doc-%04d", col("k")))
        .repartitionByRange(10, col("k")).sortWithinPartitions("k"), t)
    VersionedTable.deleteByKeys(spark, t, Seq(120L, 125L).toDF("k"))
    assert(load(t).where(col("k").between(120, 129)).as[(Long, String)]
      .collect().map(_._1).sorted.toSeq ===
      Seq(121L, 122L, 123L, 124L, 126L, 127L, 128L, 129L))
    assert(planned(t)._1 <= 2, "skipping still prunes under a delete layer")
  }

  test("runtime join filters prune files before tasks launch (storage DPP)") {
    val t = Files.createTempDirectory("sk_dpp").toString + "/t"
    clustered(t)
    // DPP wants a SELECTIVE predicate on the build side — the classic
    // star-join shape: a small dimension filtered to one slice
    val dim = spark.range(1000).toDF("k")
      .withColumn("bucket", (col("k") / 50).cast("int"))
      .where(col("bucket") === 2) // k in [100, 149]
    val got = load(t).join(dim, "k").count()
    assert(got === 50L)
    val (kept, total) = planned(t)
    assert(total === 10)
    assert(kept < 10,
      s"runtime In-filter from the join should prune files, planned $kept/$total")
  }
}
