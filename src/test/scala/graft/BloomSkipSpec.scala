package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{GraftTableScan, VersionedTable}

/** Parquet-native bloom-filter file skipping: the point-lookup
  * complement of min/max bounds. Fixture values are SCATTERED so every
  * file's [min, max] overlaps — bounds can never prune; only the blooms
  * can.
  */
class BloomSkipSpec extends SparkTestBase {
  import spark.implicits._

  /** 4000 rows in 8 files; `fp` is a scatter (k * prime mod 4001) so
    * each file spans nearly the whole fp domain — min/max useless —
    * while each fp value lives in exactly one file.
    */
  private def scattered(t: String, withBlooms: Boolean): Unit = {
    if (withBlooms) {
      VersionedTable.create(spark, t, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("fp",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType))))
      VersionedTable.alterProperties(spark, t,
        Map("graft.bloom.columns" -> "fp,s", "graft.bloom.ndv" -> "1000"))
    }
    val df = spark.range(4000).toDF("k")
      .withColumn("fp", col("k") * 2654435761L % 4001)
      .withColumn("s", format_string("doc-%06d", col("fp")))
      .repartitionByRange(8, col("k")) // ranges on k, NOT on fp
      .sortWithinPartitions("k")
    VersionedTable.append(spark, df, t)
  }

  // per-table telemetry: the global hook races under parallel suites
  private def planned(t: String): (Int, Int) = GraftTableScan.plannedFor(t)
  private def load(t: String) = spark.read.format("graft-table").load(t)

  test("point lookups on a scattered column plan only the bloom-hit files") {
    val t = Files.createTempDirectory("bloom_a").toString + "/t"
    scattered(t, withBlooms = true)
    assert(VersionedTable.latest(spark, t)._2.size === 8)

    // a present long value: exactly one file holds it; blooms must cut
    // the plan to that file (+ any false positives — with ndv=1000 and
    // 500 rows/file the fp rate is far below 1 extra file in expectation,
    // but stay robust: assert a real cut, and exactness on the answer)
    val probe = 777L * 2654435761L % 4001
    assert(load(t).where(col("fp") === probe).count() ===
      spark.range(4000).where(col("id") * 2654435761L % 4001 === probe)
        .count())
    val (p1, total1) = planned(t)
    assert(total1 === 8 && p1 <= 2,
      s"bloom probe should plan ~1 of 8 files, planned $p1")

    // the one ABSENT residue (k→k·p mod 4001 over k<4000 misses exactly
    // 3683): blooms prune (near-)everything — a bloom answers
    // probabilistically, so allow a stray false-positive file; the
    // ANSWER is exact regardless
    assert(load(t).where(col("fp") === 3683L).count() === 0L)
    assert(planned(t)._1 <= 1,
      s"absent value should plan ~0 files, planned ${planned(t)._1}")

    // string column blooms prune the same way
    assert(load(t).where(col("s") === f"doc-$probe%06d").count() >= 1L)
    assert(planned(t)._1 <= 2, "string bloom must prune")

    // small IN-set: union of per-value hits
    val probes = Seq(11L, 222L, 3333L).map(_ * 2654435761L % 4001)
    assert(load(t).where(col("fp").isin(probes: _*)).count() === 3L)
    assert(planned(t)._1 <= 4, "IN-set bloom probes must prune")

    // bloomskipping=false parity: same answers, no bloom pruning
    val viaBloom = load(t).where(col("fp") === probe).count()
    val raw = spark.read.format("graft-table")
      .option("bloomskipping", "false").load(t)
      .where(col("fp") === probe).count()
    assert(planned(t)._1 === 8, "opt-out must scan all files")
    assert(raw === viaBloom)
  }

  test("without the property nothing prunes (bounds overlap by design)") {
    val t = Files.createTempDirectory("bloom_b").toString + "/t"
    scattered(t, withBlooms = false)
    assert(load(t).where(col("fp") === 42L).count() <= 1L)
    assert(planned(t)._1 === 8, "no blooms, overlapping bounds: full scan")
  }

  test("range predicates and nulls never consult blooms; answers exact") {
    val t = Files.createTempDirectory("bloom_c").toString + "/t"
    scattered(t, withBlooms = true)
    // range predicate: blooms can't answer it; bounds on k still do.
    // <= 2, not == 1: repartitionByRange SAMPLES its boundaries (seeded
    // by the global rdd id), so under a full parallel suite the k=500
    // split can land just past the predicate and legitimately straddle
    // two files — the pruning claim (8 -> ~1) is what matters
    assert(load(t).where(col("k") < 500).count() === 500L)
    assert(planned(t)._1 <= 2, "k is range-clustered: bounds prune")
    // a full scan query stays byte-identical to the parquet truth
    val viaLake = load(t).orderBy("k").collect()
    val direct = spark.range(4000).toDF("k")
      .withColumn("fp", col("k") * 2654435761L % 4001)
      .withColumn("s", format_string("doc-%06d", col("fp")))
      .orderBy("k").collect()
    assert(viaLake.toSeq === direct.toSeq)
  }

  test("blooms survive compaction (rewritten files re-carry them)") {
    val t = Files.createTempDirectory("bloom_d").toString + "/t"
    scattered(t, withBlooms = true)
    VersionedTable.compact(spark, t, numFiles = 4)
    val probe = 123L * 2654435761L % 4001
    assert(load(t).where(col("fp") === probe).count() === 1L)
    val (p, total) = planned(t)
    assert(total === 4 && p <= 2,
      s"post-compaction blooms should prune, planned $p of $total")
  }
}
