package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.LakeWriter

/** Z-order clustering: Morton interleave correctness and the actual
  * data-skipping payoff — a z-ordered layout must let parquet min/max
  * stats prune most of the corpus for a selective predicate on the
  * NON-leading dimension, where a plain single-column sort prunes
  * nothing.
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zvalue interleaves bits: dim d at bit i*n+d") {
    // x=3 (bits 0,1) -> z bits 0,2; y=5 (bits 0,2) -> z bits 1,5
    val r = spark.range(1)
      .select(GraftFunctions.zvalue(3)(lit(3L), lit(5L)).as("z"))
      .as[Long].head()
    assert(r === ((1L << 0) | (1L << 2) | (1L << 1) | (1L << 5)))
    // single dim with bits masking: identity on low bits
    val m = spark.range(1)
      .select(GraftFunctions.zvalue(4)(lit(0xFFL)).as("z")).as[Long].head()
    assert(m === 0xFL)
  }

  test("zvalue is monotone-preserving per sub-grid cell and null-safe") {
    val r = Seq((Option.empty[Long], 1L))
      .toDF("a", "b")
      .select(GraftFunctions.zvalue(4)(col("a"), col("b")))
      .head
    assert(r.isNullAt(0), "null dim must null the z-value")
  }

  test("z-order layout prunes files on the non-leading dimension") {
    // 64k rows over a 256x256 (uid, hr) grid, uniform
    val df = spark.range(65536).select(
      (col("id") % 256).as("uid"),
      (col("id") / 256).cast("long").as("hr"),
      col("id").as("payload"))
    val zDir = Files.createTempDirectory("zorder").toString
    val linDir = Files.createTempDirectory("linear").toString
    LakeWriter.zOrderWrite(df,
      Seq(col("uid"), col("hr")), bits = 8, zDir, numFiles = 64)
    // strawman: sorted + range-partitioned on uid only
    df.repartitionByRange(64, col("uid")).sortWithinPartitions("uid")
      .write.mode("overwrite").parquet(linDir)

    def scannedRows(dir: String): Long = {
      val q = spark.read.parquet(dir).where(col("hr") < 8)
      // collect() so the metrics below come from THIS execution (count()
      // would run a separate pruned-column plan)
      assert(q.collect().length === 8 * 256) // answer identical in both layouts
      val scans = q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }
      assert(scans.nonEmpty)
      scans.sum
    }
    val zRows = scannedRows(zDir)
    val linRows = scannedRows(linDir)
    // uid-sorted layout: every file spans all hr values -> no pruning,
    // full 64k rows surface from the scan. z-order: each of the 64
    // files covers a 32x32 sub-grid; hr<8 intersects the 8 files of the
    // bottom hr band (hr 0..31) -> ~8k rows scanned.
    assert(linRows === 65536L, s"strawman should scan everything, got $linRows")
    assert(zRows <= 65536L / 4,
      s"z-order should prune most files via parquet stats, scanned $zRows")
  }

  test("hilbert compaction prunes BOTH dimensions via a versioned table") {
    import graft.sources.{GraftTableScan, VersionedTable}
    // 64k rows over the same 256x256 grid, appended round-robin (no
    // layout), then laid out by compact(curve = hilbert)
    val df = spark.range(65536).select(
      (col("id") % 256).as("uid"),
      (col("id") / 256).cast("long").as("hr"),
      col("id").as("payload"))
    val t = Files.createTempDirectory("hilb_prune").toString + "/t"
    VersionedTable.append(spark, df.repartition(8), t)
    VersionedTable.compact(spark, t, numFiles = 64,
      zorderDims = Seq(col("uid"), col("hr")), curve = "hilbert")
    def planned(cond: org.apache.spark.sql.Column): (Int, Int) = {
      val got = spark.read.format("graft-table").load(t)
        .where(cond).count()
      assert(got === 8L * 256L)
      GraftTableScan.plannedFor(t)
    }
    // the curve's unit-step locality keeps each file a compact blob in
    // (uid, hr) space, so a band predicate on EITHER dimension prunes
    val (pHr, totalHr) = planned(col("hr") < 8)
    assert(totalHr === 64 && pHr <= 16,
      s"hr band should plan few of 64 hilbert files, planned $pHr")
    val (pUid, _) = planned(col("uid") < 8)
    assert(pUid <= 16,
      s"uid band should plan few of 64 hilbert files, planned $pUid")
  }

  test("hilbert index: known small curves, bijectivity, unit-step locality") {
    // order-1 (2x2) curve: (0,0)→0, (0,1)→1, (1,1)→2, (1,0)→3
    val order1 = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
      .select(GraftFunctions.hilbert(1)(col("x"), col("y")))
      .as[Long].collect()
    assert(order1 === Array(0L, 1L, 2L, 3L))
    // order-2 (4x4): the full canonical sequence
    val grid = for (x <- 0L until 4L; y <- 0L until 4L) yield (x, y)
    val d2 = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        GraftFunctions.hilbert(2)(col("x"), col("y")).as("d"))
      .as[(Long, Long, Long)].collect().map { case (x, y, d) => (x, y) -> d }
      .toMap
    assert(d2((0L, 0L)) === 0L && d2((1L, 0L)) === 1L &&
      d2((1L, 1L)) === 2L && d2((0L, 1L)) === 3L, "first sub-square is ⊐")
    assert(d2((3L, 0L)) === 15L && d2((2L, 0L)) === 14L &&
      d2((3L, 3L)) === 10L)
    // bijective over the grid, and consecutive d are unit grid steps —
    // the locality property z-order does NOT have
    assert(d2.values.toSeq.sorted === (0L until 16L))
    val byD = d2.map(_.swap)
    (0L until 15L).foreach { d =>
      val (x0, y0) = byD(d); val (x1, y1) = byD(d + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) === 1L,
        s"step $d -> ${d + 1} must be a unit move")
    }
    // inputs masked to bits; null dim nulls the index
    val masked = spark.range(1)
      .select(GraftFunctions.hilbert(2)(lit(4L + 3L), lit(16L + 0L)))
      .as[Long].head()
    assert(masked === d2((3L, 0L)))
    val nul = Seq((Option.empty[Long], 1L)).toDF("a", "b")
      .select(GraftFunctions.hilbert(4)(col("a"), col("b"))).head
    assert(nul.isNullAt(0), "null dim must null the hilbert index")
  }
}
