package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.{AnnIndex, Similarity}
import graft.sources.VersionedTable

/** Persisted ANN index lifecycle: build → load-from-disk → query parity
  * with the ad-hoc trainers, incremental append freshness, staleness
  * stamps, and the PQ/ADC storage path.
  */
class AnnIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8

  /** Deterministic pseudo-random corpus (same construction as the
    * distributed-trainer spec): hash-derived doubles in [-0.5, 0.5).
    */
  private def corpus(n: Int) = spark.range(n).select(
    col("id"),
    transform(sequence(lit(0), lit(dim - 1)),
      i => (shiftrightunsigned(xxhash64(col("id") * dim + i), 11)
        .cast("double") / (1L << 53).toDouble) - 0.5).as("v"))

  private def queries0 = corpus(200).where(col("id") < 3)
    .select(col("id").as("qid"), col("v").as("qv"))

  test("build → load from disk → exhaustive-probe topK equals brute " +
      "force; reuse does not retrain") {
    val dir = Files.createTempDirectory("graft_ann").toString + "/idx"
    val rows = corpus(200)
    val built = AnnIndex.build(spark, rows, "id", "v", dir,
      nlist = 8, iters = 3)
    assert(built.nlist === 8)
    assert(built.corpusVersion >= 2L) // create + append

    // a FRESH load reconstructs the handle purely from the lake tables
    val h = AnnIndex.load(spark, dir, "id", "v")
    (h.centroids zip built.centroids).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq, "loaded centroids must match built")
    }
    // nprobe = nlist probes every cell => provably brute force
    val idx = AnnIndex.topK(h, queries0, "qid", "qv", k = 5, nprobe = 8)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(rows, "id", "v",
      queries0, "qid", "qv", 5)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    assert(idx === brute)
    // and equals the ad-hoc ivfTopK under the same quantizer params
    // (same deterministic trainer => same centroids => same results at
    // any nprobe)
    val adhoc = Similarity.ivfTopK(rows, "id", "v", queries0, "qid", "qv",
      k = 5, nlist = 8, nprobe = 2, iters = 3)
      .select("qid", "id", "sim").as[(Long, Long, Double)].collect().toSet
    val idx2 = AnnIndex.topK(h, queries0, "qid", "qv", k = 5, nprobe = 2)
      .select("qid", "id", "sim").as[(Long, Long, Double)].collect().toSet
    assert(idx2 === adhoc,
      "persisted index must reproduce the ad-hoc query exactly")
  }

  test("index-backed knnJoin (large query side) equals brute force in " +
      "the exact configuration, salted or not") {
    val dir = Files.createTempDirectory("graft_ann_knn").toString + "/idx"
    val rows = corpus(150)
    AnnIndex.build(spark, rows, "id", "v", dir, nlist = 6, iters = 3)
    val h = AnnIndex.load(spark, dir, "id", "v")
    val allQ = rows.select(col("id").as("qid"), col("v").as("qv"))
    val brute = Similarity.bruteForceTopK(rows, "id", "v",
      allQ, "qid", "qv", 4)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    val knn = AnnIndex.knnJoin(h, allQ, "qid", "qv", k = 4, nprobe = 6)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(knn === brute)
    val salted = AnnIndex.knnJoin(h, allQ, "qid", "qv", k = 4, nprobe = 6,
      saltFactor = 3)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(salted === brute)
  }

  test("appendRows indexes new rows with the stored quantizer and a " +
      "reload sees them; staleness stamp tracks the source table") {
    val tmp = Files.createTempDirectory("graft_ann2").toString
    val dir = tmp + "/idx"
    val src = tmp + "/src"
    val rows = corpus(100)
    // source lake table (for the staleness stamp)
    VersionedTable.create(spark, src,
      StructType(rows.schema.fields))
    VersionedTable.append(spark, rows, src)
    val srcV = VersionedTable.latest(spark, src)._1

    AnnIndex.build(spark, rows, "id", "v", dir, nlist = 4, iters = 2,
      sourceVersion = Some(srcV))
    assert(!AnnIndex.isStale(spark, dir, src),
      "freshly built index must not be stale")

    // a query vector identical to a NEW row: before append the row is
    // absent, after append it must rank first
    val h0 = AnnIndex.load(spark, dir, "id", "v")
    val probe = corpus(1001).where(col("id") === 1000L)
      .select(col("id").as("qid"), col("v").as("qv"))
    val before = AnnIndex.topK(h0, probe, "qid", "qv", k = 3, nprobe = 4)
      .select("id").as[Long].collect().toSet
    assert(!before.contains(1000L))

    val newRows = corpus(1001).where(col("id") >= 1000L)
    val v2 = AnnIndex.appendRows(spark, dir, newRows, "id", "v")
    assert(v2 > h0.corpusVersion, "append must commit a new version")
    val h1 = AnnIndex.load(spark, dir, "id", "v")
    // self-match is excluded; the appended row can still be found by
    // querying with a DIFFERENT id but the same vector
    val probe2 = probe.select(lit(-1L).as("qid"), col("qv"))
    val hits = AnnIndex.topK(h1, probe2, "qid", "qv", k = 1, nprobe = 4)
      .select("id").as[Long].collect()
    assert(hits.toSeq === Seq(1000L),
      "appended row must be indexed into its cell and found")

    // source moves on => index reports stale
    VersionedTable.append(spark, newRows, src)
    assert(AnnIndex.isStale(spark, dir, src))
  }

  test("PQ index stores codes; ADC query over stored codes equals the " +
      "ad-hoc pqTopKAdc pipeline") {
    val dir = Files.createTempDirectory("graft_ann3").toString + "/idx"
    val rows = corpus(150)
    AnnIndex.build(spark, rows, "id", "v", dir, nlist = 4, iters = 2,
      pq = Some((2, 16)))
    val h = AnnIndex.load(spark, dir, "id", "v")
    assert(h.codebooks.isDefined && h.codebooks.get.length === 2)
    assert(h.corpus.columns.contains("__codes"))
    // exhaustive probe: every candidate scored, so the only difference
    // from ad-hoc pqTopKAdc (which has no coarse quantizer) is the
    // cell routing — scores and ranking must coincide
    val idx = AnnIndex.topKAdc(h, queries0, "qid", "qv", k = 5, nprobe = 4)
      .select("qid", "id", "sim").as[(Long, Long, Double)].collect().toSet
    val adhoc = Similarity.pqTopKAdc(rows, "id", "v", queries0, "qid", "qv",
      k = 5, m = 2, ksub = 16, iters = 2)
      .select("qid", "id", "sim").as[(Long, Long, Double)].collect().toSet
    assert(idx === adhoc)
  }
}
