package graft

import org.apache.spark.sql.functions._
import graft.operators.Fanout

/** The fan-out probe contract, ENFORCED (r15 ADVICE): `fanOut` /
  * `isNarrow` read partition width via `queryExecution.toRdd`, which is
  * only lazy on an exchange-free plan — under AQE a probed plan that
  * contains shuffles would materialize them eagerly (double execution).
  * The probe now inspects the physical plan first and skips frames that
  * carry an Exchange, so a violating caller gets a no-op instead of a
  * silent eager run.
  */
class FanoutSpec extends SparkTestBase {
  import spark.implicits._

  private def narrowScan(n: Int): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fanout").toString
    (1 to n).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("fanOut widens a one-file scan to session parallelism") {
    val df = narrowScan(64)
    assert(df.rdd.getNumPartitions === 1)
    val wide = Fanout.fanOut(df)
    assert(wide.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // row multiset unchanged
    assert(wide.orderBy("id").collect().map(_.getLong(0)).toSeq ===
      (1L to 64L))
  }

  test("fanOut on a shuffle-bearing frame is an identity no-op") {
    val agg = narrowScan(64).groupBy("payload").agg(sum("id").as("s"))
    // reference equality: the probe never ran, no throwaway
    // QueryExecution materialized the aggregate's shuffle
    assert(Fanout.fanOut(agg) eq agg)
    val rep = narrowScan(64).repartition(8)
    assert(Fanout.fanOut(rep) eq rep)
  }

  test("isNarrow: true for a one-file scan, false once a shuffle exists") {
    val df = narrowScan(64)
    assert(Fanout.isNarrow(df))
    assert(!Fanout.isNarrow(df.groupBy("payload").count()))
    // a probe-safe localCheckpoint of a shuffled frame plans as a scan
    val ck = df.repartition(4).localCheckpoint(true)
    assert(!Fanout.isNarrow(ck) || ck.rdd.getNumPartitions <
      spark.sparkContext.defaultParallelism)
  }

  test("fanOutDerived keys off the probe, not the derived frame") {
    val probe = narrowScan(16)
    val derived = probe.crossJoin(probe.select(col("id").as("id2")))
    val spread = Fanout.fanOutDerived(derived, probe)
    assert(spread.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // an exchange-bearing probe reports not-narrow: derived untouched
    val shuffledProbe = probe.repartition(2)
    assert(Fanout.fanOutDerived(derived, shuffledProbe) eq derived)
  }
}
