package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Shared hot-key detector for skew-aware join planning
  * ([[AsOfJoin.auto]], interval-join bucketing).
  *
  * Scale contract: the driver only ever receives keys whose sampled
  * share is at least `hotKeyFraction` — by construction at most
  * `⌈1 / hotKeyFraction⌉` rows — no matter how many distinct keys the
  * input has. The threshold is applied BELOW the collect: the sample is
  * persisted once (one pass over the input), its total counted as a
  * scalar, and the per-key counts filtered distributedly before
  * anything reaches the driver. The naive form
  * (`groupBy(key).count().collect()` then filter driver-side) is
  * O(distinct sampled keys) driver memory — millions of rows at 100 TB
  * with high-cardinality keys, in exactly the regime skew handling
  * targets.
  *
  * Results cache per (logical plan, key, fractions) for the driver's
  * lifetime, like the delete-layer bitmap cache: repeated `auto()`
  * calls over the same table snapshot re-use the probe instead of
  * re-sampling. The cache key is the ANALYZED plan's semantic hash,
  * which pins a versioned-lake read to its (table, version) snapshot;
  * for mutable path reads a stale entry can only mis-route keys
  * between two correct plans (hot-split vs plain merge) — a
  * performance nuance, never a correctness issue. LRU-bounded.
  */
object SkewProbe {

  private val MaxEntries = 256
  private val cache =
    new java.util.LinkedHashMap[(Int, String, Double, Double), Seq[Any]](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, String, Double, Double), Seq[Any]])
          : Boolean = size > MaxEntries
    }

  /** Keys whose sampled frequency is ≥ `hotKeyFraction` of the sampled
    * total. Empty when `sampleFraction <= 0` (probe off) or the sample
    * is empty.
    */
  def hotKeys(df: DataFrame, key: String, sampleFraction: Double,
      hotKeyFraction: Double): Seq[Any] = {
    if (sampleFraction <= 0.0) return Nil
    val ck = (df.queryExecution.analyzed.semanticHash(), key,
      sampleFraction, hotKeyFraction)
    cache.synchronized(Option(cache.get(ck))).getOrElse {
      val (sampled, hot) =
        probeFrames(df, col(key), sampleFraction, hotKeyFraction)
      val computed: Seq[Any] =
        try hot.collect().map(_.get(0)).toSeq
        finally { sampled.unpersist(false); () }
      cache.synchronized(cache.put(ck, computed))
      computed
    }
  }

  /** (persisted sample, bounded hot frame): the second is what
    * [[hotKeys]] collects — exposed so specs can assert the
    * ≤ 1/hotKeyFraction driver-row bound directly. Callers must
    * unpersist the first after consuming the second.
    */
  private[graft] def probeFrames(df: DataFrame, key: Column,
      sampleFraction: Double, hotKeyFraction: Double)
      : (DataFrame, DataFrame) = {
    val sampled = df.sample(sampleFraction).select(key.as("__sp_key"))
      .where(col("__sp_key").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one input pass: both the scalar total and the per-key counts read
    // the persisted sample (fraction × input rows, one column)
    val total = sampled.count()
    val hot = sampled.groupBy(col("__sp_key")).count()
      .where(col("count") >= lit(math.max(1.0, hotKeyFraction * total)))
      .select(col("__sp_key"))
    (sampled, hot)
  }
}
