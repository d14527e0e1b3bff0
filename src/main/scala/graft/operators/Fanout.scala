package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive map parallelism (r15 optimization, guide §2: derive
  * partitioning from the input, never from a constant).
  *
  * CPU-heavy map phases — tokenization, per-(row, replicate) hash
  * draws, signature computation — inherit the SCAN's partitioning. A
  * small input (one parquet file, or one row group) is one scan task,
  * so the whole map phase runs single-threaded no matter how many cores
  * the session has: t24b's tokenize+aggregate materialization ran 2.1 s
  * in ONE task on a 32-core session. A large input already fans out by
  * file split and must NOT pay an extra exchange.
  *
  * [[fanOut]] therefore round-robin redistributes ONLY when the plan's
  * current partitioning is below the session's default parallelism —
  * at 100 TB the branch never fires; on a narrow input the shuffle
  * moves the small frame once and buys full-width map parallelism.
  *
  * Correctness contract: callers must be partitioning-insensitive
  * (exact/mergeable aggregates, per-row functions) — the engine's
  * cross-engine determinism discipline already requires this, and
  * round-robin repartition itself is deterministic (Spark sorts before
  * repartitioning, SPARK-23207). Never use upstream of order-sensitive
  * float folds.
  */
object Fanout {
  /** Call on EXCHANGE-FREE frames (scans/filters/projections or
    * already-materialized checkpoints): reading `toRdd` under AQE
    * materializes any shuffle stages the plan contains, which would
    * run the upstream query eagerly just to count partitions.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    val have = df.queryExecution.toRdd.getNumPartitions
    if (have > 0 && have < want) df.repartition(want) else df
  }

  /** True when `df`'s physical partitioning is below the session's
    * parallelism — the trigger for spreading a DERIVED CPU-heavy frame
    * (e.g. candidate pairs built from this input) that cannot itself be
    * probed without executing it. Same exchange-free contract as
    * [[fanOut]].
    */
  def isNarrow(df: DataFrame): Boolean = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    val have = df.queryExecution.toRdd.getNumPartitions
    have > 0 && have < want
  }

  /** Repartition `derived` to full width when `probe` (an exchange-free
    * input frame) is narrow: AQE coalesces small-BYTE shuffles to one
    * partition, which serializes small-corpus candidate-pair
    * verification (d11: the whole block-join + 900k-pair Levenshtein
    * verify ran as ONE task). A user repartition is exempt from AQE
    * coalescing, so the verify stage keeps the session's width; on a
    * large input the branch never fires and the plan is untouched.
    */
  def fanOutDerived(derived: DataFrame, probe: DataFrame): DataFrame =
    if (isNarrow(probe))
      derived.repartition(probe.sparkSession.sparkContext.defaultParallelism)
    else derived
}
