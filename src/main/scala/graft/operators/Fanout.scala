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
  /** ENFORCED probe contract (r15 ADVICE): probing partition width via
    * `queryExecution.toRdd` is only lazy on an exchange-free plan —
    * under AQE, building the RDD of a plan that CONTAINS shuffle stages
    * materializes them eagerly inside a throwaway QueryExecution the
    * final query cannot reuse (silent double execution). The scaladoc
    * used to be the only guard; now the probe itself inspects the
    * pre-adaptive physical plan and reports whether it is safe. A
    * frame that already shuffles is also already wide, so "unsafe to
    * probe" and "fan-out unnecessary" coincide — callers just skip.
    *
    * The inspection reads `queryExecution.executedPlan` — exchanges
    * only exist after EnsureRequirements, a preparation rule, so the
    * raw `sparkPlan` would miss them — and recurses through the
    * `AdaptiveSparkPlanExec` wrapper (a LEAF node hiding its input
    * plan from `exists`). Building `executedPlan` is pure planning —
    * no job runs until the plan's RDD is materialized, which is
    * exactly what this guard prevents on shuffle-bearing frames.
    * localCheckpoint/cached frames plan as scans and stay probe-safe.
    */
  private def exchangeFree(df: DataFrame): Boolean = {
    def scan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec =>
          // initialPlan, not inputPlan: AQE applies EnsureRequirements
          // (the rule that INSERTS exchanges) only when building its
          // initial plan, so the input plan never shows them
          scan(a.initialPlan)
        case _: org.apache.spark.sql.execution.exchange.Exchange => false
        case other => other.children.forall(scan)
      }
    scan(df.queryExecution.executedPlan)
  }

  /** Round-robin redistribute to session parallelism when the frame's
    * scan partitioning is below it. Safe on any frame: a plan carrying
    * an exchange (which the lazy probe cannot inspect without executing
    * it, and which is already post-shuffle wide) is left untouched.
    */
  def fanOut(df: DataFrame): DataFrame = {
    if (!exchangeFree(df)) return df
    val want = df.sparkSession.sparkContext.defaultParallelism
    val have = df.queryExecution.toRdd.getNumPartitions
    if (have > 0 && have < want) df.repartition(want) else df
  }

  /** [[fanOut]] with HASH distribution on `keys` instead of round
    * robin: skips the local sort every keyless `repartition(n)` pays
    * (sortBeforeRepartition, SPARK-23207 — retried-task determinism;
    * a hash placement is already deterministic per row). Use when the
    * frame carries high-cardinality columns that spread well.
    */
  def fanOutBy(df: DataFrame,
      keys: org.apache.spark.sql.Column*): DataFrame = {
    if (!exchangeFree(df)) return df
    val want = df.sparkSession.sparkContext.defaultParallelism
    val have = df.queryExecution.toRdd.getNumPartitions
    if (have > 0 && have < want) df.repartition(want, keys: _*) else df
  }

  /** True when `df`'s physical partitioning is below the session's
    * parallelism — the trigger for spreading a DERIVED CPU-heavy frame
    * (e.g. candidate pairs built from this input) that cannot itself be
    * probed without executing it. A probe frame containing an exchange
    * reports NOT narrow (post-shuffle width is already the session's;
    * probing it would execute it).
    */
  def isNarrow(df: DataFrame): Boolean = {
    if (!exchangeFree(df)) return false
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
