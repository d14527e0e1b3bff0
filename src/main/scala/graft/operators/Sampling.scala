package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixing operators for training-data
  * pipelines. Everything keys on a hash of a stable id — results are
  * independent of partitioning, executor count, and run order, and
  * reproducible across engines (the md5-based uniform is bit-identical
  * in any SQL engine with md5()).
  */
object Sampling {

  /** Uniform double in [0, 1) from a stable id: md5-derived 60-bit hash
    * (see [[Dedup.md5Hash60]]) over 2^60. Cross-engine reproducible —
    * DuckDB: `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT) /
    * 1152921504606846976.0`.
    */
  def hashUniform(id: Column): Column =
    Dedup.md5Hash60(id.cast("string")).cast("double") / (1L << 60).toDouble

  /** Source-mix resampling: keep each row of group g with probability
    * `fractions(g)` (groups absent from the map default to
    * `defaultFraction`). THE data-mixing primitive for training
    * corpora — downsample over-represented sources to a target mix with
    * one deterministic map-side filter: no shuffle, no count pass, no
    * RNG state, stable under re-runs and repartitioning. Exact group
    * quotas (count-based) need the stratified-quota window instead
    * (s3_stratified_sample); this form scales to any corpus because it
    * never counts.
    */
  def resampleToMix(df: DataFrame, groupCol: Column, idCol: Column,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0) &&
      defaultFraction >= 0.0 && defaultFraction <= 1.0,
      "fractions must be in [0, 1]")
    val frac = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (g, f)) => when(groupCol === g, lit(f)).otherwise(acc)
    }
    df.where(hashUniform(idCol) < frac)
  }

  /** Repetition-factor mixing — the UPSAMPLING half of data mixing
    * ([[resampleToMix]] only discards): group g's documents appear
    * `repeats(g)` times per epoch. The integer part emits that many
    * copies (`repeat_idx` 0..⌊r⌋−1, map-side explode, no shuffle); the
    * fractional part keeps one extra copy with probability r−⌊r⌋ via
    * the same deterministic md5-uniform used everywhere (salted with
    * ":rep" so the extra-copy population is independent of
    * [[resampleToMix]]'s keep decisions on the same ids). r = 0 drops
    * the group; r < 1 behaves exactly like a keep-fraction. Stable
    * under re-runs and repartitioning; row multiplication is bounded by
    * max(r), under the caller's control.
    */
  def repeatMix(df: DataFrame, groupCol: Column, idCol: Column,
      repeats: Map[String, Double],
      defaultRepeat: Double = 1.0): DataFrame = {
    require(repeats.values.forall(r => r >= 0.0 && r <= 64.0) &&
      defaultRepeat >= 0.0 && defaultRepeat <= 64.0,
      "repeat factors must be in [0, 64]")
    val r = repeats.foldLeft(lit(defaultRepeat)) {
      case (acc, (g, f)) => when(groupCol === g, lit(f)).otherwise(acc)
    }
    val extra = (hashUniform(concat_ws(":", idCol.cast("string"),
      lit("rep"))) < (r - floor(r))).cast("int")
    df.withColumn("__copies", floor(r).cast("int") + extra)
      .where(col("__copies") > 0)
      .withColumn("repeat_idx",
        explode(sequence(lit(0), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Reproducible global shuffle for training-example order: sort by a
    * seeded md5-derived key. Unlike `df.repartition` or `orderBy(rand)`,
    * the order is a pure function of (seed, id) — identical across
    * re-runs, cluster layouts, and engines — and changing the seed gives
    * an independent permutation (epoch reshuffling = seed + 1). At scale
    * this is Spark's range-partition + per-partition sort: no single
    * task ever holds the corpus, and the sorted write preserves the
    * order file-by-file. The key is exposed so downstream stages (and
    * the cross-engine oracle) can verify or resume the order without
    * recomputing positions; a global contiguous rank is deliberately NOT
    * computed (that would serialize through one window partition).
    */
  def deterministicShuffle(df: DataFrame, idCol: Column,
      seed: Long): DataFrame =
    df.withColumn("shuffle_key",
        Dedup.md5Hash60(concat_ws(":", lit(seed), idCol.cast("string"))))
      .orderBy(col("shuffle_key"), idCol)

  /** Deterministic round-robin interleave across groups — the training
    * ORDER half of data mixing (the mix operators set proportions; this
    * sets sequence): each group's rows take their seeded md5 order, and
    * the global order cycles the groups at equal rank, so no training
    * window is dominated by one source even when sources differ wildly
    * in size. Output = rows + `interleave_rank`, totally ordered by
    * (rank, group, id) — a pure function of (seed, group, id): identical
    * across re-runs, layouts, and engines.
    *
    * Scale shape: the per-group rank is computed in TWO levels (rank
    * inside (group, high-6-bits-of-key) buckets + a cumsum of the 64
    * narrow bucket counts per group), so no single task ever sorts a
    * whole group — the same prefix-bucket trick as
    * [[Dedup.cappedBlockCandidates]], exact because the bucket is the
    * key's high bits. The output order is Spark's range sort.
    */
  def interleaveByGroup(df: DataFrame, groupCol: Column, idCol: Column,
      seed: Long): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val keyed = df
      .withColumn("__ikey",
        Dedup.md5Hash60(concat_ws(":", lit(seed), idCol.cast("string"))))
      .withColumn("__ibkt", shiftright(col("__ikey"), 54))
    val ranked = keyed.withColumn("__ir", row_number().over(
      W.partitionBy(groupCol, col("__ibkt"))
        .orderBy(col("__ikey"), idCol)))
    val offsets = ranked.groupBy(groupCol.as("__ig"), col("__ibkt"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        W.partitionBy(col("__ig")).orderBy(col("__ibkt"))
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(col("__ig"), col("__ibkt"), col("__off"))
    ranked
      // null-safe on the group: a null group is its own partition in the
      // reference single-window semantics and must not drop here
      .join(broadcast(offsets),
        (groupCol <=> col("__ig")) && ranked("__ibkt") === offsets("__ibkt"))
      .withColumn("interleave_rank", col("__off") + col("__ir"))
      .drop("__ikey", "__ibkt", "__ir", "__ig", "__off", "__cnt")
      .orderBy(col("interleave_rank"), groupCol, idCol)
  }

  /** Stable train/validation/test assignment: label each row by where
    * its md5-uniform falls in the cumulative weight intervals (weights
    * are normalized; iteration follows the Seq order). Hash-based, so a
    * row's split NEVER changes as the corpus grows or repartitions —
    * the property that prevents silent train/test leakage when a rank-
    * or rand-based split is recomputed over an updated corpus. Map-side
    * only; zero shuffle at any scale.
    */
  def hashSplit(df: DataFrame, idCol: Column,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0.0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    val u = hashUniform(idCol)
    val cum = weights.scanLeft(0.0)(_ + _._2).tail
    // last split takes the open tail so u == 1-epsilon cannot fall out
    val assigned = weights.init.zip(cum.init).reverse
      .foldLeft(lit(weights.last._1): Column) {
        case (acc, ((name, _), hi)) => when(u < hi / total, name).otherwise(acc)
      }
    df.withColumn("split", assigned)
  }

  /** Temperature (α = 1/2) source mixing: flatten the source
    * distribution toward sqrt-proportional shares — the standard
    * α-sampling for training-corpus weighting, done by DOWNSAMPLING
    * only (the largest feasible corpus with the target mix; no source
    * is upsampled). Per-source keep probability:
    *
    *   keep_s = sqrt(n_s) * C / n_s,   C = MIN over t of n_t / sqrt(n_t)
    *
    * (the argmin source keeps everything). One counting aggregate over
    * the group column (tiny — distinct sources), then the same
    * deterministic map-side md5-uniform filter as [[resampleToMix]].
    * Every operation (integer counts, sqrt, one mul, one div, MIN) is
    * exactly-specified IEEE arithmetic, so the oracle re-derives the
    * exact keep thresholds — write the formula VERBATIM in both engines
    * (n/sqrt(n) must stay n/sqrt(n), not simplify to sqrt(n)).
    */
  def resampleTemperature(df: DataFrame, groupCol: Column,
      idCol: Column): DataFrame = {
    val counts = df.groupBy(groupCol.as("__g"))
      .agg(count(lit(1)).cast("double").as("__n"))
    val c = counts.agg(min(col("__n") / sqrt(col("__n")))).head().getDouble(0)
    val keep = counts.select(col("__g"),
      (sqrt(col("__n")) * c / col("__n")).as("__keep"))
    df.join(broadcast(keep), groupCol === col("__g"))
      .where(hashUniform(idCol) < col("__keep"))
      .drop("__g", "__keep")
  }

  /** Systematic probability-proportional-to-size (PPS) sampling, per
    * group: order each group's rows by the seeded md5 key (a
    * deterministic random permutation), take the running weight sum,
    * and keep exactly the rows whose weight interval
    * `[cum − w, cum)` crosses a multiple of `step = ⌈totalW / k⌉` —
    * i.e. `cum div step > (cum − w) div step`. Classic systematic PPS:
    * at most `k` rows per group, inclusion probability proportional to
    * weight (a row heavier than `step` is ALWAYS kept), pure integer
    * arithmetic end to end — no RNG state, bit-identical across
    * engines and re-runs. The quality-weighted / length-weighted
    * sampling primitive for corpus curation, where uniform sampling
    * ([[resampleToMix]]) over- or under-represents by document size.
    *
    * Rows with null or non-positive weight carry no mass and are
    * excluded (documented contract, mirrored by the oracle).
    *
    * Scale shape: one broadcast of the per-group totals (|groups|
    * rows), one hash exchange, one cumsum window per group — groups
    * parallelize; a single billion-row group serializes through its
    * window task, and the [[tokenBudgetMix]] two-phase prefix trick
    * (shard by the key's leading bits, offsets broadcast back) applies
    * verbatim if that ever binds.
    */
  def ppsSample(df: DataFrame, groupCol: Column, idCol: Column,
      weightCol: Column, k: Int, seed: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    // the weight column must already be integral — casting a double
    // quality score would TRUNCATE it (0.9 -> 0, silently emptying the
    // sample); callers pre-scale fractional weights explicitly
    // (e.g. round(score * 1e6))
    df.select(weightCol).schema.head.dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"ppsSample needs an integral weight column, got $other — " +
          "pre-scale fractional weights (e.g. cast(round(w * 1e6) as long))")
    }
    val keyed = df
      .withColumn("__w", weightCol.cast("long"))
      .where(col("__w").isNotNull && col("__w") > 0)
      .withColumn("__pkey",
        Dedup.md5Hash60(concat_ws(":", lit(seed), idCol.cast("string"))))
    val steps = keyed.groupBy(groupCol.as("__pg"))
      .agg(sum(col("__w")).as("__tot"))
      .select(col("__pg"),
        expr(s"(__tot + ${k - 1}) div $k").as("__step"))
    val wOrd = Window.partitionBy(groupCol)
      .orderBy(col("__pkey"), idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.join(broadcast(steps), groupCol === col("__pg"))
      .withColumn("__cum", sum(col("__w")).over(wOrd))
      .where(expr("__cum div __step") > expr("(__cum - __w) div __step"))
      .drop("__w", "__pkey", "__pg", "__step", "__cum")
  }

  /** Token-budget mixture — the data-mixing step of a training
    * pipeline: each group (source / domain / language) contributes docs
    * in DETERMINISTIC hash order until its token budget fills. The
    * first doc to cross the budget is INCLUDED (exclusive-prefix-sum
    * test: a doc is kept iff the tokens BEFORE it are under budget), so
    * every non-empty budget is met — the concat-then-truncate
    * convention, same as sequence packing. Groups absent from `budgets`
    * are dropped entirely.
    *
    * Fully relational and exactly re-derivable in SQL: one window
    * cumsum per group (hash of id + id tiebreak = total order), one
    * broadcast join against the tiny budget table, one filter.
    *
    * SCALE: with `numShards = 1` each group's cumsum runs through ONE
    * window task — fine when groups are many, a serialization point
    * when one mixture group is billions of docs. `numShards > 1` runs
    * the TWO-PHASE prefix sum: rows shard by the leading bytes of the
    * hash key (shard boundaries are contiguous runs of the global
    * order, so per-shard order ∥ global order), phase A aggregates
    * per-(group, shard) token subtotals (a |groups|×shards frame),
    * phase B takes the exclusive running sum over shards in order and
    * broadcasts the offsets, phase C windows WITHIN (group, shard) —
    * parallelism |groups|×shards — and adds the offset to recover the
    * exact global exclusive prefix. Output is IDENTICAL to the
    * single-window path (spec-pinned); the budget test, tie order, and
    * concat-then-truncate semantics are unchanged.
    */
  def tokenBudgetMix(df: DataFrame, groupCol: Column, idCol: Column,
      tokenCol: Column, budgets: Map[String, Long],
      numShards: Int = 1): DataFrame = {
    require(budgets.nonEmpty, "need at least one group budget")
    require(numShards >= 1 && numShards <= 256,
      s"numShards must be in [1, 256], got $numShards")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val b = broadcast(budgets.toSeq.toDF("__g", "__budget"))
    val key = md5(idCol.cast("string"))
    if (numShards == 1) {
      val w = Window.partitionBy(groupCol)
        .orderBy(key, idCol)
        .rowsBetween(Window.unboundedPreceding, -1)
      df.join(b, groupCol === col("__g"))
        .withColumn("__before", coalesce(sum(tokenCol).over(w), lit(0L)))
        .where(col("__before") < col("__budget"))
        .drop("__g", "__budget", "__before")
    } else {
      // shard = leading hash byte scaled to numShards — floor(v*n/256)
      // is monotone in v, so shard k's rows ALL precede shard k+1's in
      // the (md5, id) global order: per-shard prefixes + shard offsets
      // compose to the exact global exclusive prefix. A null id (null
      // md5) maps to shard 0 — the single-window path sorts nulls
      // FIRST, and shard 0 + the window's asc-nulls-first keeps the
      // sharded order identical (an inner join on a null shard would
      // silently DROP those rows instead)
      def shardOf(k: Column): Column = coalesce(
        (conv(substring(k, 1, 2), 16, 10).cast("long") * numShards / 256)
          .cast("int"), lit(0))
      val partials = df
        .groupBy(groupCol.as("__g2"), shardOf(key).as("__shard"))
        .agg(sum(tokenCol).cast("long").as("__bt"))
      val wOff = Window.partitionBy(col("__g2")).orderBy(col("__shard_o"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = partials
        .withColumnRenamed("__shard", "__shard_o")
        .select(col("__g2"), col("__shard_o"),
          coalesce(sum(col("__bt")).over(wOff), lit(0L)).as("__off"))
      val wLocal = Window.partitionBy(groupCol, col("__shard"))
        .orderBy(key, idCol)
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn("__shard", shardOf(key))
        .join(b, groupCol === col("__g"))
        .join(broadcast(offsets),
          groupCol === col("__g2") && col("__shard") === col("__shard_o"))
        .withColumn("__before",
          coalesce(sum(tokenCol).over(wLocal), lit(0L)) + col("__off"))
        .where(col("__before") < col("__budget"))
        .drop("__g", "__budget", "__g2", "__shard", "__shard_o", "__off",
          "__before")
    }
  }
}
