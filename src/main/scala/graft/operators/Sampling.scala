package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

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

  /** Exactly-k-per-group uniform sample (distributed reservoir):
    * within each group, the k rows whose md5-derived priority
    * ([[hashUniform]]) is smallest — the "bottom-k sampling" identity:
    * hashing every id with one fixed function and keeping the k
    * smallest IS a uniform k-subset, and unlike an RNG reservoir it is
    * deterministic, partition-independent, mergeable, and re-derivable
    * in any engine with md5().
    *
    * Scale shape: ONE pass with the bounded mergeable top-k aggregate
    * (`graft_topk` on the negated priority) — the shuffle carries at
    * most k (id, priority) pairs per (group, partition), never the
    * data rows (the `row_number()` window form would shuffle and sort
    * the whole corpus per group) — then a semi-join brings back the
    * winners' full rows (AQE broadcasts the groups×k winner frame).
    *
    * `idCol` must be integral and unique per group (it is both the
    * priority seed and the tie-break). Groups with ≤ k rows keep all
    * their rows.
    */
  /** Exact-size proportional sample — allocate EXACTLY `k` rows across
    * strata by the largest-remainder (Hamilton) method, then take each
    * stratum's quota in deterministic hash order. Fraction-based
    * samplers ([[resampleToMix]], s3's per-group quotas) hit the target
    * only in expectation or per group; this is the "give me exactly
    * 100k docs, proportional to the language mix" contract an eval-set
    * builder needs.
    *
    *   base_g = ⌊k·n_g/N⌋,  leftover k − Σbase seats go to the largest
    *   remainders k·n_g mod N (ties by stratum value) — all exact
    *   integer arithmetic, so the allocation hash-oracles.
    *
    * Output size is exactly min(k, N) — TOTAL: for k < N,
    * base_g = ⌊k·n_g/N⌋ ≤ n_g − 1, so a +1 seat always fits; for
    * k = N every base is exactly n_g with zero leftover seats; and for
    * k > N (exactly-k impossible without replacement) every base is
    * already ≥ n_g, the per-stratum cap binds everywhere, and the
    * sample is the whole population. Null strata are excluded.
    *
    * Scale shape: one count per stratum, allocation algebra on the
    * |strata|-row frame (its ranking window is a single tiny task by
    * design), one per-stratum row_number window over the data (strata
    * parallelize), one broadcast semi-join.
    */
  def apportionSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val base = df.where(col(strataCol).isNotNull)
    val counts = base.groupBy(col(strataCol).as("__s"))
      .agg(count(lit(1)).as("__ng"))
    val tot = counts.agg(sum(col("__ng")).as("__N"))
    val quota = counts.crossJoin(broadcast(tot))
      .select(col("__s"), col("__ng"),
        expr(s"(__ng * CAST($k AS BIGINT)) div __N").as("__base"),
        expr(s"(__ng * CAST($k AS BIGINT)) % __N").as("__rem"))
    val sb = quota.agg(sum(col("__base")).as("__sb"))
    val alloc = quota.crossJoin(broadcast(sb))
      .withColumn("__rk",
        row_number().over(Window.orderBy(desc("__rem"), asc("__s"))))
      .select(col("__s"),
        // cap at the stratum size: only ever binds when k > N (see
        // Scaladoc) — it turns the impossible-k case into "all rows"
        // instead of a silent shortfall
        least(col("__base") +
          when(col("__rk") <= lit(k.toLong) - col("__sb"), 1L)
            .otherwise(0L), col("__ng")).as("__alloc"))
    base
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(strataCol))
          .orderBy(Dedup.md5Hash60(col(idCol).cast("string")).asc,
            col(idCol).asc)))
      .join(broadcast(alloc), col(strataCol) === col("__s"))
      .where(col("__rn") <= col("__alloc"))
      .drop("__rn", "__s", "__alloc")
  }

  /** Neyman-allocation stratified sample: the k-row budget is split
    * across strata proportional to N_h·σ_h — the variance-optimal
    * allocation for estimating a global mean (high-variance strata get
    * more of the budget than size-proportional s15 would give them;
    * Neyman 1934). The evaluation-set builder when the measure's
    * spread differs wildly by source.
    *
    * Determinism (the s15 discipline, integer end-to-end after one
    * quantization): per-stratum moments are exact decimal sums; the
    * population variance is ONE fixed IEEE chain round-6'd (the a16
    * wide-decimal caveat); σ quantizes as floor(1000·√v) so the
    * Hamilton weight w_h = floor(1000·σ_h)·N_h is an exact BIGINT and
    * quota base/remainder arithmetic is pure integer division —
    * largest remainder ranked (remainder desc, stratum asc). Within a
    * stratum, rows are taken in md5-hash order of `idCol` (ties on
    * id), capped at the stratum size.
    *
    * A zero-variance stratum has weight 0 and contributes no rows —
    * the Neyman optimum (its mean is known from one row... but none
    * are taken; add a floor stratum pass downstream if every stratum
    * must be represented).
    *
    * Scale shape: one moment partial-agg, two broadcast one-row
    * crosses (the s15 allocation algebra), one per-stratum window.
    */
  def neymanSample(df: DataFrame, strataCol: String, idCol: String,
      measure: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val dec = col(measure).cast(DecimalType(18, 2))
    val base = df.where(col(strataCol).isNotNull && dec.isNotNull)
    val stats = base.groupBy(col(strataCol).as("__s"))
      .agg(count(lit(1)).as("__ng"),
        sum(dec).cast(DoubleType).as("__sx"),
        sum(dec * dec).cast(DoubleType).as("__sxx"))
    val nD = col("__ng").cast(DoubleType)
    val v = round((col("__sxx") - col("__sx") * col("__sx") / nD) / nD, 6)
    val weights = stats.select(col("__s"), col("__ng"),
      (floor(lit(1000.0) * sqrt(greatest(v, lit(0.0))))
        .cast(LongType) * col("__ng")).as("__w"))
    // total weight is __gw, not __W: Spark resolution is
    // case-INsensitive, so __W beside __w is AMBIGUOUS_REFERENCE
    val tot = weights.agg(sum(col("__w")).as("__gw"))
    val quota = weights.crossJoin(broadcast(tot))
      .where(col("__gw") > 0)
      .select(col("__s"), col("__ng"), col("__w"),
        expr(s"(__w * CAST($k AS BIGINT)) div __gw").as("__base"),
        expr(s"(__w * CAST($k AS BIGINT)) % __gw").as("__rem"))
    val sb = quota.agg(sum(col("__base")).as("__sb"))
    val alloc = quota.crossJoin(broadcast(sb))
      .withColumn("__rk",
        row_number().over(Window.orderBy(desc("__rem"), asc("__s"))))
      .select(col("__s"),
        least(col("__base") +
          when(col("__rk") <= lit(k.toLong) - col("__sb"), 1L)
            .otherwise(0L), col("__ng")).as("__alloc"))
    base
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(strataCol))
          .orderBy(Dedup.md5Hash60(col(idCol).cast("string")).asc,
            col(idCol).asc)))
      .join(broadcast(alloc), col(strataCol) === col("__s"))
      .where(col("__rn") <= col("__alloc"))
      .drop("__rn", "__s", "__alloc")
  }

  /** Deterministic stratified k-fold assignment — the cross-validation
    * split builder: within each stratum, rows take folds round-robin
    * in md5-hash order, so per-stratum fold sizes differ by at most
    * one, the assignment is RNG-free and re-derivable in any engine
    * with md5(), and train/eval splits are `fold =!= i` / `fold === i`
    * filters. A null stratum is a real stratum (the dq6 discipline).
    *
    * Determinism contract: `idCol` must be UNIQUE within each stratum,
    * or extra `tieBreak` columns must complete a total order — md5 and
    * the id tiebreak are identical for duplicate ids, which would leave
    * the fold assignment arbitrary across runs/engines (ADVICE r13).
    *
    * Scale shape: one per-stratum window (strata parallelize; the
    * per-stratum numbering is the same bounded-history contract as
    * s15's quota take).
    */
  def kFoldAssign(df: DataFrame, strataCol: String, idCol: String,
      k: Int, tieBreak: Seq[String] = Nil): DataFrame = {
    require(k >= 2 && k <= 1000, s"k must be in [2, 1000], got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(Dedup.md5Hash60(col(idCol).cast("string")).asc +:
        col(idCol).asc +: tieBreak.map(col(_).asc): _*)
    df.withColumn("fold",
      ((row_number().over(w) - 1L) % k).cast("int"))
  }

  /** Deterministic shard assignment for training-data export: shard =
    * md5-60(id) mod `numShards` — RNG-free, layout-independent, and
    * re-derivable in any engine with md5(), so a re-run (or a different
    * engine) shards identically. The export step every training
    * pipeline ends with (webdataset/streaming shards): hash sharding
    * balances by LLN without a shuffle-by-count pass.
    */
  def shardAssign(df: DataFrame, idCol: String,
      numShards: Int): DataFrame = {
    require(numShards >= 1 && numShards <= 1000000,
      s"numShards must be in [1, 1000000], got $numShards")
    df.where(col(idCol).isNotNull)
      .withColumn("shard",
        pmod(Dedup.md5Hash60(col(idCol).cast("string")),
          lit(numShards.toLong)).cast("int"))
  }

  /** Per-shard manifest over [[shardAssign]]: row count, total weight
    * (e.g. tokens/chars — the shard-size balance check), id range, and
    * an order-free content checksum (sum of md5-60(id) mod 1000003 —
    * exact integers, so two manifests match iff the shard holds the
    * same id multiset). ONE partial-agg shuffle; at 100 TB this is the
    * audit artifact shipped beside the shards.
    */
  def shardManifest(df: DataFrame, idCol: String, numShards: Int,
      weightCol: String): DataFrame =
    shardAssign(df, idCol, numShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(weightCol).cast("long")).as("total_weight"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"),
        sum(pmod(Dedup.md5Hash60(col(idCol).cast("string")),
          lit(1000003L))).as("checksum"))

  def bottomKSample(df: DataFrame, groupCol: Column, idCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val winners = df
      .groupBy(groupCol.as("__bg"))
      .agg(graft.functions.GraftFunctions.topKPairs(
        idCol.cast("long"), -hashUniform(idCol), k).as("__w"))
      .select(col("__bg"), explode(col("__w.id")).as("__bid"))
    df.join(winners,
      groupCol <=> col("__bg") && idCol.cast("long") === col("__bid"),
      "left_semi")
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

  /** Leakage-safe train/val/test split: assign every NEAR-DUP CLUSTER
    * — not every document — to one split, so a near-duplicate of a
    * training document can never land in the test set (the
    * train/test-contamination failure mode a per-doc [[hashSplit]]
    * cannot prevent; Lee et al. 2022 measure the resulting eval
    * inflation). Connected components over the provided near-dup pair
    * frame label each doc with its cluster representative (min
    * reachable id; singletons label themselves), and the split is the
    * md5-uniform of the REPRESENTATIVE — deterministic,
    * partitioning-independent, and exactly re-derivable in SQL.
    *
    * Scale shape: inherits [[Dedup.connectedComponents]]' two regimes
    * (driver union-find under the edge threshold, large-star/small-star
    * O(log n) rounds above), plus one join and a map-side split
    * assignment. `pairs` must carry columns (`idCol`, `pairCol2`).
    * Returns `docs` + (component, split).
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      pairCol2: String, weights: Seq[(String, Double)]): DataFrame = {
    val comps = Dedup.connectedComponents(
      docs.select(col(idCol)), pairs, idCol, pairCol2)
    hashSplit(docs.join(comps, idCol), col("component"), weights)
  }

  /** Deterministic negative sampling for contrastive training: each
    * anchor row draws up to `k` pseudo-random corpus rows, EXCLUDING
    * itself and any row whose `excludeCol` equals the anchor's (pass an
    * exact-dup fingerprint / near-dup component / label there so a
    * disguised positive can never be served as a negative).
    *
    * Mechanism: every corpus row gets a pseudo-random position
    * `p ∈ [0, N)` (Knuth-hash ordering + the distributed
    * [[Analytics.globalRowNumber]] — no single-task global window);
    * anchor a's slot j probes position `(a·2654435761 + (j+1)·40503)
    * mod N`. The whole draw is then ONE equi-join on the position —
    * nothing corpus-sized replicates, broadcasts, or reaches the
    * driver, and the result is independent of partitioning.
    *
    * Contract: sampling is with replacement across slots (two slots of
    * one anchor can collide), and excluded probes are dropped, not
    * redrawn — callers get `≤ k` negatives per anchor, deterministic
    * and exactly re-derivable in SQL (the s14 oracle).
    */
  def negativeSample(corpus: DataFrame, idCol: String, excludeCol: String,
      anchors: DataFrame, anchorId: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val pos = Analytics.globalRowNumber(
      corpus.select(col(idCol), col(excludeCol))
        .withColumn("__h", (col(idCol) * lit(2654435761L)) % lit(1000000007L)),
      sortCols = Seq("__h", idCol), out = "__rn")
      .withColumn("__p", col("__rn") - 1)
      .select(col("__p"), col(idCol).as("neg_id"),
        col(excludeCol).as("__neg_ex"))
    val n = corpus.select(count(lit(1)).as("__n"))
    val slots = anchors
      .select(col(anchorId), col(excludeCol).as("__a_ex"))
      .crossJoin(broadcast(n))
      .withColumn("slot", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("__p",
        (col(anchorId) * lit(2654435761L) + (col("slot") + 1) * lit(40503L))
          % col("__n"))
    slots.join(pos, Seq("__p"))
      .where(col("neg_id") =!= col(anchorId) &&
        !(col("__neg_ex") <=> col("__a_ex")))
      .select(col(anchorId), col("slot"), col("neg_id"))
  }

  /** Per-document hashed n-gram feature buckets: word unigrams +
    * bigrams of the non-empty whitespace tokens, each hashed to one of
    * `buckets` cells by the cross-engine md5-60 hash. The map-side
    * feature extractor [[dsirWeights]] builds on — exploded to one row
    * per gram occurrence, columns (`idCol`, `__b`).
    */
  private def gramBuckets(df: DataFrame, id: Column, text: Column,
      buckets: Int): DataFrame = {
    // materialize the filtered token array ONCE per row: higher-order
    // functions are interpreted and share no subexpressions, so an
    // inline `tk` would re-run split+filter for EVERY slice() inside
    // the bigram transform (O(len²) re-tokenization — the Pca
    // momentSumsDf lesson; CollapseProject keeps the projection
    // because `__tk` is referenced more than once)
    // fanned out before tokenization (r15 — a one-file corpus scan is
    // one task for the whole tokenize+hash phase; counts are exact)
    val toked = Fanout.fanOut(df)
      .select(id.as("__fid"),
        filter(TextAnalysis.tokens(text), t => t =!= "").as("__tk"))
    val tk = col("__tk")
    // sequence(1, 0) DESCENDS in Spark — guard the single-token doc
    val bi = when(size(tk) >= 2,
      transform(sequence(lit(1), size(tk) - 1),
        i => concat_ws(" ", slice(tk, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    toked.select(col("__fid"), explode(concat(tk, bi)).as("__g"))
      .select(col("__fid"),
        pmod(Dedup.md5Hash60(col("__g")), lit(buckets.toLong)).as("__b"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed n-gram profile is,
    *
    *   w(d) = Σ_b c_d[b] · ( ln p̂_T[b] − ln p̂_R[b] )
    *   p̂_X[b] = (c_X[b] + s) / (tot_X + s·B)
    *
    * with B = `buckets` hashed word uni+bigram features and add-`s`
    * smoothing — the log-likelihood ratio of the doc's features under
    * the target vs raw bag-of-ngrams models. THE published
    * data-selection recipe for pretraining corpora (select web docs
    * that look like Wikipedia/books): the target table only needs to
    * be a sample; the raw corpus is never compared pairwise.
    *
    * Scale shape: tokenize+hash is map-side; per-doc bucket counts are
    * ONE narrow groupBy (the frame is checkpointed and reused for the
    * raw totals, so text is scanned once); both models are ≤ B-row
    * frames (B defaults to 1024, capped at 2^20) — the λ = ln-ratio
    * table broadcasts; the weight is one more groupBy with exact
    * decimal summation (partition-order independent). Every λ input is
    * a ratio of exact integer counts, so the weight re-derives in any
    * SQL engine to the round-6 convention.
    *
    * Returns (`idCol`, weight DOUBLE (unrounded — callers round),
    * n_grams LONG). Docs with no non-empty token have no features and
    * drop. Weights are length-dependent (a doc sums over all its gram
    * occurrences — the paper's formulation); resample with
    * [[dsirResample]], which divides by `temperature` before the
    * Gumbel top-k.
    */
  def dsirWeights(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 1024, smoothing: Double = 1.0): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"dsirWeights: buckets must be in [2, 2^20], got $buckets")
    require(smoothing > 0.0,
      s"dsirWeights: smoothing must be positive, got $smoothing")
    val docBuckets = gramBuckets(raw, col(idCol), col(textCol), buckets)
      .groupBy(col("__fid"), col("__b"))
      .agg(count(lit(1)).cast("double").as("__c"))
      .localCheckpoint(true) // raw text tokenized once; reused 2×
    // r16 (guide §2: fewer passes): both ≤ B-row model frames are
    // checkpointed ONCE — previously the totT action and the λ build
    // each re-tokenized the TARGET corpus, and the totR action and λ
    // each re-aggregated docBuckets: two full passes saved per call,
    // replaced by two B-row materializations.
    val rawTot = docBuckets.groupBy(col("__b"))
      .agg(sum(col("__c")).as("__cr"))
      .localCheckpoint(true)
    val tgtTot = gramBuckets(target, lit(0L), col(targetTextCol), buckets)
      .groupBy(col("__b")).agg(count(lit(1)).cast("double").as("__ct"))
      .localCheckpoint(true)
    // integer-valued doubles < 2^53: both totals are exact
    val totR = Option(rawTot.agg(sum(col("__cr"))).head.get(0))
      .map(_.asInstanceOf[Double])
      .getOrElse(throw new IllegalArgumentException(
        "dsirWeights: raw corpus has no features"))
    val totT = Option(tgtTot.agg(sum(col("__ct"))).head.get(0))
      .map(_.asInstanceOf[Double])
      .getOrElse(throw new IllegalArgumentException(
        "dsirWeights: target corpus has no features"))
    // λ is consumed once (the broadcast below) and both its inputs are
    // checkpointed B-row frames — no checkpoint of its own needed
    val lam = rawTot.join(tgtTot, Seq("__b"), "left")
      .select(col("__b"),
        (log((coalesce(col("__ct"), lit(0.0)) + lit(smoothing))
          / lit(totT + smoothing * buckets))
          - log((col("__cr") + lit(smoothing))
            / lit(totR + smoothing * buckets))).as("__lam"))
    docBuckets.join(broadcast(lam), "__b")
      .groupBy(col("__fid"))
      .agg(sum((col("__c") * col("__lam"))
        .cast(org.apache.spark.sql.types.DecimalType(28, 18)))
        .cast("double").as("weight"),
        sum(col("__c")).cast("long").as("n_grams"))
      .withColumnRenamed("__fid", idCol)
  }

  /** DSIR selection: Gumbel top-k resampling over [[dsirWeights]] —
    * sampling WITHOUT replacement ∝ exp(w/temperature) is exactly
    * "keep the k largest w/τ + Gumbel(0,1) keys" (Gumbel-max trick),
    * and the Gumbel noise here is a pure hash of (seed, id), so the
    * draw is deterministic, partitioning-independent, and
    * re-derivable in SQL: u = (md5_60(seed:id) + 0.5) / 2^60 ∈ (0,1),
    * g = −ln(−ln u). `temperature → 0` degenerates to deterministic
    * top-k by weight; large τ approaches uniform.
    *
    * The selection key is rounded to 6 decimals and zero-canonicalized
    * BEFORE ranking (rank ties then resolve identically in any engine
    * re-deriving the key, id ascending) and the global top-k runs
    * through the bounded mergeable `graft_topk` aggregate — no global
    * sort, ≤ k pairs per partition on the shuffle. `idCol` must be
    * LongType (the aggregate's key contract). Returns
    * (`idCol`, weight, key, rank) for the k selected docs.
    */
  def dsirResample(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, k: Int,
      temperature: Double = 1.0, seed: Long = 0L,
      buckets: Int = 1024, smoothing: Double = 1.0): DataFrame = {
    require(k >= 1, s"dsirResample: k must be positive, got $k")
    require(temperature > 0.0,
      s"dsirResample: temperature must be positive, got $temperature")
    require(raw.schema.fields.find(_.name == idCol).map(_.dataType)
      .contains(org.apache.spark.sql.types.LongType),
      "dsirResample: idCol must be LongType (graft_topk key)")
    val w = dsirWeights(raw, idCol, textCol, target, targetTextCol,
      buckets, smoothing)
    val u = (Dedup.md5Hash60(concat_ws(":", lit(seed),
      col(idCol).cast("string"))).cast("double") + lit(0.5)) /
      lit((1L << 60).toDouble)
    // two consumers (the top-k scan + the weight join-back): without
    // this the whole raw-side weight aggregation re-plans twice
    val keyed = w.withColumn("key",
      round(col("weight") / lit(temperature) - log(-log(u)), 6) + lit(0.0))
      .localCheckpoint(true)
    keyed.agg(graft.functions.GraftFunctions
      .topKPairs(col(idCol), col("key"), k).as("__top"))
      .select(posexplode(col("__top")).as(Seq("__rk", "__p")))
      .select(col("__p.id").as(idCol), col("__p.score").as("key"),
        (col("__rk") + 1).cast("int").as("rank"))
      .join(keyed.select(col(idCol), col("weight")), idCol)
      .select(col(idCol), col("weight"), col("key"), col("rank"))
  }
}
