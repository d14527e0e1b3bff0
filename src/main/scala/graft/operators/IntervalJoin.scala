package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Point-in-interval joins (SURVEY.md §2.3 J1).
  *
  * Reference semantics: `test_pyspark_merge_spp_weather.py:54-59` —
  * `weather ⋈ prices ON weather.Location = prices.Location AND
  * weather.ts BETWEEN prices.interval_start AND prices.interval_end`
  * (closed interval, both ends inclusive — SURVEY §7.4.6).
  */
object IntervalJoin {

  /** Equi + closed-interval inner join. With a non-empty `equi` key set
    * Catalyst extracts the equi conjunct → ShuffledHash/SortMerge join with
    * the BETWEEN as a post-join residual (broadcast when one side is small);
    * NEVER a BroadcastNestedLoopJoin. Guarded by [[assertNoNestedLoop]].
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: Column,
      startCol: Column,
      endCol: Column,
      equi: Seq[(Column, Column)],
      joinType: String = "inner"): DataFrame = {
    val cond = (equi.map { case (l, r) => l === r } :+
      pointCol.between(startCol, endCol)).reduce(_ && _)
    points.join(intervals, cond, joinType)
  }

  /** Keyless (or LOW-CARDINALITY-key) point-in-interval join for scale: a
    * pure theta `BETWEEN` join plans as a nested-loop cross product, and
    * an equi join on a handful of key values (the reference's 4 `Location`
    * zones) degenerates to O(N²/|keys|) BETWEEN scans inside each key
    * bucket. Instead, explode each interval onto a fixed time grid
    * (`sequence(floor(start/w), floor(end/w))`) and equi-join points on
    * (grid cell, `equi` keys), then apply the exact BETWEEN as a residual
    * filter. Cost: |intervals| × (avg span / width) replicated rows, one
    * hash shuffle — linear, no cross product. `widthMicros` should be on
    * the order of the typical interval span (e.g. 15 min for the
    * reference's SPP feed) so the blow-up factor stays ~1-2×.
    *
    * @param equi same-named key columns present on BOTH sides (using-join
    *             semantics: merged in the output, null keys never match)
    */
  def pointInIntervalBucketed(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      widthMicros: Long,
      joinType: String = "inner",
      maxCellsPerInterval: Long = 1L << 20,
      equi: Seq[String] = Nil): DataFrame = {
    require(widthMicros > 0)
    // the BETWEEN residual is a post-join filter, which silently degrades
    // any outer join to inner (null interval bounds never pass BETWEEN) —
    // only inner/cross semantics are correct in this construction
    require(joinType == "inner" || joinType == "cross",
      s"grid-bucketed interval join supports inner/cross only, got $joinType")
    // cast handles TIMESTAMP_NTZ/DATE inputs (session TZ pinned UTC)
    def micros(c: Column): Column =
      unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
    val p = points.withColumn("__cell",
      (micros(col(pointCol)) / widthMicros).cast(LongType))
    val lo = (micros(col(startCol)) / widthMicros).cast(LongType)
    val hi = (micros(col(endCol)) / widthMicros).cast(LongType)
    // one sentinel-dated interval (end = 9999-12-31) would explode into
    // hundreds of millions of cells and OOM the executor — fail fast with
    // the offending span instead. Two dirty-row shapes short-circuit to
    // null FIRST (dropping under inner semantics, same policy as
    // Multimodal/Sessionize): null bounds (`hi - lo < cap` would be NULL
    // and fall into raise_error, making one dirty row job-fatal) and
    // REVERSED intervals (end < start, e.g. a zero-date sentinel end —
    // a negative span passes the `< cap` check but sequence(lo, hi) with
    // lo > hi emits a DESCENDING |lo-hi|+1-cell explosion; a reversed
    // closed interval is empty, so no point can ever match it anyway).
    val guarded = when(lo.isNull || hi.isNull || hi < lo,
        lit(null).cast("array<bigint>"))
      .when(hi - lo < maxCellsPerInterval, sequence(lo, hi))
      .otherwise(raise_error(concat(
        lit(s"interval spans more than $maxCellsPerInterval grid cells " +
          "(dirty open-ended date? widen widthMicros or clean the row): "),
        col(startCol).cast("string"), lit(" .. "),
        col(endCol).cast("string"))))
    val i = intervals.withColumn("__cell", explode(guarded))
    p.join(i, "__cell" +: equi, joinType)
      .where(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__cell")
  }

  /** Skew-aware [[pointInIntervalBucketed]]: the grid join shuffles on
    * (`__cell`, `equi`), so a hot equi key (the reference shape: one
    * `Location` zone carrying most of the feed) concentrates every cell
    * of that key's timeline on few reducers. When the [[SkewProbe]]
    * sampler (shared with [[AsOfJoin.auto]]; off unless
    * `skewSampleFraction > 0`) finds keys above `hotKeyFraction`, they
    * re-route through a salted copy of the same plan: hot points salt
    * DETERMINISTICALLY by `pmod(hash(point), salt)`, hot intervals
    * replicate ×`salt`, and the join key widens to include the salt —
    * hot reducer work ÷`salt` for ×`salt` replicated interval rows
    * (intervals are the small side by construction). The cold tail
    * keeps the plain one-shuffle plan; the two branches union.
    *
    * Inner-join semantics identical to [[pointInIntervalBucketed]]
    * (null keys never match, so branch filters drop nothing that could
    * appear in the output).
    */
  def pointInIntervalBucketedAuto(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      widthMicros: Long,
      maxCellsPerInterval: Long = 1L << 20,
      equi: Seq[String] = Nil,
      skewSampleFraction: Double = 0.0,
      hotKeyFraction: Double = 0.2,
      salt: Int = 8): DataFrame = {
    require(salt > 0)
    val hot: Seq[Any] =
      if (equi.length != 1) Nil
      else SkewProbe.hotKeys(points, equi.head, skewSampleFraction,
        hotKeyFraction)
    if (hot.isEmpty)
      pointInIntervalBucketed(points, intervals, pointCol, startCol,
        endCol, widthMicros, "inner", maxCellsPerInterval, equi)
    else {
      val k = equi.head
      val cold = pointInIntervalBucketed(
        points.where(!col(k).isin(hot: _*)),
        intervals.where(!col(k).isin(hot: _*)),
        pointCol, startCol, endCol, widthMicros, "inner",
        maxCellsPerInterval, equi)
      val hotP = points.where(col(k).isin(hot: _*))
        .withColumn("__salt", pmod(hash(col(pointCol)), lit(salt)))
      val hotI = intervals.where(col(k).isin(hot: _*))
        .withColumn("__salt",
          explode(array((0 until salt).map(lit): _*)))
      val hotPart = pointInIntervalBucketed(hotP, hotI, pointCol,
        startCol, endCol, widthMicros, "inner", maxCellsPerInterval,
        equi :+ "__salt").drop("__salt")
      cold.unionByName(hotPart)
    }
  }

  /** Interval-overlap join: pairs where [aStart, aEnd] ∩ [bStart, bEnd] ≠ ∅
    * (closed intervals: touching endpoints overlap). With equi keys this
    * plans as a hash join + residual like [[pointInInterval]]; keyless, use
    * a grid-explosion variant analogous to [[pointInIntervalBucketed]].
    */
  def intervalOverlap(
      a: DataFrame,
      b: DataFrame,
      aStart: Column, aEnd: Column,
      bStart: Column, bEnd: Column,
      equi: Seq[(Column, Column)],
      joinType: String = "inner"): DataFrame = {
    val cond = (equi.map { case (l, r) => l === r } :+
      (aStart <= bEnd && bStart <= aEnd)).reduce(_ && _)
    a.join(b, cond, joinType)
  }

  /** Band join: all (left, right) pairs with |leftVal − rightVal| ≤ eps
    * (plus optional equi block columns) — the sensor-reconciliation /
    * price-matching theta join Spark would otherwise plan as a
    * broadcast nested loop. Values quantize to exact integer cents
    * (the engine's DECIMAL(18,2) discipline; `eps` must carry scale
    * ≤ 2), each left row fans out to its bucket ±1 on the
    * floor(cents / epsCents) grid, and the join is a plain EQUI join
    * on (blocks…, bucket) with the exact |Δcents| ≤ epsCents filter on
    * top — no float ever decides membership, so the pair set is
    * hash-oracle-able against a naive theta join. A real-valued pair
    * within eps can never be missed: on the exact integer grid the two
    * bucket indices differ by at most 1.
    *
    * Scale shape: 3× left fan-out, one hash shuffle each side on
    * narrow keys, zero cartesian risk; a value-skewed bucket
    * parallelizes across blocks. Emits all pairs including (x, x) on a
    * self join — filter `id < id_2` downstream for unordered pairs.
    * The two inputs must have disjoint column names (rename before
    * joining; silent ambiguity is worse than the require).
    */
  def bandJoin(left: DataFrame, right: DataFrame,
      leftVal: String, rightVal: String, eps: java.math.BigDecimal,
      blockCols: Seq[(String, String)] = Nil): DataFrame = {
    require(eps.signum > 0, s"eps must be > 0, got $eps")
    require(eps.scale <= 2,
      s"eps must have scale <= 2 (cents-exact contract), got $eps")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left and right must have disjoint column names; both have: " +
        overlap.mkString(", "))
    val epsC = eps.movePointRight(2).longValueExact()
    def cents(c: Column): Column =
      (c.cast(DecimalType(18, 2)) * 100).cast(LongType)
    // exact floor division for possibly-negative cents at ANY
    // DECIMAL(18,2) magnitude: c − pmod(c, e) is exactly divisible by
    // e, and the division runs in DECIMAL (a double `/` would round
    // the numerator past 2^53 and put a true pair two buckets apart,
    // silently outside the ±1 fan-out)
    def bucketOf(c: Column): Column =
      ((c - pmod(c, lit(epsC))).cast(DecimalType(38, 0)) / epsC)
        .cast(LongType)
    val l = left.where(cents(col(leftVal)).isNotNull)
      .withColumn("__lc", cents(col(leftVal)))
      .withColumn("__bucket",
        explode(array(bucketOf(col("__lc")) - 1, bucketOf(col("__lc")),
          bucketOf(col("__lc")) + 1)))
    val r = right.where(cents(col(rightVal)).isNotNull)
      .withColumn("__rc", cents(col(rightVal)))
      .withColumn("__bucket", bucketOf(col("__rc")))
    val cond = (blockCols.map { case (a, b) => col(a) === col(b) } :+
      (l("__bucket") === r("__bucket"))).reduce(_ && _)
    l.join(r, cond)
      .where(abs(col("__lc") - col("__rc")) <= epsC)
      .withColumn("diff_cents", col("__rc") - col("__lc"))
      .drop("__lc", "__rc").drop(l("__bucket")).drop(r("__bucket"))
  }

  /** Plan-quality guard (SURVEY §7.4.5): fail fast if the physical plan
    * degenerated to a nested-loop / cartesian strategy.
    */
  def assertNoNestedLoop(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.executedPlan.toString()
    require(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "interval join planned as nested loop — equi key not extracted")
    df
  }
}
