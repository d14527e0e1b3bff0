package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions

/** Deduplication operators for training-data pipelines: exact,
  * fingerprint, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: every variant reduces to (map-side signature) →
  * (shuffle on a narrow key) → (pair verification inside buckets). No
  * operator ever compares all N² pairs; candidate generation is always
  * hash-bucketed, so cost is O(N) + O(Σ bucket²) with bucket sizes bounded
  * by the banding parameters.
  */
object Dedup {

  // ---------- exact ----------

  /** Exact dedup: keep the lowest-id row per identical key. One hash
    * shuffle on the key.
    *
    * WARNING — the key you pass IS the shuffle row: `exactSurvivors(df,
    * col("text"), ...)` shuffles the full document text. At 100 TB that
    * multiplies the exchange by the average document size. Dedup on a
    * digest instead: [[byFingerprint]] (whitespace/case-normalized md5)
    * or `xxhash64(text)` — identical grouping, ~16-byte shuffle rows.
    * Passing a raw wide column is only appropriate for small frames or
    * when the key is already narrow.
    */
  def exactSurvivors(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("__k")).agg(min(id).as("survivor_id")).drop("__k")

  /** Exact dedup keeping whole first-id rows (semi-join back). Null-safe
    * on the key columns: a null key (e.g. fingerprint of a null text)
    * forms its own dedup group instead of vanishing from the output (a
    * plain equi semi-join never matches null = null).
    */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val surv = df.groupBy(keyCols.map(col): _*).agg(min(col(idCol)).as(idCol))
    val s2 = surv.toDF(surv.columns.map("__s_" + _): _*)
    val cond = (keyCols.map(c => col(c) <=> col("__s_" + c)) :+
      (col(idCol) === col("__s_" + idCol))).reduce(_ && _)
    df.join(s2, cond, "left_semi")
  }

  /** Near-exact dedup on the whitespace/case-normalized md5 fingerprint. */
  def byFingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame =
    exact(df.withColumn("__fp", TextAnalysis.fingerprint(col(textCol))),
      Seq("__fp"), idCol).drop("__fp")

  /** Incremental corpus dedup — the shape of a CONTINUOUSLY-growing
    * training corpus: dedup a new batch (a) against the existing corpus
    * and (b) within itself, touching only narrow fingerprints of the
    * corpus. The corpus side ships ~16-byte digest rows into the anti
    * join, never its text — at 100 TB of accumulated corpus that is the
    * difference between shuffling 100 TB and shuffling ~2 TB of md5s
    * (and the fingerprint table is exactly what [[byFingerprint]]
    * already maintains). The batch (the small, new increment) carries
    * its payload through one fingerprint-keyed shuffle.
    *
    * Null-text batch rows survive the anti join (null never equals a
    * corpus fingerprint) and collapse to one survivor in the in-batch
    * pass ([[exact]] groups nulls with `<=>`).
    */
  def incremental(batch: DataFrame, textCol: String, idCol: String,
      corpusFps: DataFrame, fpCol: String): DataFrame = {
    val withFp = batch.withColumn("__fp",
      TextAnalysis.fingerprint(col(textCol)))
    val fresh = withFp.join(corpusFps.select(col(fpCol).as("__fp")),
      Seq("__fp"), "left_anti")
    exact(fresh, Seq("__fp"), idCol).drop("__fp")
  }

  /** Bloom-prefiltered [[incremental]] — same EXACT output, different
    * shuffle economics. Phase 1 builds a bloom filter over the corpus
    * fingerprints (one aggregation pass; ~1.2 GB per 10^9 docs at 1%
    * fpp — size it with `expectedItems`/`fpp`) and probes it MAP-SIDE
    * over the batch: rows the bloom rejects are definitely fresh and
    * never enter a join. Phase 2 verifies only the bloom hits (true dups
    * + ~fpp false positives) with the exact anti join, so correctness
    * never depends on the sketch. When most of the batch is fresh — the
    * steady state of corpus growth — the corpus-wide anti join shrinks
    * to a sliver of the batch; bucket the corpus fingerprint table on
    * `fpCol` ([[graft.sources.LakeWriter.writeBucketed]]) and the verify
    * join runs exchange-free on the corpus side too.
    */
  def incrementalBloom(batch: DataFrame, textCol: String, idCol: String,
      corpusFps: DataFrame, fpCol: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = corpusFps.stat.bloomFilter(fpCol, expectedItems, fpp)
    val withFp = batch.withColumn("__fp",
      TextAnalysis.fingerprint(col(textCol)))
    val probed = withFp.withColumn("__maybe",
      GraftFunctions.bloomMightContain(col("__fp"), bloom))
    // null fingerprints probe to null: they belong on the "fresh" side
    // (same as incremental's anti-join-survives-null semantics)
    val freshForSure = probed.where(!col("__maybe") || col("__maybe").isNull)
    val verified = probed.where(col("__maybe"))
      .join(corpusFps.select(col(fpCol).as("__fp")), Seq("__fp"), "left_anti")
    exact(freshForSure.unionByName(verified).drop("__maybe"),
      Seq("__fp"), idCol).drop("__fp")
  }

  // ---------- character-set Jaccard (blocked pairwise) ----------

  /** Jaccard similarity of the distinct-character sets of two strings
    * (DuckDB `jaccard` semantics: set-based, case-sensitive).
    */
  def charJaccard(a: Column, b: Column): Column = {
    // split(x, "") appends a trailing "" element (limit -1) that both
    // sets would share, inflating every similarity to (i+1)/(u+1)
    val ca = array_remove(array_distinct(split(a, "")), "")
    val cb = array_remove(array_distinct(split(b, "")), "")
    size(array_intersect(ca, cb)).cast(DoubleType) /
      size(array_union(ca, cb)).cast(DoubleType)
  }

  /** Token n-gram (shingle) Jaccard over two texts. */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column =
    graft.functions.GraftFunctions.jaccard(
      shingleHashes(TextAnalysis.tokens(a), n),
      shingleHashes(TextAnalysis.tokens(b), n))

  /** All pairs within `blockCols` blocks whose similarity ≥ threshold.
    * Blocking keys bound the self-join (equi-shuffle, no cross product).
    *
    * Low-cardinality blocks (e.g. one language × one source over a 100 TB
    * corpus) are quadratic: a block of B docs emits B² candidate pairs in
    * ONE task. Blocks larger than `maxBlockSize` therefore fall back to
    * the sorted-neighborhood method (Hernández & Stolfo, "The
    * merge/purge problem for large databases"): sort the block by the
    * doc's distinct-character-set string — the very feature charJaccard
    * compares, so similar docs sort adjacently — and pair each doc only
    * with its next `neighborhood` successors. Candidates drop from O(B²)
    * to O(B·neighborhood); identical char sets are contiguous in the sort
    * so the highest-similarity pairs survive, and runs longer than the
    * window stay transitively chained for downstream component building.
    * Cross-window pairs of merely-similar (not identical) sets are the
    * accepted recall trade — exhaustive pairing below the cap, bounded
    * above it.
    */
  def blockedJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], threshold: Double,
      maxBlockSize: Int = 2048, neighborhood: Int = 8,
      snmPrefixLen: Int = 4): DataFrame = {
    // sort key for the SNM fallback = the sorted distinct char set
    // (charJaccard's feature space, so similar docs sort adjacently)
    val key = concat_ws("", array_sort(
      array_remove(array_distinct(split(col(textCol), "")), "")))
    val cands = cappedBlockCandidates(df, idCol, key, blockCols,
      maxBlockSize, neighborhood, snmPrefixLen)
    val txt = df.select(col(idCol), col(textCol))
    cands.join(txt, idCol)
      .join(txt.select(col(idCol).as(idCol + "_2"),
        col(textCol).as(textCol + "_2")), idCol + "_2")
      .withColumn("sim", charJaccard(col(textCol), col(textCol + "_2")))
      .where(col("sim") >= threshold)
      .select(col(idCol), col(idCol + "_2"), col("sim"))
  }

  /** Blocked token-`n`-gram (shingle-hash) Jaccard near-dup pairs —
    * the same capped candidate core as [[blockedJaccardPairs]] with the
    * d8 normalized-prefix SNM sort key, verified by the shingle-set
    * Jaccard. Shingle arrays are computed ONCE per doc and join back by
    * id only for the surviving candidates — text and shingles never
    * ride the pair explosion.
    */
  def blockedShinglePairs(df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], threshold: Double, n: Int = 3,
      maxBlockSize: Int = 2048, neighborhood: Int = 8,
      snmPrefixLen: Int = 4): DataFrame =
    blockedSetPairs(df, idCol, textCol, blockCols, threshold, n,
      maxBlockSize, neighborhood, snmPrefixLen,
      graft.functions.GraftFunctions.jaccardSorted)

  /** Shared body of the shingle-set pair operators: capped candidates,
    * once-per-doc sorted shingle arrays joined back by id, and a
    * caller-chosen pair verifier over the two sorted sets.
    */
  private def blockedSetPairs(df: DataFrame, idCol: String,
      textCol: String, blockCols: Seq[String], threshold: Double, n: Int,
      maxBlockSize: Int, neighborhood: Int, snmPrefixLen: Int,
      verifier: (Column, Column) => Column): DataFrame = {
    val key = substring(
      regexp_replace(lower(col(textCol)), "[^a-z0-9]", ""), 1, 30)
    val cands = cappedBlockCandidates(df, idCol, key, blockCols,
      maxBlockSize, neighborhood, snmPrefixLen)
    val sigs = df.select(col(idCol), sort_array(array_distinct(
      shingleHashes(TextAnalysis.tokens(col(textCol)), n))).as("__sh"))
    cands.join(sigs, idCol)
      .join(sigs.select(col(idCol).as(idCol + "_2"),
        col("__sh").as("__sh2")), idCol + "_2")
      .withColumn("sim", verifier(col("__sh"), col("__sh2")))
      .where(col("sim") >= threshold)
      .select(col(idCol), col(idCol + "_2"), col("sim"))
  }

  /** Blocked CONTAINMENT near-dup pairs — the overlap coefficient
    * |A∩B| / min(|A|,|B|) over token-`n`-gram shingle sets, i.e. the
    * max of the two directional containments. This is the quote /
    * subset detector Jaccard structurally misses: a short doc fully
    * embedded in a long one scores |short|/|long| on Jaccard (→ 0 as
    * the host grows) but 1.0 on containment. Same capped candidate
    * core and once-per-doc shingle discipline as
    * [[blockedShinglePairs]].
    */
  def blockedContainmentPairs(df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], threshold: Double, n: Int = 3,
      maxBlockSize: Int = 2048, neighborhood: Int = 8,
      snmPrefixLen: Int = 4): DataFrame =
    blockedSetPairs(df, idCol, textCol, blockCols, threshold, n,
      maxBlockSize, neighborhood, snmPrefixLen,
      graft.functions.GraftFunctions.overlapSorted)

  /** One field comparator for probabilistic record linkage
    * ([[linkagePairs]]): `agree` evaluates the two sides of a candidate
    * pair's `column` to a boolean; `wAgree` / `wDisagree` are the
    * Fellegi–Sunter log-likelihood-ratio weights (log₂(m/u) and
    * log₂((1−m)/(1−u)), precomputed by the caller). Choose weights that
    * are exact binary fractions (multiples of 2⁻ᵏ for small k) — their
    * double sums are then EXACT in any order, so the match score is
    * bit-identical across engines and partitionings. A null comparison
    * (missing field on either side) contributes weight 0, the standard
    * missing-data convention.
    */
  final case class LinkageField(column: String,
      agree: (Column, Column) => Column,
      wAgree: Double, wDisagree: Double)

  /** Probabilistic record linkage (Fellegi–Sunter): score candidate
    * pairs inside `blockCols` blocks by summing per-field agreement
    * weights, and keep pairs with `score >= threshold`. The classic
    * entity-resolution step a pure-text dedup misses: records that
    * describe the same entity with FIELD-level noise (a typo'd name,
    * a drifted balance) rather than near-identical text.
    *
    * Candidates come from the same capped core as every blocked pair
    * operator ([[cappedBlockCandidates]]): exhaustive inside blocks up
    * to `maxBlockSize`, sorted-neighborhood above it — O(B·k), never
    * B². Only ids and block keys ride the candidate shuffle; the
    * compared fields join back by id for the surviving pairs. Output:
    * `idCol`, `idCol_2` (least-first), `score` (double).
    */
  def linkagePairs(df: DataFrame, idCol: String, blockCols: Seq[String],
      sortKey: Column, fields: Seq[LinkageField], threshold: Double,
      maxBlockSize: Int = 2048, neighborhood: Int = 8,
      snmPrefixLen: Int = 4): DataFrame = {
    require(fields.nonEmpty, "need at least one linkage field")
    // candidate pairs fan out to session width when the INPUT is a
    // narrow scan (r15): pair count is quadratic in block size while
    // the input bytes stay tiny, so AQE's byte-driven coalescing
    // otherwise serializes the comparator sweep into one task (d11's
    // Levenshtein verify: 4.8 s single-task). Applied HERE, not in the
    // shared candidate core — the cheap set-verify consumers (d2/d8's
    // charJaccard/shingle checks) measured ~0.25 s SLOWER with the
    // extra exchange than with the single-task verify they replace.
    val cands = Fanout.fanOutDerived(
      cappedBlockCandidates(df, idCol, sortKey, blockCols,
        maxBlockSize, neighborhood, snmPrefixLen),
      df.select((blockCols :+ idCol).map(col): _*))
    val fieldCols = fields.map(_.column).distinct
    val payload = df.select((idCol +: fieldCols).map(col): _*)
    val payload2 = df.select(col(idCol).as(idCol + "_2") +:
      fieldCols.map(c => col(c).as(c + "_2")): _*)
    val score = fields.map { f =>
      val a = f.agree(col(f.column), col(f.column + "_2"))
      when(a.isNull, lit(0.0)).when(a, lit(f.wAgree))
        .otherwise(lit(f.wDisagree))
    }.reduce(_ + _)
    cands.join(payload, idCol).join(payload2, idCol + "_2")
      .withColumn("score", score)
      .where(col("score") >= threshold)
      .select(col(idCol), col(idCol + "_2"), col("score"))
  }

  /** The shared capped candidate core: id pairs (least-first) inside
    * `blockCols` blocks — EXHAUSTIVE for blocks up to `maxBlockSize`,
    * sorted-neighborhood (Hernández & Stolfo merge/purge) above it:
    * sort the block by `sortKey` (ties by id), pair each doc only with
    * its next `neighborhood` successors. Candidates drop from O(B²) to
    * O(B·neighborhood); similar docs sort adjacently as far as the key
    * correlates with the verifier's similarity, and runs longer than
    * the window stay transitively chained for component building.
    * Cross-window pairs of merely-similar keys are the accepted recall
    * trade — exhaustive below the cap, bounded above it.
    *
    * Only the block columns, the id, and the sort key ride the
    * shuffles; callers join payloads (text, shingles) back by id.
    *
    * The global-within-block rank is computed in TWO levels so no
    * single task ever sorts a whole oversized block: rows rank inside
    * (block, key-prefix bucket) windows — parallel across buckets —
    * and per-bucket offsets come from a cumsum over one narrow row per
    * bucket (the only per-block serial step). Because the bucket is a
    * PREFIX of the sort key, (bucket, key, id) order equals (key, id)
    * order, so the two-level rank is IDENTICAL to the single-window
    * rank (spec-pinned). A block whose docs all share one key prefix
    * degrades to the single-task sort — lengthen `prefixLen` if the
    * key space is that degenerate.
    */
  def cappedBlockCandidates(df: DataFrame, idCol: String, sortKey: Column,
      blockCols: Seq[String], maxBlockSize: Int = 2048,
      neighborhood: Int = 8, prefixLen: Int = 4): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    // block sizing as a NARROW pre-aggregated count + a broadcast of
    // just the oversized block keys (few by construction) — the
    // all-rows window count this replaces shuffled every (block, id,
    // key) row once before any pairing, and the sort key (often a
    // regex over the text) is now computed ONLY for oversized-block
    // rows. NULL-keyed blocks never match the broadcast join and stay
    // on the exhaustive path — filter null block keys upstream if such
    // a block can exceed the cap.
    val ids = df.select(blockCols.map(col) :+ col(idCol): _*)
    val bigBlocks = ids.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("__bn")).where(col("__bn") > maxBlockSize)
      .select(blockCols.map(col): _*).withColumn("__big", lit(1))
    val small = ids.join(broadcast(bigBlocks), blockCols, "left")
      .where(col("__big").isNull)
      .select(blockCols.map(col) :+ col(idCol): _*)
    val smallPairs = small
      .join(small.withColumnRenamed(idCol, idCol + "_2"), blockCols)
      .where(col(idCol) < col(idCol + "_2"))
      .select(col(idCol), col(idCol + "_2"))
    val big = df.join(broadcast(bigBlocks), blockCols, "left")
      .where(col("__big") === 1)
      .select(blockCols.map(col) :+ col(idCol) :+
        sortKey.cast(StringType).as("__key"): _*)
      .withColumn("__bkt", substring(col("__key"), 1, prefixLen))
    val bktCols = blockCols :+ "__bkt"
    val ranked = big.withColumn("__ir", row_number().over(
      W.partitionBy(bktCols.map(col): _*)
        .orderBy(col("__key"), col(idCol))))
    val offsets = ranked.groupBy(bktCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        W.partitionBy(blockCols.map(col): _*)
          .orderBy(col("__bkt"))
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(bktCols.map(col) :+ col("__off"): _*)
    val narrow = ranked.join(offsets, bktCols)
      .withColumn("__r", col("__off") + col("__ir"))
      .select(blockCols.map(col) :+ col(idCol) :+ col("__r"): _*)
    val lhs = narrow
      .withColumn("__j", explode(sequence(lit(1), lit(neighborhood))))
      .withColumn("__r", col("__r") + col("__j")).drop("__j")
    val bigPairs = lhs
      .join(narrow.withColumnRenamed(idCol, idCol + "_2"),
        blockCols :+ "__r")
      // canonical orientation (sort order is by key, not id)
      .select(least(col(idCol), col(idCol + "_2")).as(idCol),
        greatest(col(idCol), col(idCol + "_2")).as(idCol + "_2"))
    smallPairs.unionByName(bigPairs)
  }

  /** Global sorted-neighborhood near-dup pairs (Hernández & Stolfo's
    * merge/purge method as a standalone corpus-wide operator, not the
    * per-block fallback inside [[blockedJaccardPairs]]): ONE total order
    * over the whole corpus by a similarity-correlated `sortKey`, each
    * document paired with its next `window - 1` successors, pairs
    * verified by token-`n`-gram Jaccard ≥ `threshold`.
    *
    * Scale design — candidates are O(N·window), never O(N²), and no
    * single task sorts the corpus:
    *   - the global rank is computed in TWO levels: ranks inside
    *     (key-prefix bucket) windows run parallel across buckets, and
    *     per-bucket offsets come from a cumsum over ONE narrow row per
    *     bucket (the only serial step, |buckets| rows). The bucket being
    *     a PREFIX of the key makes (bucket, key, id) order equal
    *     (key, id) order, so the two-level rank IS the single-order rank.
    *   - pairing is a plain equi-join on the rank: the left side explodes
    *     each doc to its `window - 1` successor ranks (narrow (id, rank)
    *     rows — text never rides the explode), one hash shuffle on a
    *     long.
    *   - shingle arrays join back by id only for the surviving
    *     candidates' verification.
    * A corpus whose docs all share one `prefixLen`-char key prefix
    * degrades the rank step to a single task — lengthen `prefixLen`
    * (the rank result is unchanged; only parallelism moves).
    *
    * Recall contract (vs the quadratic all-pairs): near-dups sort
    * adjacently only as far as the key correlates with similarity —
    * pairs further than `window` apart in the order are missed. That is
    * the SNM trade; use [[minhashPairs]] when probabilistic all-range
    * recall matters more than a deterministic single-order pass.
    *
    * Output: (idCol, idCol_2, sim), id pairs canonically least-first.
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, textCol: String,
      sortKey: Column, window: Int, threshold: Double, n: Int = 3,
      prefixLen: Int = 4): DataFrame = {
    require(window >= 2, "window must pair each doc with >= 1 successor")
    val W = org.apache.spark.sql.expressions.Window
    val base = df.where(col(textCol).isNotNull)
      .withColumn("__key", sortKey.cast(StringType))
      .withColumn("__bkt", substring(col("__key"), 1, prefixLen))
    val ranked = base.withColumn("__ir", row_number().over(
      W.partitionBy(col("__bkt")).orderBy(col("__key"), col(idCol))))
    val offsets = ranked.groupBy(col("__bkt"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        W.orderBy(col("__bkt")).rowsBetween(W.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__bkt"), col("__off"))
    // one row per distinct key prefix — broadcast keeps the rank join
    // map-side (the ranked side is already shuffled by bucket)
    val narrow = ranked.join(broadcast(offsets), Seq("__bkt"))
      .withColumn("__r", col("__off") + col("__ir"))
      .select(col(idCol), col("__r"))
    val lhs = narrow
      .withColumn("__j", explode(sequence(lit(1), lit(window - 1))))
      .select(col(idCol).as("__id_a"), (col("__r") + col("__j")).as("__r"))
    val cand = lhs
      .join(narrow.select(col(idCol).as("__id_b"), col("__r")), "__r")
      .drop("__r")
    val sigs = df.where(col(textCol).isNotNull)
      .select(col(idCol), sort_array(array_distinct(
        shingleHashes(TextAnalysis.tokens(col(textCol)), n))).as("__sh"))
    cand
      .join(sigs.select(col(idCol).as("__id_a"), col("__sh").as("__sh_a")),
        "__id_a")
      .join(sigs.select(col(idCol).as("__id_b"), col("__sh").as("__sh_b")),
        "__id_b")
      .withColumn("sim", graft.functions.GraftFunctions.jaccardSorted(
        col("__sh_a"), col("__sh_b")))
      .where(col("sim") >= threshold)
      .select(least(col("__id_a"), col("__id_b")).as(idCol),
        greatest(col("__id_a"), col("__id_b")).as(idCol + "_2"),
        col("sim"))
  }

  /** Spread a small input across the full shuffle-partition count before
    * a compute-heavy map stage. Tiny parquet inputs are one row-group =
    * one split = one task, which would leave signature computation
    * single-threaded; this narrow-row shuffle is O(input) and unlocks
    * cluster-wide parallelism. On large (multi-split) inputs it is an
    * unneeded-but-cheap rebalance; callers on 100 TB inputs should feed
    * naturally-split files and skip it.
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)

  // ---------- MinHash + LSH ----------

  /** Deterministic 64-bit mix (splitmix64) — drives per-permutation hash
    * coefficients at plan-build time; the data-side hashing is xxhash64.
    */
  // single shared mixer — see GraftFunctions.splitmix64
  private def splitmix64(x0: Long): Long =
    graft.functions.GraftFunctions.splitmix64(x0)

  /** Hashes of token `n`-shingles: xxhash64 of the space-joined window.
    * Map-side only; array column of size (tokens - n + 1).
    */
  def shingleHashes(toks: Column, n: Int): Column =
    graft.functions.GraftFunctions.ngramHashes(toks, n)

  /** MinHash signature: for permutation j, min over shingles of
    * a_j·h + b_j (64-bit wrap-around universal-ish hashing). One array
    * column of `numHashes` longs per row, all map-side.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    graft.functions.GraftFunctions.minhashSig(shingles, numHashes)

  /** LSH band keys: hash each of `bands` contiguous signature slices.
    * Two documents collide in some band iff their signatures agree on all
    * `rows = numHashes / bands` positions of that band.
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(sig, b * rows + 1, lit(rows))))

  /** Candidate pairs via MinHash LSH, verified with exact shingle-set
    * Jaccard ≥ `threshold`. Pipeline: shingle → signature (map) → explode
    * bands (×bands) → shuffle on band key → within-bucket pairing →
    * distinct pair → verify. The only quadratic work is inside LSH
    * buckets, whose expected size is controlled by (bands, rows).
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 16,
      threshold: Double = 0.7,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, "bands must divide numHashes")
    // (id, sorted distinct shingle hashes) — computed once, joined back for
    // verification so the ×bands band explosion and the candidate dedup
    // shuffle only NARROW (band, id) rows, never the shingle arrays.
    // localCheckpoint: this subtree (tokenize+shingle+minhash-prep, the
    // dominant map-side cost) feeds the band explosion AND both
    // verification joins — without materialization it executes 3x
    val sigs = spread(df.select(col(idCol), col(textCol)))
      .withColumn("__sh", sort_array(array_distinct(
        shingleHashes(TextAnalysis.tokens(col(textCol)), n))))
      .drop(textCol)
      .localCheckpoint(true)
    val banded = sigs.select(col(idCol), explode(
      bandKeys(minhashSignature(col("__sh"), numHashes), bands, rows)).as("__band"))
    // Adversarial-skew guard: a band bucket holding B near-identical docs
    // (boilerplate corpora) emits B² candidate pairs. Buckets above
    // `maxBucketSize` fall back to CHAIN pairing — id-sorted adjacent
    // pairs only — linear in B. For the motivating case (a bucket of
    // near-identical boilerplate) adjacent pairs pass verification and
    // the chain keeps the cluster transitively connected downstream.
    // Caveat: chain pairs still face the jaccard >= threshold check, so a
    // bucket mixing genuinely-dissimilar docs (pure band-hash collisions)
    // can split where exhaustive B² pairing would have bridged via a
    // skipped pair — an accepted recall trade inside oversized buckets.
    val rawPairs = if (maxBucketSize == Int.MaxValue) {
      // no cap: skip the bucket-sizing window entirely
      banded.join(banded.withColumnRenamed(idCol, idCol + "_2"), "__band")
        .where(col(idCol) < col(idCol + "_2"))
        .select(col(idCol), col(idCol + "_2"))
    } else {
      val sized = banded.withColumn("__bn",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("__band"))))
      val smallPairs = {
        val sm = sized.where(col("__bn") <= maxBucketSize).drop("__bn")
        sm.join(sm.withColumnRenamed(idCol, idCol + "_2"), "__band")
          .where(col(idCol) < col(idCol + "_2"))
          .select(col(idCol), col(idCol + "_2"))
      }
      val chainPairs = {
        val big = sized.where(col("__bn") > maxBucketSize)
          .withColumn("__r", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("__band")).orderBy(col(idCol))))
        big.select(col("__band"), col(idCol), (col("__r") + 1).as("__r"))
          .join(big.select(col("__band"), col(idCol).as(idCol + "_2"), col("__r")),
            Seq("__band", "__r"))
          .select(col(idCol), col(idCol + "_2"))
      }
      smallPairs.unionAll(chainPairs)
    }
    val candidates = rawPairs.dropDuplicates(idCol, idCol + "_2")
    candidates
      .join(sigs, idCol)
      .join(sigs.select(col(idCol).as(idCol + "_2"), col("__sh").as("__sh2")),
        idCol + "_2")
      .withColumn("jaccard",
        graft.functions.GraftFunctions.jaccardSorted(col("__sh"), col("__sh2")))
      .where(col("jaccard") >= threshold)
      .select(col(idCol), col(idCol + "_2"), col("jaccard"))
  }

  // ---------- duplicate-cluster construction ----------

  /** Connected components over an undirected pair graph (the output of
    * [[minhashPairs]]/[[simhashPairs]]/`Similarity.nearDupPairs`):
    * assigns every vertex the MINIMUM id reachable from it — the
    * canonical duplicate-cluster id. This is the step that turns
    * near-dup PAIRS into actionable dedup decisions (keep one doc per
    * component).
    *
    * Algorithm: distributed min-label propagation — each iteration joins
    * current labels across edges and takes the min neighbor label;
    * converges in O(graph diameter) rounds (dup clusters are
    * near-cliques, so typically 2-3). Each round is one narrow
    * (id, label) shuffle; `localCheckpoint` truncates the growing
    * lineage. At 100 TB-scale graphs with long chains, switch to
    * large-star/small-star (same join primitive, O(log n) rounds).
    *
    * Strategy selection (like `AsOfJoin.auto`): the pair graph after
    * near-dup candidate generation is orders of magnitude smaller than
    * the corpus, so when the edge list fits `localEdgeThreshold` it is
    * collected and union-found on the driver in one pass, and only the
    * (edge-endpoint → component) map — bounded by 2×threshold — is
    * broadcast back to label the (possibly enormous) vertex table.
    * Larger graphs run the distributed propagation loop.
    *
    * @param vertices one row per vertex id (ids not in any pair form
    *                 singleton components)
    * @return (idCol, component) — component = min reachable id
    */
  def connectedComponents(vertices: DataFrame, pairs: DataFrame,
      idCol: String, idCol2: String, maxIter: Int = 20,
      localEdgeThreshold: Long = 1000000L): DataFrame = {
    // Materialize the pair DAG once — callers pass the full LSH/similarity
    // pipeline lazily, and without this both the size probe and the chosen
    // path would recompute it end-to-end.
    val cached = pairs.localCheckpoint(true)
    val cap = math.min(localEdgeThreshold, Int.MaxValue - 1L).toInt
    val small = cached.limit(cap + 1).count() <= localEdgeThreshold
    if (small)
      componentsViaDriverUnionFind(vertices, cached, idCol, idCol2)
    else // O(log n) rounds regardless of diameter — propagation's
         // O(diameter) silently under-merges long chains past maxIter
      componentsViaStarContraction(vertices, cached, idCol, idCol2, maxIter)
  }

  /** Small-graph path: one collect of the edge list, path-compressed
    * union-find with union-by-min, broadcast join back. Exact same
    * fixpoint (min reachable id) as the distributed loop.
    */
  private def componentsViaDriverUnionFind(vertices: DataFrame,
      pairs: DataFrame, idCol: String, idCol2: String): DataFrame = {
    import scala.collection.mutable
    val idType = vertices.schema(idCol).dataType
    val edges = pairs.select(col(idCol).cast(idType), col(idCol2).cast(idType))
      .collect()
    val parent = mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def lt(a: Any, b: Any): Boolean =
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    edges.foreach { row =>
      val (a, b) = (row.get(0), row.get(1))
      if (a != null && b != null) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
        }
      }
    }
    val endpoints = edges.iterator
      .flatMap(r => Seq(r.get(0), r.get(1))).filter(_ != null).toSet
    val spark = vertices.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__v", idType),
      org.apache.spark.sql.types.StructField("__c", idType)))
    val mapping = spark.createDataFrame(
      java.util.Arrays.asList(endpoints.toSeq.map(v =>
        org.apache.spark.sql.Row(v, find(v))): _*), schema)
    vertices.select(col(idCol))
      .join(broadcast(mapping), col(idCol) === col("__v"), "left")
      .select(col(idCol), coalesce(col("__c"), col(idCol)).as("component"))
  }

  /** Huge-graph path: alternating large-star/small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * converges in O(log n) rounds regardless of graph diameter, where
    * min-label propagation needs O(diameter). Each round is two
    * join+aggregate passes over the edge list; no per-node neighbor
    * lists are ever collected (the min is an aggregate, so high-degree
    * hubs partial-aggregate map-side instead of blowing up one task).
    *
    *   large-star: every neighbor v > u links to min(Γ(u) ∪ u)
    *   small-star: every neighbor v <= u (and u) links to min(Γ⁻(u) ∪ u)
    *
    * Fixpoint: the edge set becomes (node → component root). Chain
    * vertices through the final mapping (roots map to themselves).
    */
  def componentsViaStarContraction(vertices: DataFrame, pairs: DataFrame,
      idCol: String, idCol2: String, maxIter: Int = 25): DataFrame = {
    def sym(df: DataFrame): DataFrame =
      df.select(col("__u"), col("__v"))
        .unionAll(df.select(col("__v").as("__u"), col("__u").as("__v")))
        .where(col("__u") =!= col("__v"))
        .distinct()
    var edges = sym(pairs.select(col(idCol).as("__u"), col(idCol2).as("__v")))
      .localCheckpoint(true)
    // fixpoint signature: (count, order-insensitive hash-sum). A bare
    // hash-sum can collide between two distinct successive edge sets and
    // end the loop early with wrong components; pairing it with the exact
    // row count makes a false fixpoint require a same-size collision —
    // both come out of ONE aggregate pass, so no extra job
    def edgeSig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("__u"), col("__v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var prev = (-1L, -1L)
    var iter = 0
    var converged = edges.isEmpty
    while (!converged && iter < maxIter) {
      // large-star
      val minsL = edges.groupBy("__u")
        .agg(least(min(col("__v")), first(col("__u"))).as("__m"))
      val large = edges.join(minsL, "__u")
        .where(col("__v") > col("__u"))
        .select(col("__v").as("__u"), col("__m").as("__v"))
      val afterLarge = sym(large)
      // small-star over the contracted edges
      val smallIn = afterLarge
        .select(greatest(col("__u"), col("__v")).as("__u"),
          least(col("__u"), col("__v")).as("__v"))
        .distinct()
      val minsS = smallIn.groupBy("__u")
        .agg(min(col("__v")).as("__m"))
      val small = smallIn.join(minsS, "__u")
        .select(col("__u"), col("__v"), col("__m"))
      val next = sym(
        small.select(col("__v").as("__u"), col("__m").as("__v"))
          .unionAll(small.select(col("__u"), col("__m").as("__v"))))
        .localCheckpoint(true)
      val h = edgeSig(next)
      converged = h == prev
      prev = h
      edges = next
      iter += 1
    }
    require(converged || edges.isEmpty,
      s"star contraction did not converge in $maxIter rounds")
    // final mapping: node -> min neighbor (its root); roots and isolated
    // vertices map to themselves
    val roots = edges.groupBy("__u").agg(min(col("__v")).as("__m"))
      .where(col("__m") < col("__u"))
    vertices.select(col(idCol))
      .join(roots.withColumnRenamed("__u", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__m"), col(idCol)).as("component"))
  }

  /** Big-graph path: distributed min-label propagation (O(diameter)
    * rounds of one narrow shuffle each; lineage truncated per round).
    * Convergence check exploits monotonicity: labels only ever decrease,
    * so the fixpoint is reached exactly when a cheap aggregate hash of
    * (vertex, label) stops changing — no per-round join needed.
    */
  private[graft] def componentsViaPropagation(vertices: DataFrame,
      pairs: DataFrame, idCol: String, idCol2: String,
      maxIter: Int): DataFrame = {
    val edges = pairs.select(col(idCol).as("__src"), col(idCol2).as("__dst"))
      .unionAll(pairs.select(col(idCol2).as("__src"), col(idCol).as("__dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = vertices.select(col(idCol).as("__v"), col(idCol).as("__l"))
    // Fixpoint signature = a pair of INDEPENDENT hash-sums (over (v,l)
    // and over l alone). The vertex count is constant here so it adds no
    // signal; a false fixpoint now needs a SIMULTANEOUS collision in two
    // differently-keyed 64-bit sums (~2^-128) instead of one. (A plain
    // sum(label) would be provably monotone but labels may be strings /
    // arbitrary orderable types, so it cannot be the generic check.)
    def stateSig(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        coalesce(sum(xxhash64(col("__v"), col("__l"))), lit(0L)),
        coalesce(sum(xxhash64(col("__l"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var prev = (-1L, -1L)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val viaEdges = edges
        .join(labels.withColumnRenamed("__v", "__src"), "__src")
        .select(col("__dst").as("__v"), col("__l"))
      val next = labels.unionAll(viaEdges)
        .groupBy("__v").agg(min("__l").as("__l"))
        .localCheckpoint(true) // truncate lineage each round
      val h = stateSig(next)
      converged = h == prev
      prev = h
      labels = next
      iter += 1
    }
    require(converged,
      s"label propagation did not converge in $maxIter rounds (graph " +
        "diameter too large) — use componentsViaStarContraction")
    labels.select(col("__v").as(idCol), col("__l").as("component"))
  }

  /** Duplicate-cluster survivor selection: keep the lowest-id document of
    * every component (composes [[connectedComponents]] with a semi-join
    * back to the full rows).
    */
  def canonicalize(df: DataFrame, pairs: DataFrame,
      idCol: String, idCol2: String): DataFrame = {
    val comps = connectedComponents(df.select(col(idCol)), pairs, idCol, idCol2)
    // component IS the min member id (both strategies' invariant), so the
    // survivor set is just the distinct component values
    val survivors = comps.select(col("component").as(idCol)).distinct()
    df.join(survivors, Seq(idCol), "left_semi")
  }

  // ---------- decontamination ----------

  /** Benchmark decontamination: drop training docs whose shingle overlap
    * with a held-out/benchmark corpus is ≥ `maxOverlap` (a core
    * training-data hygiene op). Fully relational — explode distinct
    * shingles, hash-join against the (deduped) benchmark shingle set,
    * per-doc overlap ratio — so it scales as two narrow shuffles; the
    * benchmark side is typically small enough to broadcast.
    * Returns the SURVIVING train rows.
    */
  def decontaminate(train: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String,
      n: Int = 3, maxOverlap: Double = 0.5): DataFrame = {
    // explode_outer: a null-text doc (null shingle array) keeps one row
    // with a null shingle -> zero overlap -> SURVIVES, instead of
    // silently vanishing from the output as if fully contaminated
    val trainSh = train.select(col(idCol), explode_outer(array_distinct(
      shingleHashes(TextAnalysis.tokens(col(textCol)), n))).as("__sh"))
    val benchSh = bench.select(explode(array_distinct(
      shingleHashes(TextAnalysis.tokens(col(benchTextCol)), n))).as("__sh"))
      .distinct()
      .withColumn("__hit", lit(1))
    val clean = trainSh.join(benchSh, Seq("__sh"), "left")
      .groupBy(col(idCol))
      .agg((sum(coalesce(col("__hit"), lit(0))).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("__overlap"))
      .where(col("__overlap") < maxOverlap)
      .select(col(idCol))
    train.join(clean, Seq(idCol), "left_semi")
  }

  /** The AUDIT half of decontamination: per-document benchmark-overlap
    * scores ([[decontaminate]] is the filter applied after a threshold
    * is chosen from exactly this report). One row per train doc:
    * `overlap` = fraction of its distinct token n-grams that appear in
    * the benchmark, `grams` = its distinct n-gram count (a 1-gram doc at
    * overlap 1.0 means much less than a 500-gram doc at 0.6 — the count
    * is what makes the score readable). Same two narrow shuffles as
    * decontaminate: grams explode → hash join vs the distinct benchmark
    * grams → per-doc reaggregation; benchmark side is DISTINCT n-grams
    * only, typically broadcastable at any corpus size.
    */
  def contaminationReport(train: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 3): DataFrame = {
    val trainSh = train.select(col(idCol), explode_outer(array_distinct(
      shingleHashes(TextAnalysis.tokens(col(textCol)), n))).as("__sh"))
    val benchSh = bench.select(explode(array_distinct(
      shingleHashes(TextAnalysis.tokens(col(benchTextCol)), n))).as("__sh"))
      .distinct()
      .withColumn("__hit", lit(1))
    trainSh.join(benchSh, Seq("__sh"), "left")
      .groupBy(col(idCol))
      .agg(
        (sum(coalesce(col("__hit"), lit(0))).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("overlap"),
        sum(when(col("__sh").isNotNull, 1L).otherwise(0L)).as("grams"))
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over whitespace tokens: per bit, sign of the sum of
    * ±1 contributions from each token's hash. Near-identical texts differ
    * in few bits. `tokenHash` defaults to xxhash64 (fast, codegen'd);
    * pass [[md5Hash60]] for a hash an external SQL engine can re-derive
    * (cross-engine verification).
    */
  def simhash64(toks: Column,
      tokenHash: Column => Column = xxhash64(_)): Column =
    graft.functions.GraftFunctions.simhash64(transform(toks, tokenHash))

  /** 60-bit token hash both Spark and ANSI-ish SQL engines can compute:
    * first 15 hex chars of md5, parsed base-16 — evaluated natively
    * ([[graft.functions.GraftFunctions.Md5Hash60]], bit-equal to the
    * `conv(substring(md5(c),1,15),16,10)` chain an external engine runs,
    * without the per-row hex-string round trip). Still slower than
    * xxhash64 — use only where an external oracle must reproduce the
    * exact signature.
    *
    * Input domain (r15 ADVICE): the cast widens this to ANY column type
    * — a non-string input hashes its SPARK STRING RENDERING (the old
    * md5-chain failed analysis on such columns instead). An external
    * oracle must therefore apply the same `CAST(col AS VARCHAR)` before
    * its md5; for non-string types whose renderings differ across
    * engines (timestamps, decimals), cast/format explicitly at the call
    * site first.
    */
  def md5Hash60(c: Column): Column =
    graft.functions.GraftFunctions.md5Hash60(c.cast("string"))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs with hamming(simhash) ≤ maxDist, candidates generated
    * by the 4×16-bit-chunk pigeonhole (distance ≤ 3 ⇒ at least one chunk
    * identical): explode 4 chunks → shuffle on (chunk idx, value) →
    * in-bucket verify. Linear candidate generation, no N².
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    require(maxDist <= 3, "4-chunk blocking guarantees recall only to distance 3")
    val sigs = spread(df.select(col(idCol), col(textCol)))
      .select(col(idCol),
        simhash64(TextAnalysis.tokens(col(textCol)), tokenHash).as("__sig"))
    val chunked = sigs.withColumn("__c", explode(
      transform(sequence(lit(0), lit(3)),
        i => struct(i.as("i"),
          call_function("shiftright", col("__sig"), i * 16).bitwiseAND(0xFFFFL).as("v")))))
    val l = chunked.select(col("__c"), col(idCol), col("__sig"))
    val r = chunked.select(col("__c"), col(idCol).as(idCol + "_2"),
      col("__sig").as("__sig2"))
    l.join(r, "__c")
      .where(col(idCol) < col(idCol + "_2"))
      .select(col(idCol), col(idCol + "_2"),
        hamming(col("__sig"), col("__sig2")).as("dist"))
      .where(col("dist") <= maxDist)
      .dropDuplicates(idCol, idCol + "_2")
  }

  /** Near-dup pairs over a PRECOMPUTED 64-bit signature carried as two
    * 32-bit halves (`hiCol`/`loCol` — the [[graft.operators.Multimodal]]
    * dHash shape, engine-portable because neither half touches the
    * sign bit): [[simhashPairs]]' 4×16-bit-chunk pigeonhole blocking
    * (distance ≤ 3 ⇒ at least one chunk identical) + in-bucket hamming
    * verify. Linear candidate generation, no N².
    *
    * Oversized-bucket discipline (the 16-bit key space is only
    * 4×65,536, so at 10⁸+ distinct signatures every bucket holds
    * thousands of rows and in-bucket pairing goes quadratic): any
    * first-level bucket larger than `maxBucketSize` switches to a
    * SECOND blocking level (Manku, Jain & Das Sarma, WWW'07 §3's
    * multi-block scheme): the 48 bits OUTSIDE the matched chunk split
    * into 4×12-bit sub-chunks, and a candidate pair must also share
    * one sub-chunk. Recall is still EXACT to distance 3 — the matched
    * chunk is clean, so all ≤3 dirty bits live in the other 48, and by
    * pigeonhole one of the 4 sub-chunks is clean too. Expected
    * in-bucket pair work drops by 2⁻¹² per probe (4 probes), i.e. the
    * quadratic term shrinks ~2¹⁰×; candidate generation stays linear
    * (≤ 16 keys/row in oversized buckets vs 4 elsewhere).
    *
    * Remaining caller duty: corpora that REPEAT signatures (exact-dup
    * images) must pre-group to one representative per distinct
    * signature — pairs are emitted between the ROWS given, and no
    * blocking level can shrink a bucket of identical 64-bit keys
    * (28 shared bits already pins a second-level sub-bucket).
    */
  def hammingPairs64(df: DataFrame, idCol: String, hiCol: String,
      loCol: String, maxDist: Int = 3,
      maxBucketSize: Int = 4096): DataFrame = {
    require(maxDist <= 3,
      "4-chunk blocking guarantees recall only to distance 3")
    require(maxBucketSize >= 1,
      s"maxBucketSize must be >= 1, got $maxBucketSize")
    val sigs = df.select(col(idCol), col(hiCol).cast(LongType).as("__hi"),
      col(loCol).cast(LongType).as("__lo"))
    // 16-bit chunk k of the 64-bit signature (k=0,1 in hi; 2,3 in lo)
    def chunk(k: Int): Column = {
      val half = if (k < 2) col("__hi") else col("__lo")
      val sh = (k % 2) * 16
      (if (sh == 0) half else call_function("shiftright", half, lit(sh)))
        .bitwiseAND(0xFFFFL)
    }
    val chunked = sigs.withColumn("__c", explode(array(
      (0 to 3).map(k => struct(lit(k).as("i"), chunk(k).as("v"))): _*)))
    // first-level bucket sizes: ≤ 4×65,536 groups — broadcastable
    val sizes = chunked.groupBy(col("__c"))
      .agg(count(lit(1)).as("__bs"))
    val tagged = chunked.join(broadcast(sizes), "__c")
    def pairsOf(l: DataFrame, r: DataFrame, keys: Seq[String]) =
      l.join(r, keys)
        .where(col(idCol) < col(idCol + "_2"))
        .select(col(idCol), col(idCol + "_2"),
          (hamming(col("__hi"), col("__hi2")) +
            hamming(col("__lo"), col("__lo2"))).as("dist"))
    def rside(d: DataFrame, extra: Seq[String]) =
      d.select((Seq(col("__c"), col(idCol).as(idCol + "_2"),
        col("__hi").as("__hi2"), col("__lo").as("__lo2")) ++
        extra.map(col)): _*)
    val small = tagged.where(col("__bs") <= maxBucketSize).drop("__bs")
    val smallPairs = pairsOf(small, rside(small, Nil), Seq("__c"))
    // second level: the 48 bits outside chunk __c.i, as 4×12-bit keys
    val others = (0 to 3).map { i =>
      val os = (0 to 3).filterNot(_ == i)
      chunk(os(0))
        .bitwiseOR(call_function("shiftleft", chunk(os(1)), lit(16)))
        .bitwiseOR(call_function("shiftleft", chunk(os(2)), lit(32)))
    }
    val rem = (0 to 3).foldLeft(lit(0L)) { (acc, i) =>
      when(col("__c.i") === i, others(i)).otherwise(acc)
    }
    val big = tagged.where(col("__bs") > maxBucketSize).drop("__bs")
      .withColumn("__r", rem)
      .withColumn("__s", explode(array((0 to 3).map(j =>
        struct(lit(j).as("j"),
          call_function("shiftright", col("__r"), lit(12 * j))
            .bitwiseAND(0xFFFL).as("w"))): _*)))
      .drop("__r")
    val bigPairs = pairsOf(big, rside(big, Seq("__s")), Seq("__c", "__s"))
    smallPairs.unionAll(bigPairs)
      .where(col("dist") <= maxDist)
      .dropDuplicates(idCol, idCol + "_2")
  }

  // ---------- semantic (embedding-space) dedup ----------

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540):
    * cluster the embedding space with a k-means coarse quantizer,
    * compute pairwise cosine ONLY within each cluster, connect pairs at
    * or above `threshold` into duplicate groups, and keep the
    * minimum-id row of each group. Returns the SURVIVING corpus rows
    * (all input columns).
    *
    * Scale shape: `nlist` bounds the quadratic term — pair work is
    * Σ|cell|² instead of N², exactly the trick that makes
    * embedding-level dedup feasible on a web-scale corpus. Training is
    * the distributed full-corpus Lloyd's
    * ([[Similarity.trainIvfCentroidsDistributed]] — repartition-
    * invariant), assignment map-side, and group-finding reuses
    * [[connectedComponents]] (driver union-find under the edge
    * threshold, O(log n) star contraction above). `nlist = 1`
    * degenerates to exact all-pairs semantic dedup — the oracle mode.
    * Cross-cell near-duplicates are missed by design (the paper's
    * recall/cost dial): raising nlist trades recall for cost, so
    * survivors(nlist) is monotone non-decreasing in nlist.
    *
    * Pass `centroids` to reuse a trained quantizer (e.g. the corpus's
    * IVF index) instead of re-training.
    *
    * `maxCellSize` is the adversarial-skew guard (same contract as
    * [[minhashPairs]]'s `maxBucketSize`): a boilerplate-heavy corpus
    * concentrates near-identical embeddings into ONE cell regardless of
    * nlist, and an uncapped in-cell self-join is B² pairs in that cell.
    * Cells above the cap fall back to CHAIN pairing — id-sorted adjacent
    * pairs only, linear in B. For the motivating case (a cell of
    * near-duplicates) adjacent pairs pass the cosine check and the chain
    * keeps the cluster transitively connected through
    * [[connectedComponents]]; a cell mixing genuinely-dissimilar vectors
    * can split where B² pairing would have bridged via a skipped pair —
    * the same accepted recall trade as the LSH path. Leave at
    * `Int.MaxValue` for the exact mode (`nlist = 1` + no cap ≡ all-pairs
    * semantic dedup, the oracle mode).
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 256, iters: Int = 3,
      centroids: Option[Array[Array[Double]]] = None,
      maxCellSize: Int = Int.MaxValue): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"cosine threshold must be in (0, 1], got $threshold")
    require(maxCellSize >= 2, s"maxCellSize must be >= 2, got $maxCellSize")
    // nlist=1 (the exact all-pairs mode): every row lands in the single
    // cell regardless of centroid values — skip training entirely
    val cell: Column =
      if (nlist == 1 && centroids.isEmpty) lit(0)
      else {
        val cents = centroids.getOrElse(
          Similarity.trainIvfCentroidsDistributed(corpus, idCol, vecCol,
            nlist, iters))
        Similarity.assignCell(col(vecCol), cents)
      }
    // materialize the assignment once: the pairs self-join reads it
    // from BOTH sides, and without this the corpus scan + per-row
    // nearest-centroid assignment would run twice
    val c = corpus.select(col(idCol), col(vecCol))
      .withColumn("__cell", cell)
      .localCheckpoint(true)
    val id2 = idCol + "_2"
    val pairs = semanticPairs(c, idCol, vecCol, threshold, maxCellSize)
    val comp = connectedComponents(corpus.select(col(idCol)), pairs,
      idCol, id2)
    val survivors = comp.where(col(idCol) === col("component"))
      .select(col(idCol))
    corpus.join(survivors, Seq(idCol), "left_semi")
  }

  /** Verified within-cell pair generation for [[semanticDedup]] —
    * `(idCol, idCol_2)` with cosine ≥ threshold, over a frame carrying a
    * `__cell` column. Cells at or under `maxCellSize` pair exhaustively
    * (|cell|² candidates); larger cells chain-pair (id-sorted adjacent
    * rows, |cell|−1 candidates) — the hot-cell guard argued in
    * [[semanticDedup]]'s doc. Package-visible so specs can count the
    * emitted pair work directly.
    */
  private[graft] def semanticPairs(c: DataFrame, idCol: String,
      vecCol: String, threshold: Double, maxCellSize: Int): DataFrame = {
    val id2 = idCol + "_2"
    def verified(cand: DataFrame): DataFrame = cand
      .where(col("__i") < col("__j") &&
        Similarity.cosine(col("__va"), col("__vb")) >= threshold)
      .select(col("__i").as(idCol), col("__j").as(id2))
    def aSide(df: DataFrame): DataFrame = df.select(col("__cell"),
      col(idCol).as("__i"), col(vecCol).as("__va"))
    def bSide(df: DataFrame): DataFrame = df.select(col("__cell"),
      col(idCol).as("__j"), col(vecCol).as("__vb"))
    if (maxCellSize == Int.MaxValue) {
      // no cap: skip the cell-sizing window entirely
      verified(aSide(c).join(bSide(c), Seq("__cell")))
    } else {
      import org.apache.spark.sql.expressions.Window
      val sized = c.withColumn("__bn",
        count(lit(1)).over(Window.partitionBy(col("__cell"))))
      val small = sized.where(col("__bn") <= maxCellSize).drop("__bn")
      val smallPairs = verified(aSide(small).join(bSide(small), Seq("__cell")))
      // oversized cells: id-sorted adjacent pairs — O(B) work per cell
      val big = sized.where(col("__bn") > maxCellSize)
        .withColumn("__r", row_number().over(
          Window.partitionBy(col("__cell")).orderBy(col(idCol))))
      val chainPairs = verified(
        big.select(col("__cell"), col(idCol).as("__i"),
            col(vecCol).as("__va"), (col("__r") + 1).as("__r"))
          .join(big.select(col("__cell"), col(idCol).as("__j"),
            col(vecCol).as("__vb"), col("__r")), Seq("__cell", "__r")))
      smallPairs.unionAll(chainPairs)
    }
  }

  /** The LSH banding S-curve — candidate probability at Jaccard s for a
    * (bands, rows) MinHash configuration:
    *
    *   p(s) = 1 − (1 − s^rows)^bands
    *
    * The tuning table an operator reads BEFORE running [[minhashPairs]]
    * at 100 TB: where the curve crosses ~0.5 is the effective
    * threshold ((1/b)^(1/r)), the left tail is the false-candidate
    * mass, the right tail the miss rate. Pure closed-form math on a
    * `gridSteps`-row frame; round-6 absorbs the engines' pow ulps.
    */
  def lshTuningCurve(spark: org.apache.spark.sql.SparkSession,
      bands: Int, rows: Int, gridSteps: Int = 19): DataFrame = {
    require(bands >= 1 && rows >= 1,
      s"bands/rows must be >= 1, got $bands/$rows")
    require(gridSteps >= 1 && gridSteps <= 100000,
      s"gridSteps must be in [1, 100000], got $gridSteps")
    val s = col("id").cast(DoubleType) / (gridSteps + 1).toDouble
    spark.range(1, gridSteps + 1)
      .select(s.as("s"),
        (round(lit(1.0) - pow(lit(1.0) - pow(s, rows.toDouble),
          bands.toDouble), 6) + lit(0.0)).as("p_candidate"))
  }
}
