package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** End-to-end LLM training-data pipeline: the composition a 100 TB corpus
  * actually runs, built entirely from this engine's operators —
  *
  *   quality gate → exact dedup (fingerprint) → near-dup collapse
  *   (MinHash LSH pairs → connected components → survivor selection) →
  *   duplicated-span removal (ExactSubstr) → benchmark decontamination
  *   (whole-doc gate, then span-surgical cuts) → sliding-window chunking
  *
  * Every stage is one of the verified operators; this job only sequences
  * them and accounts for rows (and, for the span stages, tokens) dropped
  * at each gate. Scale shape: stages 1-2 are map + one narrow shuffle;
  * stage 3 is the LSH pipeline (narrow band shuffles, capped buckets) +
  * component labeling; the span stages shuffle shingles and rebuild with
  * one groupBy(doc); decontamination is a broadcast-ish shingle join;
  * chunking is map-side explode. Nothing collects the corpus to the
  * driver.
  */
object TrainingDataPipeline {

  /** Row/token accounting per stage — the pipeline's observability
    * contract. Doc counts for the doc-dropping stages; token counts for
    * the span stages (they keep docs and cut text).
    */
  case class StageCounts(
      input: Long,
      afterQuality: Long,
      afterExactDedup: Long,
      afterNearDup: Long,
      spanTokensDropped: Long,
      afterDecontamination: Long,
      decontamSpanTokensDropped: Long,
      chunks: Long)

  /** Run the pipeline; returns (chunked corpus, per-stage counts).
    *
    * The span stages rebuild document text from surviving tokens
    * (whitespace-normalized), so downstream stages see the cleaned
    * text; null text is treated as empty rather than dropping the row.
    *
    * @param docs  (idCol, textCol, ...) corpus
    * @param bench held-out benchmark corpus for decontamination
    */
  def run(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minQuality: Double = 0.3,
      jaccardThreshold: Double = 0.8,
      maxOverlap: Double = 0.5,
      spanDedupK: Int = 8,
      decontamSpanK: Int = 8,
      chunkTokens: Int = 20,
      chunkStride: Int = 10): (DataFrame, StageCounts) = {

    val input = docs.count()

    // 1. quality gate (map-only)
    val quality = docs
      .where(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
    val nQuality = quality.count()

    // 2. exact dedup on the normalized fingerprint
    val exact = Dedup.byFingerprint(quality, textCol, idCol)
    val nExact = exact.count()

    // 3. near-dup collapse: LSH pairs -> components -> keep min id
    val pairs = Dedup.minhashPairs(exact, idCol, textCol,
      threshold = jaccardThreshold, maxBucketSize = 1024)
      .select(col(idCol), col(idCol + "_2"))
    val nearDeduped = Dedup.canonicalize(exact, pairs, idCol, idCol + "_2")
      // span stages rebuild from tokens; a null text must become an
      // empty doc, not a dropped row (the accounting would lie)
      .withColumn(textCol, coalesce(col(textCol), lit("")))
    val nNear = nearDeduped.count()

    // 4. duplicated-SPAN removal (passage-level: docs survive, repeated
    // k-token windows keep only their first occurrence)
    val spanned = TextAnalysis.dedupSpans(nearDeduped, idCol, textCol,
      k = spanDedupK).localCheckpoint(true)
    val spanDropped = spanned.agg(
      coalesce(sum(col("n_dropped").cast("long")), lit(0L)))
      .head.getLong(0)
    val spanDocs = spanned.select(col(idCol), col("clean_text").as(textCol))

    // 5. benchmark decontamination: whole-doc gate on overlap ratio,
    // then span-surgical cuts of any residual eval k-grams
    // (no null guard here: spanDocs' text is a rebuilt array_join —
    // never null — and decontaminate's semi join adds nothing)
    val clean = Dedup.decontaminate(spanDocs, idCol, textCol,
      bench, textCol, maxOverlap = maxOverlap)
    val nClean = clean.count()
    val surgical0 = TextAnalysis.decontaminateSpans(clean, idCol, textCol,
      bench, textCol, k = decontamSpanK).localCheckpoint(true)
    val surgicalDropped = surgical0.agg(
      coalesce(sum(col("n_dropped").cast("long")), lit(0L)))
      .head.getLong(0)
    val surgical = surgical0.select(col(idCol),
      col("clean_text").as(textCol))

    // 6. sliding-window chunking (map-side explode); empty docs emit
    // one empty chunk so every surviving doc stays accounted
    val toks = coalesce(TextAnalysis.tokens(col(textCol)), array(lit("")))
    val chunked = surgical.select(col(idCol),
      posexplode(transform(
        sequence(lit(0), size(toks) - 1, lit(chunkStride)),
        st => concat_ws(" ", slice(toks, st + 1, lit(chunkTokens))))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_text")
    val nChunks = chunked.count()

    (chunked, StageCounts(input, nQuality, nExact, nNear, spanDropped,
      nClean, surgicalDropped, nChunks))
  }
}
