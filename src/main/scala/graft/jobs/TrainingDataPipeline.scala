package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** End-to-end LLM training-data pipeline: the composition a 100 TB corpus
  * actually runs, built entirely from this engine's operators —
  *
  *   quality gate → exact dedup (fingerprint) → near-dup collapse
  *   (MinHash LSH pairs → connected components → survivor selection) →
  *   benchmark decontamination → sliding-window chunking
  *
  * Every stage is one of the verified operators; this job only sequences
  * them and accounts for rows dropped at each gate. Scale shape: stages
  * 1-2 are map + one narrow shuffle; stage 3 is the LSH pipeline (narrow
  * band shuffles, capped buckets) + component labeling; stage 4 is a
  * broadcast-ish shingle join; stage 5 is map-side explode. Nothing
  * collects the corpus to the driver.
  */
object TrainingDataPipeline {

  /** Row accounting per stage — the pipeline's observability contract. */
  case class StageCounts(
      input: Long,
      afterQuality: Long,
      afterExactDedup: Long,
      afterNearDup: Long,
      afterDecontamination: Long,
      chunks: Long)

  /** Run the pipeline; returns (chunked corpus, per-stage counts).
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
    val nNear = nearDeduped.count()

    // 4. benchmark decontamination
    val clean = Dedup.decontaminate(nearDeduped, idCol, textCol,
      bench, textCol, maxOverlap = maxOverlap)
    val nClean = clean.count()

    // 5. sliding-window chunking (map-side explode). Null-text docs are
    // deliberately preserved by decontaminate (explode_outer survival) —
    // coalesce their token array to [""] so posexplode emits one empty
    // chunk instead of silently dropping rows that stage 4 counted
    val toks = coalesce(TextAnalysis.tokens(col(textCol)), array(lit("")))
    val chunked = clean.select(col(idCol),
      posexplode(transform(
        sequence(lit(0), size(toks) - 1, lit(chunkStride)),
        st => concat_ws(" ", slice(toks, st + 1, lit(chunkTokens))))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_text")
    val nChunks = chunked.count()

    (chunked, StageCounts(input, nQuality, nExact, nNear, nClean, nChunks))
  }
}
