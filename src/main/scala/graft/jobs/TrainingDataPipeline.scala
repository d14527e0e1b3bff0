package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, TextAnalysis}

/** End-to-end LLM training-data pipeline: the composition a 100 TB corpus
  * actually runs, built entirely from this engine's operators —
  *
  *   rule gates (C4 line cleaning + Gopher shape rules, opt-in for
  *   punctuated corpora) → quality gate → exact dedup (fingerprint) →
  *   near-dup collapse
  *   (MinHash LSH pairs → connected components → survivor selection) →
  *   duplicated-span removal (ExactSubstr) → benchmark decontamination
  *   (whole-doc gate, then span-surgical cuts) → DSIR target selection
  *   (optional) → leakage-safe split (gray-zone near-dup clusters stay
  *   in ONE split) → sliding-window chunking
  *
  * Every stage is one of the verified operators; this job only sequences
  * them and accounts for rows (and, for the span stages, tokens) dropped
  * at each gate. Scale shape: stages 1-2 are map + one narrow shuffle;
  * stage 3 is the LSH pipeline (narrow band shuffles, capped buckets) +
  * component labeling; the span stages shuffle shingles and rebuild with
  * one groupBy(doc); decontamination is a broadcast-ish shingle join;
  * DSIR is two narrow count shuffles + a broadcast λ join + a bounded
  * global top-k; the split re-runs LSH at the LOWER gray-zone threshold
  * and labels components; chunking is map-side explode. Nothing collects
  * the corpus to the driver.
  */
object TrainingDataPipeline {

  /** Row/token accounting per stage — the pipeline's observability
    * contract. Doc counts for the doc-dropping stages; token counts for
    * the span stages (they keep docs and cut text); per-split doc
    * counts for the split stage.
    */
  case class StageCounts(
      input: Long,
      afterRuleGates: Long,
      afterQuality: Long,
      afterExactDedup: Long,
      afterNearDup: Long,
      spanTokensDropped: Long,
      afterDecontamination: Long,
      decontamSpanTokensDropped: Long,
      afterSelection: Long,
      splitCounts: Map[String, Long],
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
      c4Clean: Boolean = false,
      gopherRules: Boolean = false,
      minQuality: Double = 0.3,
      jaccardThreshold: Double = 0.8,
      maxOverlap: Double = 0.5,
      spanDedupK: Int = 8,
      decontamSpanK: Int = 8,
      target: Option[DataFrame] = None,
      selectK: Int = 1 << 20,
      selectTemperature: Double = 1.0,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      splitJaccard: Double = 0.5,
      chunkTokens: Int = 20,
      chunkStride: Int = 10): (DataFrame, StageCounts) = {

    val input = docs.count()

    // 0. rule-based gates (both map-only, both opt-in — they assume
    // punctuated, line-structured text, which not every corpus has):
    // C4 line cleaning REWRITES the text to its surviving lines and
    // drops pages failing the sentence/flag rules; the Gopher battery
    // then drops documents failing the shape rules on the CLEANED text.
    val c4ed = if (c4Clean) {
      val c = graft.functions.GraftFunctions
        .c4Stats(coalesce(col(textCol), lit("")))
      docs.withColumn("__c4", c)
        .where(col("__c4.keep"))
        .withColumn(textCol, col("__c4.clean_text"))
        .drop("__c4")
    } else docs
    val ruleGated = if (gopherRules)
      c4ed.where(graft.functions.GraftFunctions
        .gopherQuality(coalesce(col(textCol), lit(""))).getField("keep"))
    else c4ed
    val nRuleGated =
      if (c4Clean || gopherRules) ruleGated.count() else input

    // 1. quality gate (map-only)
    val quality = ruleGated
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

    // 6. DSIR selection toward the target distribution (optional):
    // keep the selectK most target-like docs (deterministic Gumbel
    // top-k over hashed-ngram importance weights)
    val selected = target match {
      case Some(tgt) =>
        // bound k by the doc count entering selection: the top-k
        // buffer holds 2k entries, and k past the corpus size buys
        // nothing but allocation
        val k = math.min(selectK.toLong, nClean).toInt
        val picks = Sampling.dsirResample(surgical, idCol, textCol,
          tgt, textCol, k = k, temperature = selectTemperature)
          .select(col(idCol))
        surgical.join(picks, idCol)
      case None => surgical
    }
    val nSelected = selected.count()

    // 7. leakage-safe split: FRESH near-dup pairs at a LOWER threshold
    // than the dedup bar — the gray zone (splitJaccard..jaccard) that
    // deliberately survived dedup must still never straddle train/test
    val grayPairs = Dedup.minhashPairs(selected, idCol, textCol,
      threshold = splitJaccard, maxBucketSize = 1024)
      .select(col(idCol), col(idCol + "_2"))
    val assigned = Sampling.leakageSafeSplit(selected, idCol, grayPairs,
      idCol + "_2", splits)
      .drop("component")
    val splitCounts = assigned.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // 8. sliding-window chunking (map-side explode); empty docs emit
    // one empty chunk so every surviving doc stays accounted. The
    // split label rides through to the chunk table.
    val toks = coalesce(TextAnalysis.tokens(col(textCol)), array(lit("")))
    val chunked = assigned.select(col(idCol), col("split"),
      posexplode(transform(
        sequence(lit(0), size(toks) - 1, lit(chunkStride)),
        st => concat_ws(" ", slice(toks, st + 1, lit(chunkTokens))))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_text")
    val nChunks = chunked.count()

    (chunked, StageCounts(input, nRuleGated, nQuality, nExact, nNear,
      spanDropped,
      nClean, surgicalDropped, nSelected, splitCounts, nChunks))
  }
}
