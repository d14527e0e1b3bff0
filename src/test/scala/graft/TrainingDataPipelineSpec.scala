package graft

import org.apache.spark.sql.functions._

import graft.jobs.TrainingDataPipeline

/** The end-to-end training-data pipeline over a corpus with planted
  * defects: junk docs, exact dups, near-dups, benchmark contamination.
  * Asserts each stage drops exactly the planted rows.
  */
class TrainingDataPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val goodText =
    "the quick brown fox jumps over the lazy dog and the cat is a friend " +
      "of the dog in a long and reasonable document about animals and things"

  test("pipeline drops junk, dups, near-dups, contamination; chunks rest") {
    val docs = Seq(
      (1L, goodText),
      (2L, goodText + " with a small tail difference here"), // near-dup of 1
      (3L, "completely different content about spark engines and the " +
        "catalyst optimizer which is a fine piece of the engineering of " +
        "query plans and the execution of distributed work"),
      (4L, goodText),                       // exact dup of 1
      (5L, "!!!! ???? ;;;; ::::"),          // junk (quality gate)
      (6L, "the quiz copy says what is the capital of france the answer " +
        "is paris the city of light")  // contaminated: benchmark verbatim
    ).toDF("doc_id", "text")
    val bench = Seq(
      "what is the capital of france the answer is paris the city of light"
    ).toDF("text")

    val (chunks, counts) = TrainingDataPipeline.run(docs, bench,
      minQuality = 0.3, jaccardThreshold = 0.6, maxOverlap = 0.4)

    assert(counts.input === 6)
    assert(counts.afterQuality === 5)          // junk 5 dropped
    assert(counts.afterExactDedup === 4)       // exact dup 4 collapsed
    assert(counts.afterNearDup === 3)          // near-dup 2 collapsed into 1
    assert(counts.spanTokensDropped === 0)     // no repeated 8-grams left
    assert(counts.afterDecontamination === 2)  // contaminated 6 dropped
    assert(counts.decontamSpanTokensDropped === 0) // no residual leakage
    val kept = chunks.select("doc_id").distinct()
      .as[Long].collect().sorted
    assert(kept === Array(1L, 3L))             // min-id survivors only
    assert(counts.chunks === chunks.count())
    // chunk windows start every `stride` tokens: floor((n-1)/10)+1 per doc
    val wantChunks = docs.where($"doc_id".isin(1L, 3L))
      .select(graft.operators.TextAnalysis.tokenCount($"text"))
      .as[Int].collect().map(n => (n - 1) / 10 + 1).sum
    assert(counts.chunks === wantChunks)
  }

  test("span stages cut repeated passages and residual eval leakage " +
      "while keeping the documents") {
    // docs 1/2 share a verbatim 6-token passage (below the near-dup
    // jaccard bar, so only the SPAN stage can catch it); doc 3 quotes
    // a 5-token eval phrase inside otherwise-clean text (below the
    // whole-doc overlap bar, so only the surgical stage catches it)
    val boiler = "subscribe to our newsletter for more updates"
    val docs = Seq(
      (1L, s"alpha beta gamma delta eps zeta $boiler"),
      (2L, s"$boiler totally different body about query engines and " +
        "their optimizers in long form"),
      (3L, "a fine document that quotes the capital of france is paris " +
        "once among thirty other perfectly ordinary tokens of its own " +
        "devising here")
    ).toDF("doc_id", "text")
    val bench = Seq(
      "what is the capital of france is paris the answer"
    ).toDF("text")

    val (chunks, counts) = TrainingDataPipeline.run(docs, bench,
      minQuality = 0.0, jaccardThreshold = 0.9, maxOverlap = 0.9,
      spanDedupK = 7, decontamSpanK = 5)

    assert(counts.afterNearDup === 3, "nothing collapses whole-doc")
    assert(counts.spanTokensDropped === 7,
      "doc 2 loses its 7-token boilerplate (doc 1 keeps the original)")
    assert(counts.afterDecontamination === 3, "no whole-doc drop")
    assert(counts.decontamSpanTokensDropped === 6,
      "doc 3 loses the 6 tokens covered by eval 5-grams")
    val texts = chunks.groupBy("doc_id")
      .agg(concat_ws(" ", collect_list("chunk_text")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(!texts(2L).contains("subscribe"))
    assert(texts(1L).contains("subscribe to our newsletter"))
    assert(!texts(3L).contains("capital of france"))
    // without a target, selection is a pass-through and the split
    // accounting covers every surviving doc
    assert(counts.afterSelection === 3)
    assert(counts.splitCounts.values.sum === 3)
  }

  test("opt-in rule gates: C4 rewrites pages to surviving lines and " +
      "drops thin pages; Gopher shape rules drop short documents") {
    // 12-token sentences with sentence-unique vocabulary (no repeated
    // 8-gram can exist, so the span stage stays out of the accounting)
    def sentence(i: Int): String =
      s"the s${i}ax s${i}bx s${i}cx s${i}dx s${i}ex s${i}fx s${i}gx " +
        s"s${i}hx s${i}ix of s$i." // mean word length 3.75, inside [3, 10]
    val body1 = (1 to 5).map(sentence).mkString("\n")   // 60 words, clean
    val body4 = (6 to 10).map(sentence).mkString("\n")
    val docs = Seq(
      (1L, body1),
      (2L, "only two sentences here.\nanother short one here."), // < 5
      (3L, (1 to 5).map(i => s"t${i}x t${i}y t${i}z.").mkString("\n")),
      // 5 sentences but 15 words — C4 keeps it, Gopher's 50-word floor
      // drops it
      (4L, body4 + "\nplease enable javascript to view this.")
    ).toDF("doc_id", "text")
    val bench = Seq("benchmark phrase that matches nothing").toDF("text")

    val (chunks, counts) = TrainingDataPipeline.run(docs, bench,
      c4Clean = true, gopherRules = true, minQuality = 0.0,
      jaccardThreshold = 0.9, maxOverlap = 0.9)

    assert(counts.input === 4)
    assert(counts.afterRuleGates === 2) // 2 too thin for C4, 3 for Gopher
    assert(counts.afterQuality === 2 && counts.afterNearDup === 2)
    assert(counts.spanTokensDropped === 0)
    val kept = chunks.select("doc_id").distinct().as[Long].collect().toSet
    assert(kept === Set(1L, 4L))
    // the javascript line was cut by the C4 REWRITE, not a page drop
    val t4 = chunks.where($"doc_id" === 4L)
      .agg(concat_ws(" ", collect_list("chunk_text"))).as[String].head
    assert(!t4.toLowerCase.contains("javascript"))
    assert(t4.contains("s6ax"))
  }

  test("DSIR selection keeps the most target-like docs and the split " +
      "keeps gray-zone near-dups together") {
    val sci = "journal article about the science of proteins and cells " +
      "with methods results and a discussion of the findings in detail"
    val docs = Seq(
      (1L, sci + " first"),
      // gray-zone near-dup of 1: far above the split jaccard, below
      // the dedup bar — must survive dedup AND share 1's split
      (2L, sci + " second version with a couple more tokens appended " +
        "to stay under the dedup threshold"),
      // off-target docs use vocabulary DISJOINT from the target (their
      // feature buckets have target count 0, so their ln-ratio weight
      // is strongly negative; shared function words would wash it out)
      (3L, "zzz qqq www eee rrr ttt uuu iii ooo ppp aaa sss ddd fff " +
        "ggg hhh jjj kkk lll xxx"),
      (4L, "journal article on the science of proteins and cells with " +
        "methods results discussion findings worth reading in detail"),
      (5L, "vvv bbb nnn mmm zz1 qq2 ww3 ee4 rr5 tt6 uu7 ii8 oo9 pp0 " +
        "aa1 ss2 dd3 ff4 gg5 hh6")
    ).toDF("doc_id", "text")
    val bench = Seq("benchmark phrase that matches nothing").toDF("text")
    val target = Seq((0L,
      "the science of proteins and cells with methods results and a " +
        "discussion of the findings journal article")).toDF("tid", "text")

    val (chunks, counts) = TrainingDataPipeline.run(docs, bench,
      minQuality = 0.0, jaccardThreshold = 0.9, maxOverlap = 0.9,
      target = Some(target), selectK = 3, selectTemperature = 1e-9,
      splits = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125),
      splitJaccard = 0.3)

    assert(counts.afterNearDup === 5, "gray-zone pair survives dedup")
    assert(counts.afterSelection === 3)
    val kept = chunks.select("doc_id").distinct().as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(2L) && kept.contains(4L),
      "the three science docs out-weigh the spam under the target model")
    assert(counts.splitCounts.values.sum === 3)
    // docs 1 and 2 are one gray-zone cluster: identical split
    val sp = chunks.select("doc_id", "split").distinct()
      .as[(Long, String)].collect().toMap
    assert(sp(1L) === sp(2L), "gray-zone near-dups must not straddle")
  }
}
