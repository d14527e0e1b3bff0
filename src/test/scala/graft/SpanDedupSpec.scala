package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], k: Int = 3) =
    TextAnalysis.dedupSpans(rows.toDF("doc_id", "text"), "doc_id", "text", k)
      .select("doc_id", "clean_text", "n_tokens", "n_dropped")
      .as[(Long, String, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("a cross-doc duplicated span survives only in its first occurrence") {
    val out = run(Seq(
      1L -> "the quick brown fox jumps",
      2L -> "something else entirely here",
      3L -> "prefix the quick brown fox jumps suffix"))
    assert(out(1L) === (("the quick brown fox jumps", 5, 0)))
    assert(out(2L) === (("something else entirely here", 4, 0)))
    // doc 3 loses the 5 duplicated tokens; its unique frame survives
    assert(out(3L) === (("prefix suffix", 7, 5)))
  }

  test("intra-doc repetition keeps the first instance; overlaps merge") {
    val out = run(Seq(1L -> "a b c x a b c y a b c"))
    // spans (a b c) at 0, 4, 8: positions 4-6 and 8-10 cut
    assert(out(1L) === (("a b c x y", 11, 6)))
  }

  test("docs shorter than k pass through; all-duplicate doc empties") {
    val out = run(Seq(
      1L -> "one two",
      2L -> "p q r",
      3L -> "p q r"))
    assert(out(1L) === (("one two", 2, 0)))
    assert(out(2L) === (("p q r", 3, 0)))
    assert(out(3L) === (("", 3, 3)))
  }

  test("first occurrence is the global (doc, pos) minimum") {
    // the span appears late in doc 1 but doc 1 < doc 2: doc 1 keeps it
    val out = run(Seq(
      1L -> "z z z m n o",
      2L -> "m n o tail one two"))
    assert(out(1L) === (("z z z m n o", 6, 0)))
    assert(out(2L)._1 === "tail one two")
  }

  test("decontaminateSpans cuts EVERY instance of an eval k-gram") {
    val eval = Seq(100L -> "the capital of france is paris")
      .toDF("doc_id", "text")
    val train = Seq(
      1L -> "we know the capital of france well",
      2L -> "capital of france is a phrase and capital of france is again",
      3L -> "entirely unrelated text here").toDF("doc_id", "text")
    val out = TextAnalysis.decontaminateSpans(train, "doc_id", "text",
      eval, "text", k = 3)
      .select("doc_id", "clean_text", "n_dropped")
      .as[(Long, String, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // doc 1: "the capital of" + "capital of france" cover positions 2-5
    assert(out(1L) === (("we know well", 4)))
    // doc 2: BOTH instances are cut (no first-occurrence privilege);
    // "capital of france is" covers 0-3 and 7-10
    assert(out(2L) === (("a phrase and again", 8)))
    assert(out(3L) === (("entirely unrelated text here", 0)))
  }

  test("deterministic under repartitioning") {
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", lit("shared lead in phrase"),
        (col("id") % 7).cast("string"),
        lit("common tail span here")).as("text"))
    def go(p: Int) = TextAnalysis
      .dedupSpans(docs.repartition(p), "doc_id", "text", 4)
      .select("doc_id", "clean_text", "n_dropped")
      .as[(Long, String, Int)].collect().toSet
    assert(go(1) === go(11))
  }
}
