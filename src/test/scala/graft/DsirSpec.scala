package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  test("weights match the closed form on a hand corpus") {
    // raw corpus: 2 docs; target: 1 doc sharing doc 1's vocabulary.
    // B = 4 buckets is tiny, so compute the expectation generically
    // from the same md5-bucket assignment the operator uses.
    val raw = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("doc_id", "text")
    val target = Seq((0L, "aa bb")).toDF("tid", "text")
    val b = 4
    def bucketsOf(text: String): Seq[Long] = {
      val tk = text.split("\\s+").toSeq
      val grams = tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      grams.map { g =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(md5.take(15), 16) % b
      }
    }
    val rawCounts = (bucketsOf("aa bb") ++ bucketsOf("cc dd"))
      .groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val tgtCounts = bucketsOf("aa bb")
      .groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val totR = rawCounts.values.sum
    val totT = tgtCounts.values.sum
    def lam(bk: Long): Double =
      math.log((tgtCounts.getOrElse(bk, 0.0) + 1.0) / (totT + b)) -
        math.log((rawCounts(bk) + 1.0) / (totR + b))
    def expected(text: String): Double =
      bucketsOf(text).map(lam).sum
    val out = Sampling.dsirWeights(raw, "doc_id", "text", target, "text",
      buckets = b).select("doc_id", "weight", "n_grams")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(math.abs(out(1L)._1 - expected("aa bb")) < 1e-9)
    assert(math.abs(out(2L)._1 - expected("cc dd")) < 1e-9)
    assert(out(1L)._2 === 3L, "2 unigrams + 1 bigram")
    assert(out(1L)._1 > out(2L)._1,
      "the target-identical doc outweighs the disjoint one")
  }

  test("target-like docs rank above off-target docs") {
    val raw = spark.range(200).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0,
        concat_ws(" ", lit("science journal article"),
          (col("id") % 7).cast("string")))
        .otherwise(concat_ws(" ", lit("spam click buy now"),
          (col("id") % 7).cast("string"))).as("text"))
    val target = Seq.tabulate(20)(i => (i.toLong, s"science article $i"))
      .toDF("tid", "text")
    val w = Sampling.dsirWeights(raw, "doc_id", "text", target, "text",
      buckets = 512)
      .select("doc_id", "weight").as[(Long, Double)].collect()
    val (sci, spam) = w.partition(_._1 % 2 == 0)
    assert(sci.map(_._2).min > spam.map(_._2).max,
      "every science doc outweighs every spam doc")
  }

  test("single-token and empty docs: bigram guard and feature drop") {
    val raw = Seq((1L, "solo"), (2L, ""), (3L, "  ")).toDF("doc_id", "text")
    val target = Seq((0L, "solo")).toDF("tid", "text")
    val out = Sampling.dsirWeights(raw, "doc_id", "text", target, "text",
      buckets = 16).select("doc_id", "n_grams")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L), "no-token docs have no features")
  }

  test("resample selects k, near-zero temperature degenerates to top-k") {
    val raw = spark.range(100).select(col("id").as("doc_id"),
      when(col("id") < 10, "science article text")
        .otherwise(concat_ws(" ", lit("noise words"),
          (col("id") % 31).cast("string"))).as("text"))
    val target = Seq((0L, "science article text")).toDF("tid", "text")
    val sel = Sampling.dsirResample(raw, "doc_id", "text", target, "text",
      k = 10, temperature = 1e-9, seed = 3L, buckets = 64)
      .select("doc_id", "rank").as[(Long, Int)].collect()
    assert(sel.length === 10)
    assert(sel.map(_._2).sorted.toSeq === (1 to 10),
      "ranks are 1..k")
    assert(sel.map(_._1).forall(_ < 10),
      "tau -> 0 picks exactly the highest-weight (target-like) docs")
  }

  test("resample is deterministic and seed-sensitive") {
    val raw = spark.range(150).select(col("id").as("doc_id"),
      concat_ws(" ", lit("mix of words"),
        (col("id") % 13).cast("string")).as("text"))
    val target = Seq((0L, "mix of words 3")).toDF("tid", "text")
    def run(p: Int, seed: Long) = Sampling.dsirResample(
      raw.repartition(p), "doc_id", "text", target, "text",
      k = 25, temperature = 1.0, seed = seed, buckets = 128)
      .select("doc_id", "key", "rank")
      .as[(Long, Double, Int)].collect().toSet
    assert(run(1, 5L) === run(11, 5L), "partitioning-independent")
    assert(run(4, 5L) !== run(4, 6L), "different seed, different draw")
  }
}
