package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Hashing-trick vectorizer: the native kernel must reproduce Spark's
  * own md5/conv chain bucket-for-bucket (the cross-engine convention the
  * oracle re-derives), preserve total token count, and handle the
  * empty/null/whitespace edge cases.
  */
class FeatureHashSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 64

  test("kernel buckets equal Spark's conv(substr(md5,1,15),16,10) mod k") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "to be or not to be that is the question"),
      (3L, "naïve café über straße 日本語 emoji 🙂 mix"),
      (4L, "a a a b b c"))
      .toDF("doc_id", "text")
    val native = docs
      .select(col("doc_id"), posexplode(GraftFunctions.featureHash(col("text"), k)))
      .where(col("col") > 0)
      .select(col("doc_id"), col("pos").as("bucket"), col("col").as("n"))
    // reference: Spark built-ins only, same tokenizer + md5-60 chain
    val ref = docs
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") % k)
          .cast("int").as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).cast("int").as("n"))
    assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty,
      "native kernel and built-in md5 chain must agree exactly")
  }

  test("counts sum to the token count; repeats land in one bucket") {
    val out = Seq((1L, "x y x  x\tz")).toDF("doc_id", "text")
      .select(GraftFunctions.featureHash(col("text"), k).as("v"))
      .collect().head.getAs[scala.collection.Seq[Int]]("v")
    assert(out.length === k)
    assert(out.sum === 5, "5 tokens across any whitespace")
    assert(out.max === 3, "the three 'x' occurrences share one bucket")
  }

  test("empty and blank text vectorize to all zeros; null stays null") {
    val rows = Seq((1L, ""), (2L, "   \t "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select(col("doc_id"), GraftFunctions.featureHash(col("text"), k).as("v"))
      .orderBy("doc_id").collect()
    assert(rows(0).getAs[scala.collection.Seq[Int]]("v").forall(_ == 0))
    assert(rows(1).getAs[scala.collection.Seq[Int]]("v").forall(_ == 0))
    assert(rows(2).isNullAt(1))
  }

  test("kernel survives codegen and interpreted paths identically") {
    val df = Seq.tabulate(50)(i => (i.toLong, s"tok$i shared t${i % 7}"))
      .toDF("doc_id", "text")
    val a = df.select(sum(element_at(
      GraftFunctions.featureHash(col("text"), 8), 1))).collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val b = df.select(sum(element_at(
        GraftFunctions.featureHash(col("text"), 8), 1))).collect()
      assert(a.toSeq === b.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
