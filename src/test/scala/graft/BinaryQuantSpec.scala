package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Binary (sign-bit) quantization, packed Hamming distance, and the
  * recall@k evaluation harness (sim15/sim16).
  */
class BinaryQuantSpec extends SparkTestBase {
  import spark.implicits._

  test("binarySignPack packs sign bits into 32-bit words, LSB first") {
    // dim 4 → one word; bits: v>0 only
    val df = Seq(
      (0L, Array(1.0f, -2.0f, 0.0f, 3.0f)), // bits 0 and 3 → 1 + 8 = 9
      (1L, Array(-1.0f, -1.0f, -1.0f, -1.0f)), // 0
      (2L, Array(0.5f, 0.5f, 0.5f, 0.5f)) // 15
    ).toDF("id", "v")
    val got = df
      .select($"id", Similarity.binarySignPack($"v", 4).as("w"))
      .orderBy("id").as[(Long, Seq[Long])].collect()
    assert(got === Array((0L, Seq(9L)), (1L, Seq(0L)), (2L, Seq(15L))))
  }

  test("binarySignPack spans word boundaries (dim 40 → 2 words)") {
    // only index 35 positive → word0 = 0, word1 bit 3 = 8
    val v = Array.fill(40)(-1.0f); v(35) = 2.0f
    val got = Seq((0L, v)).toDF("id", "v")
      .select(Similarity.binarySignPack($"v", 40))
      .head.getSeq[Long](0)
    assert(got === Seq(0L, 8L))
    // bit 31 lands in word0's top bit as a plain non-negative value
    val v2 = Array.fill(40)(-1.0f); v2(31) = 1.0f
    val got2 = Seq((0L, v2)).toDF("id", "v")
      .select(Similarity.binarySignPack($"v", 40))
      .head.getSeq[Long](0)
    assert(got2 === Seq(1L << 31, 0L))
  }

  test("hammingDist is popcount of xor; null on word-count mismatch") {
    val df = Seq((Seq(9L, 1L), Seq(15L, 0L))).toDF("a", "b")
    // 9^15 = 6 (2 bits), 1^0 = 1 (1 bit) → 3
    assert(df.select(Similarity.hammingDist($"a", $"b"))
      .head.getInt(0) === 3)
    val bad = Seq((Seq(1L), Seq(1L, 2L))).toDF("a", "b")
    assert(bad.select(Similarity.hammingDist($"a", $"b")).head.isNullAt(0))
  }

  test("hammingDist native kernel equals the HOF composition") {
    val df = (0L until 64L).map { i =>
      (i, Seq(i * 0x9E3779B97F4AL & 0xFFFFFFFFL, i * 31L & 0xFFFFFFFFL),
        Seq(i * 0x85EBCA6BL & 0xFFFFFFFFL, (i + 7L) * 131L & 0xFFFFFFFFL))
    }.toDF("id", "a", "b")
    val hof = aggregate(
      zip_with($"a", $"b", (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, d) => acc + d)
    val diff = df
      .where(Similarity.hammingDist($"a", $"b") =!= hof)
      .count()
    assert(diff === 0L)
  }

  test("binaryTopK with full candidates equals bruteForceTopK") {
    // candidates = corpus size → the Hamming prefilter keeps everything
    // and the re-rank IS brute force
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d =>
        math.sin(i * 2.7 + d * 1.3).toFloat))
    }.toDF("vec_id", "embedding")
    val q = emb.where($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val fast = Similarity.binaryTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", dim = 8, k = 5, candidates = 40)
      .orderBy("qid", "rank").collect()
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", 5)
      .orderBy("qid", "rank").collect()
    assert(fast.toSeq === brute.toSeq)
  }

  test("matryoshkaTopK: full prefix + full candidates equals brute force") {
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => math.cos(i * 1.9 + d * 0.7).toFloat))
    }.toDF("vec_id", "embedding")
    val q = emb.where($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val full = Similarity.matryoshkaTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", prefixDim = 8, k = 5, candidates = 40)
      .orderBy("qid", "rank").collect()
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", 5)
      .orderBy("qid", "rank").collect()
    assert(full.toSeq === brute.toSeq)
  }

  test("matryoshkaTopK ranks candidates on the PREFIX cosine only") {
    // corpus vector A: identical prefix to the query, junk tail;
    // B: orthogonal prefix, identical tail. candidates=1 must pick A.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.5f, 0.5f)), // the query
      (1L, Array(1.0f, 0.0f, -0.9f, 0.2f)), // A: same prefix
      (2L, Array(0.0f, 1.0f, 0.5f, 0.5f)) // B: orthogonal prefix, same tail
    ).toDF("vec_id", "embedding")
    val q = emb.where($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val got = Similarity.matryoshkaTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", prefixDim = 2, k = 1, candidates = 1)
      .select("vec_id").as[Long].collect()
    assert(got === Array(1L), "prefix filter must admit A, not B")
  }

  test("recallAtK: exact self-comparison is 1.0; disjoint is 0.0") {
    val truth = Seq((0L, 10L, 1), (0L, 11L, 2), (1L, 20L, 1), (1L, 21L, 2))
      .toDF("qid", "vec_id", "rank")
    val self = Similarity.recallAtK(truth, truth, "qid", "vec_id", 2)
      .orderBy("qid").as[(Long, Long, Double)].collect()
    assert(self === Array((0L, 2L, 1.0), (1L, 2L, 1.0)))
    val disjoint = Seq((0L, 99L, 1), (0L, 98L, 2), (1L, 97L, 1))
      .toDF("qid", "vec_id", "rank")
    val zero = Similarity.recallAtK(disjoint, truth, "qid", "vec_id", 2)
      .orderBy("qid").as[(Long, Long, Double)].collect()
    assert(zero === Array((0L, 0L, 0.0), (1L, 0L, 0.0)))
  }

  test("recallAtK scores a truth query missing from approx as 0") {
    val truth = Seq((0L, 10L, 1), (1L, 20L, 1)).toDF("qid", "vec_id", "rank")
    val approx = Seq((0L, 10L, 1)).toDF("qid", "vec_id", "rank") // qid 1 absent
    val got = Similarity.recallAtK(approx, truth, "qid", "vec_id", 1)
      .orderBy("qid").as[(Long, Long, Double)].collect()
    assert(got === Array((0L, 1L, 1.0), (1L, 0L, 0.0)))
  }

  test("recallAtK ignores rows past rank k on both sides") {
    val truth = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("qid", "vec_id", "rank")
    val approx = Seq((0L, 11L, 1), (0L, 10L, 2), (0L, 13L, 3))
      .toDF("qid", "vec_id", "rank")
    // k=2: truth {10,11}, approx {11,10} → hits 2
    val got = Similarity.recallAtK(approx, truth, "qid", "vec_id", 2)
      .as[(Long, Long, Double)].collect()
    assert(got === Array((0L, 2L, 1.0)))
  }
}
