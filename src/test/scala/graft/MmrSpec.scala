package graft

import graft.operators.Similarity

/** MMR-diversified retrieval (sim14). */
class MmrSpec extends SparkTestBase {
  import spark.implicits._

  // q points along x; c1 = same direction, c2 = 10deg off (near-dup of
  // c1), c3 = 60deg off (diverse)
  private def deg(d: Double) = math.toRadians(d)
  private lazy val corpus = Seq(
    (1L, Array(1.0f, 0.0f)),
    (2L, Array(math.cos(deg(10)).toFloat, math.sin(deg(10)).toFloat)),
    (3L, Array(math.cos(deg(60)).toFloat, math.sin(deg(60)).toFloat)))
    .toDF("vec_id", "embedding")
  private lazy val queries = Seq((0L, Array(1.0f, 0.0f)))
    .toDF("qid", "qv")

  test("lambda = 1 reduces to pure relevance order") {
    val out = Similarity.mmrTopK(corpus, "vec_id", "embedding",
      queries, "qid", "qv", k = 3, poolSize = 3, lambda = 1.0)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(out.toSeq === Seq(1L, 2L, 3L))
  }

  test("low lambda promotes the diverse candidate over the near-dup") {
    val out = Similarity.mmrTopK(corpus, "vec_id", "embedding",
      queries, "qid", "qv", k = 3, poolSize = 3, lambda = 0.25)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(out.toSeq === Seq(1L, 3L, 2L),
      "after picking c1, the 60-degree candidate must beat the near-dup")
  }

  test("round-1 score is lambda * rel; later scores subtract the penalty") {
    val rows = Similarity.mmrTopK(corpus, "vec_id", "embedding",
      queries, "qid", "qv", k = 2, poolSize = 3, lambda = 0.25)
      .orderBy("rank").select("vec_id", "mmr").as[(Long, Double)].collect()
    // rel(c1) = cos(0) = 1 exactly
    assert(rows(0) === ((1L, 0.25 * 1.0)))
    val rel3 = math.cos(deg(60))
    val sim31 = math.cos(deg(60))
    val expected2 = 0.25 * rel3 - 0.75 * sim31
    assert(rows(1)._1 === 3L)
    // float32 vector storage bounds the drift vs the double closed form
    assert(math.abs(rows(1)._2 - expected2) < 1e-5)
  }

  test("poolSize caps the pool by relevance before the rerank") {
    // pool of 2 excludes c3 entirely, even though it would win round 2
    val out = Similarity.mmrTopK(corpus, "vec_id", "embedding",
      queries, "qid", "qv", k = 2, poolSize = 2, lambda = 0.25)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(out.toSeq === Seq(1L, 2L))
  }

  test("a query with fewer candidates than k emits what it has") {
    val tiny = Seq((7L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.mmrTopK(tiny, "vec_id", "embedding",
      queries, "qid", "qv", k = 5, poolSize = 5, lambda = 0.5)
    assert(out.count() === 1L)
  }

  test("multiple queries rerank independently; layout independent") {
    val emb = spark.range(60).selectExpr("id AS vec_id",
      """array(cast(cos(id * 0.21) as float),
        |      cast(sin(id * 0.21) as float)) AS embedding""".stripMargin)
    val qs = spark.range(4).selectExpr("id * 100 AS qid",
      """array(cast(cos(id * 1.3) as float),
        |      cast(sin(id * 1.3) as float)) AS qv""".stripMargin)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.mmrTopK(c, "vec_id", "embedding", qs, "qid", "qv",
        k = 4, poolSize = 8, lambda = 0.5).orderBy("qid", "rank").collect()
    val a = run(emb)
    assert(a.length === 16)
    assert(a === run(emb.repartition(7)))
  }
}
