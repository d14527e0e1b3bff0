package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class KnnJoinSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic synthetic embeddings: 3 well-separated direction
  // clusters in 8-d so nearest neighbors are unambiguous
  private lazy val emb = {
    val rows = (0 until 90).map { i =>
      val c = i % 3
      val v = Array.tabulate(8) { d =>
        val base = if (d == c) 10.0f else 0.0f
        base + ((i * 31 + d * 7) % 5) * 0.1f
      }
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  private def queriesOf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id").as("qid"), col("embedding").as("qv"))

  test("exact configuration equals brute force for every query") {
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queriesOf(emb), "qid", "qv", 4)
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    val knn = Similarity.knnJoin(emb, "vec_id", "embedding",
      queriesOf(emb), "qid", "qv", k = 4, nlist = 5, nprobe = 5)
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    assert(knn === brute)
    assert(knn.size === 90 * 4)
  }

  test("salting changes nothing (every pair still met exactly once)") {
    def run(salt: Int) = Similarity.knnJoin(emb, "vec_id", "embedding",
      queriesOf(emb), "qid", "qv", k = 3, nlist = 4, nprobe = 4,
      saltFactor = salt)
      .select("qid", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(run(1) === run(3))
  }

  test("partial probing returns a subset ranked consistently") {
    val partial = Similarity.knnJoin(emb, "vec_id", "embedding",
      queriesOf(emb), "qid", "qv", k = 3, nlist = 6, nprobe = 2)
    val rows = partial.select("qid", "rank").as[(Long, Int)].collect()
    // ranks are 1..n contiguous per query, never exceeding k
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted === (1 to rs.length))
      assert(rs.length <= 3)
    }
    // in-cluster neighbors dominate: rank-1 neighbor shares the cluster
    val top1 = partial.where(col("rank") === 1)
      .select("qid", "vec_id").as[(Long, Long)].collect()
    val sameCluster = top1.count { case (q, c) => q % 3 == c % 3 }
    assert(sameCluster.toDouble / top1.length > 0.9)
  }
}
