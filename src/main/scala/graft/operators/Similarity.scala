package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline; the LSH-bucketed
  * variant is the 100 TB path (candidates from sign-hyperplane buckets,
  * exact re-rank inside buckets only).
  *
  * All arithmetic is double-precision sequential fold in index order —
  * deterministic and bit-identical to a C++ `for` loop over the same
  * values (DuckDB parity: `dot/(sqrt(na)*sqrt(nb))`).
  */
object Similarity {

  /** float[] → double[] (exact widening). */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity, DuckDB-formula-exact: dot/(sqrt(na)*sqrt(nb)).
    * Native expression ([[graft.functions.GraftFunctions.CosineSim]]) —
    * one primitive loop per row; accepts float or double arrays.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine(a, b)

  /** Exact top-k neighbors for each query row, brute force.
    * `queries` must be small (it is broadcast); cost is |queries|×|corpus|
    * map work + one per-query top-k — the correct baseline and the
    * fallback when recall must be 1.0.
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val joined = corpus.join(broadcast(queries))
      .withColumn("sim", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(desc("sim"), col(corpusId))
    joined
      .where(col(queryId) =!= col(corpusId)) // skip self-match
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("sim"), col("rank"))
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Sign-LSH bucket id: `bits` hyperplanes with deterministic ±1
    * (Rademacher) components; bit j = sign of ⟨v, h_j⟩. Same-bucket
    * vectors are likely cosine-close.
    */
  def lshBucket(vec: Column, dim: Int, bits: Int): Column = {
    val planes = (0 until bits).map { j =>
      (0 until dim).map(i =>
        if (splitmix64(j.toLong * dim + i) < 0) -1.0 else 1.0)
    }
    val bitCols = planes.zipWithIndex.map { case (h, j) =>
      val proj = dot(vec, array(h.map(lit): _*))
      when(proj >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    // A vector whose length != dim would silently null out the zip_with
    // dot and zero every signature bit — fail loudly instead of bucketing
    // every misconfigured vector together.
    when(size(vec) === dim, bitCols.reduce((a, b) => a.bitwiseOR(b)))
      .otherwise(raise_error(concat(
        lit(s"graft lshBucket: expected dim $dim, got "),
        size(vec).cast("string"))))
  }

  /** Approximate top-k: candidates share the query's LSH bucket, exact
    * cosine re-rank inside. At scale: one shuffle on bucket id; recall
    * tuned by `bits` (fewer bits → bigger buckets → higher recall+cost).
    * Multi-probe (flipping one bit) would raise recall further.
    */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, dim: Int, bits: Int = 8, probes: Int = 1): DataFrame = {
    require(probes >= 1 && probes <= bits + 1)
    val c = corpus.withColumn("__bucket",
      lshBucket(asDouble(col(corpusVec)), dim, bits))
    // Multi-probe: each query also probes the `probes - 1` buckets that
    // differ in exactly one signature bit — near-boundary neighbors land
    // there. Recall rises without touching the corpus-side layout.
    val q0 = queries.withColumn("__q_bucket",
      lshBucket(asDouble(col(queryVec)), dim, bits))
    val q = q0.withColumn("__bucket", explode(array(
      (col("__q_bucket") +: (0 until probes - 1).map(b =>
        col("__q_bucket").bitwiseXOR(lit(1L << b)))): _*)))
      .drop("__q_bucket")
    val joined = c.join(broadcast(q), "__bucket")
      .where(col(queryId) =!= col(corpusId))
      .withColumn("sim", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(desc("sim"), col(corpusId))
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("sim"), col("rank"))
  }

  /** Blocked near-duplicate pairs: within `blockCol` groups (e.g. a
    * cluster/label/LSH-bucket column), all pairs with cosine ≥ threshold.
    */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double,
      saltFactor: Int = 8): DataFrame = {
    // Low-cardinality blocks (10 labels) would cap the join at 10 tasks;
    // salting the left side and replicating the right saltFactor-ways
    // raises parallelism to blocks x saltFactor while emitting every pair
    // exactly once.
    val a = emb.select(col(blockCol), col(idCol), col(vecCol))
      .withColumn("__salt", pmod(xxhash64(col(idCol)), lit(saltFactor)).cast("int"))
    val b = emb.select(col(blockCol), col(idCol).as(idCol + "_2"),
      col(vecCol).as(vecCol + "_2"))
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    a.join(b, Seq(blockCol, "__salt"))
      .where(col(idCol) < col(idCol + "_2"))
      .withColumn("sim", cosine(col(vecCol), col(vecCol + "_2")))
      .where(col("sim") >= threshold)
      .select(col(idCol), col(idCol + "_2"), col("sim"))
  }
}
