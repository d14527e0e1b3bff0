package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer over (id, score) pairs, ordered by
  * (score DESC, id ASC) with Spark's double semantics (NaN largest,
  * -0.0 < 0.0 — `java.lang.Double.compare`). Holds at most
  * max(2k, 256) entries between compactions, so memory stays O(k)-ish
  * regardless of input size while compaction amortizes: a small-k
  * buffer (the k=3 knn join) that compacted every k adds spent
  * ~600ns/row in allocation+boxing; the slack capacity plus the
  * in-place O(n·k) selection makes an add ~k compares amortized with
  * ZERO allocation. Merge is union + compact, making it a mergeable
  * summary in the Agarwal et al. sense: partial aggregation keeps
  * ≤ k rows per (group, partition) on the wire instead of every
  * candidate.
  */
object TopKBuffer {
  /** Above this k, [[TopKBuffer.compact]] switches from O(n·k) partial
    * selection (~k compares amortized per add — ideal for the k=3 knn
    * path) to the dual-array quicksort (~log n per add) — the
    * crossover where selection's k² term starts losing.
    */
  val SelectionMaxK = 64
}

final class TopKBuffer(val k: Int) {
  private val cap = math.max(2 * k, 256)
  var ids: Array[Long] = new Array[Long](cap)
  var scores: Array[Double] = new Array[Double](cap)
  var n: Int = 0

  private def lt(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s2, s1) // score DESC
    c < 0 || (c == 0 && i1 < i2) // then id ASC
  }

  /** In-place compaction: the k best (score desc, id asc) land sorted
    * in the first min(n, k) slots; no allocation, no boxing. Content
    * and order are exactly the old index-sort-then-take-k. Small k
    * (≤ 64 — the knn-join regime) uses partial selection: ~k compares
    * amortized per add. Large k would make selection ~k² compares per
    * compaction (k is caller-chosen and unbounded), so it falls back
    * to an in-place dual-array quicksort — O(n log n) compares, still
    * zero boxing.
    */
  def compact(): Unit = {
    val m = math.min(n, k)
    if (k <= TopKBuffer.SelectionMaxK) {
      var j = 0
      while (j < m) {
        var best = j
        var i = j + 1
        while (i < n) {
          if (lt(scores(i), ids(i), scores(best), ids(best))) best = i
          i += 1
        }
        if (best != j) {
          val ts = scores(best); scores(best) = scores(j); scores(j) = ts
          val ti = ids(best); ids(best) = ids(j); ids(j) = ti
        }
        j += 1
      }
    } else if (n > 1) {
      sortRange(0, n - 1)
    }
    n = m
  }

  private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  /** Median-of-three quicksort over the parallel (scores, ids) arrays
    * under the same (score DESC, id ASC) total order — insertion sort
    * below 16 elements. Total order (ids distinct or not, compare is
    * antisymmetric via Double.compare + id tiebreak) ⇒ deterministic
    * result regardless of pivot path.
    */
  private def sortRange(lo0: Int, hi0: Int): Unit = {
    var lo = lo0
    var hi = hi0
    while (lo < hi) {
      if (hi - lo < 16) {
        var i = lo + 1
        while (i <= hi) {
          val s = scores(i); val d = ids(i)
          var j = i - 1
          while (j >= lo && lt(s, d, scores(j), ids(j))) {
            scores(j + 1) = scores(j); ids(j + 1) = ids(j); j -= 1
          }
          scores(j + 1) = s; ids(j + 1) = d
          i += 1
        }
        return
      }
      val mid = lo + (hi - lo) / 2
      if (lt(scores(mid), ids(mid), scores(lo), ids(lo))) swap(lo, mid)
      if (lt(scores(hi), ids(hi), scores(lo), ids(lo))) swap(lo, hi)
      if (lt(scores(hi), ids(hi), scores(mid), ids(mid))) swap(mid, hi)
      val ps = scores(mid); val pd = ids(mid)
      var i = lo
      var j = hi
      while (i <= j) {
        while (lt(scores(i), ids(i), ps, pd)) i += 1
        while (lt(ps, pd, scores(j), ids(j))) j -= 1
        if (i <= j) { swap(i, j); i += 1; j -= 1 }
      }
      // recurse into the smaller side, loop on the larger — O(log n) stack
      if (j - lo < hi - i) { sortRange(lo, j); lo = i }
      else { sortRange(i, hi); hi = j }
    }
  }

  def add(id: Long, score: Double): Unit = {
    if (n == cap) compact()
    ids(n) = id; scores(n) = score; n += 1
  }

  def mergeIn(o: TopKBuffer): TopKBuffer = {
    var j = 0
    while (j < o.n) { add(o.ids(j), o.scores(j)); j += 1 }
    this
  }
}

/** `graft_topk(id, score, k)` — exact bounded top-k as a mergeable
  * [[TypedImperativeAggregate]]: the aggregation-shaped replacement for
  * `row_number() OVER (ORDER BY score DESC, id) <= k`. The window form
  * shuffles EVERY candidate row to its group's partition and sorts
  * there; this form partial-aggregates map-side, so the shuffle carries
  * at most k (id, score) pairs per (group, partition) — the correct
  * 100 TB shape for the k-NN join's final phase. Result is
  * array<struct<id, score>> in (score DESC, id ASC) order — identical
  * content and order to the window's rank ≤ k rows over the same input
  * (null ids/scores are skipped: a null-similarity candidate is not a
  * neighbor).
  */
case class TopKPairs(idExpr: Expression, scoreExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def left: Expression = idExpr
  override def right: Expression = scoreExpr
  override def prettyName: String = "graft_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (idExpr.dataType, scoreExpr.dataType) match {
      case (LongType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk needs (bigint id, double score), got $other")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = idExpr.eval(input)
    val s = scoreExpr.eval(input)
    if (id != null && s != null)
      b.add(id.asInstanceOf[Long], s.asInstanceOf[Double])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = b.mergeIn(o)

  override def eval(b: TopKBuffer): Any = {
    b.compact()
    new GenericArrayData(Array.tabulate(b.n)(i =>
      InternalRow(b.ids(i), b.scores(i))))
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    b.compact() // ship at most k pairs
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.n)
    var i = 0
    while (i < b.n) {
      out.writeLong(b.ids(i)); out.writeDouble(b.scores(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { b.add(in.readLong(), in.readDouble()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): TopKPairs = copy(idExpr = l, scoreExpr = r)
}
