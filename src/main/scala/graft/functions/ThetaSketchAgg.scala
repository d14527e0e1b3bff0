package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch (KMV form — Beyer et al. "On synopses for distinct-value
  * estimation under multiset operations"; the Apache DataSketches theta
  * family) — the SET-ALGEBRA member of the engine's mergeable sketch
  * families. HLL answers "how many distinct"; theta additionally answers
  * INTERSECTION and DIFFERENCE cardinalities ("how many urls appear in
  * BOTH crawls", "how many tokens are new this week"), which HLL cannot
  * express (inclusion-exclusion over HLL estimates explodes the error).
  *
  * A sketch is (θ, S): a sampling threshold θ ∈ (0, 1] and the set S of
  * distinct item hashes STRICTLY below θ (hashes as unsigned 64-bit,
  * θ as a hash-space bound; θ = 1 means unbounded). Build keeps the k
  * smallest distinct hashes: past k the bound tightens to the evicted
  * (k+1)-th value. EVERY estimate is the one formula |S| / θ:
  *
  *   - while θ = 1 (≤ k distinct seen) the sketch is EXACT — the a9b/
  *     cm1b provably-exact-regime discipline, which is what the a30
  *     oracle pins cross-engine;
  *   - set ops are hash-set algebra under the tighter bound:
  *     union = (min θ, trim(S_a ∪ S_b)), intersect = (min θ, S_a ∩ S_b),
  *     a-not-b = (min θ, S_a \ S_b) — each yields another sketch, so
  *     expressions compose (estimate(intersect(union(...), sk))).
  *
  * Merge = union, associative and commutative over any partitioning
  * (Agarwal et al., "Mergeable Summaries"): one ≤ k-entry sketch per
  * partition/day crosses the shuffle, and persisted per-span sketches
  * answer cross-span set questions by merging — the 100 TB shape.
  *
  * Hashing is the engine's deterministic FNV-1a64 → splitmix64 chain
  * (the CmCodec discipline): a sketch built today and one built next
  * month index identically.
  *
  * SQL surface: `graft_theta(x, k)` (agg → binary),
  * `graft_theta_merge(sk)` (agg → binary), `graft_theta_estimate(sk)`
  * (scalar → double), `graft_theta_setop(a, b, 'union'|'intersect'|
  * 'difference')` (scalar → binary).
  */
final class ThetaSketch(val k: Int) {
  require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  /** Retained hashes in unsigned order. */
  val set: java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](
      (a: java.lang.Long, b: java.lang.Long) =>
        java.lang.Long.compareUnsigned(a, b))
  /** θ bound on the hash space; meaningful only when [[bounded]]. */
  var thetaHash: Long = -1L
  var bounded: Boolean = false

  def contains(h: Long): Boolean =
    !bounded || java.lang.Long.compareUnsigned(h, thetaHash) < 0

  def addHash(h: Long): Unit = if (contains(h)) {
    set.add(h)
    if (set.size > k) {
      // tighten the bound to the evicted (k+1)-th smallest
      val evicted = set.last()
      set.remove(evicted)
      thetaHash = evicted
      bounded = true
    }
  }

  def add(item: UTF8String): Unit =
    addHash(GraftFunctions.splitmix64(CmCodec.fnv1a64(item)))

  /** Tighten to a foreign bound and re-filter the retained set. */
  def tighten(oBounded: Boolean, oTheta: Long): Unit =
    if (oBounded && (!bounded ||
      java.lang.Long.compareUnsigned(oTheta, thetaHash) < 0)) {
      thetaHash = oTheta
      bounded = true
      val it = set.iterator()
      while (it.hasNext) {
        if (java.lang.Long.compareUnsigned(it.next(), thetaHash) >= 0)
          it.remove()
      }
    }

  def mergeIn(o: ThetaSketch): ThetaSketch = {
    require(o.k == k, s"cannot merge theta sketches of different k: " +
      s"$k vs ${o.k}")
    tighten(o.bounded, o.thetaHash)
    val it = o.set.iterator()
    while (it.hasNext) addHash(it.next())
    this
  }

  /** θ as a double in (0, 1]: |S| / θ is the estimate. */
  def theta: Double =
    if (!bounded) 1.0
    // unsigned 64-bit → [0,1): take the top 53 bits (exact in a double)
    else (thetaHash >>> 11).toDouble / (1L << 53).toDouble

  def estimate: Double = set.size.toDouble / theta
}

object ThetaCodec {
  def serialize(sk: ThetaSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(sk.k)
    out.writeBoolean(sk.bounded)
    out.writeLong(sk.thetaHash)
    out.writeInt(sk.set.size)
    val it = sk.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): ThetaSketch = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val sk = new ThetaSketch(in.readInt())
    sk.bounded = in.readBoolean()
    sk.thetaHash = in.readLong()
    var n = in.readInt()
    while (n > 0) { sk.set.add(in.readLong()); n -= 1 }
    sk
  }

  /** Set operation over two serialized sketches → a new sketch bounded
    * by the tighter θ. Union trims past k; intersect/difference only
    * shrink, so no trim can trigger.
    */
  def setOp(a: Array[Byte], b: Array[Byte], op: String): ThetaSketch = {
    val sa = deserialize(a)
    val sb = deserialize(b)
    op match {
      case "union" => sa.mergeIn(sb)
      case "intersect" | "difference" =>
        val out = new ThetaSketch(sa.k)
        out.tighten(sa.bounded, sa.thetaHash)
        out.tighten(sb.bounded, sb.thetaHash)
        val it = sa.set.iterator()
        while (it.hasNext) {
          val h = it.next()
          val inB = sb.set.contains(h)
          if (out.contains(h) && (if (op == "intersect") inB else !inB))
            out.set.add(h)
        }
        out
      case other => throw new IllegalArgumentException(
        s"graft_theta_setop: unknown op '$other' " +
          "(union | intersect | difference)")
    }
  }
}

/** `graft_theta(x, k)` — build a theta sketch of a string column. */
case class ThetaSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaSketch] with UnaryLike[Expression] {

  require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  override def prettyName: String = "graft_theta"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): ThetaSketch = new ThetaSketch(k)
  override def update(b: ThetaSketch, input: InternalRow): ThetaSketch = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String])
    b
  }
  override def merge(b: ThetaSketch, o: ThetaSketch): ThetaSketch =
    b.mergeIn(o)
  override def eval(b: ThetaSketch): Any = ThetaCodec.serialize(b)
  override def serialize(b: ThetaSketch): Array[Byte] =
    ThetaCodec.serialize(b)
  override def deserialize(bytes: Array[Byte]): ThetaSketch =
    ThetaCodec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** `graft_theta_merge(sk)` — union-merge serialized theta sketches
  * (the rollup aggregate over a sketch column). Null until the first
  * non-null input sketch.
  */
case class ThetaMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[ThetaSketch]]
  with UnaryLike[Expression] {

  override def prettyName: String = "graft_theta_merge"
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Option[ThetaSketch] = None
  override def update(b: Option[ThetaSketch],
      input: InternalRow): Option[ThetaSketch] = {
    val v = child.eval(input)
    if (v == null) b
    else {
      val sk = ThetaCodec.deserialize(v.asInstanceOf[Array[Byte]])
      b match {
        case Some(acc) => Some(acc.mergeIn(sk))
        case None => Some(sk)
      }
    }
  }
  override def merge(b: Option[ThetaSketch],
      o: Option[ThetaSketch]): Option[ThetaSketch] = (b, o) match {
    case (Some(x), Some(y)) => Some(x.mergeIn(y))
    case (Some(x), None) => Some(x)
    case (None, y) => y
  }
  override def eval(b: Option[ThetaSketch]): Any =
    b.map(ThetaCodec.serialize).orNull
  override def serialize(b: Option[ThetaSketch]): Array[Byte] = b match {
    case Some(sk) => ThetaCodec.serialize(sk)
    case None => Array.emptyByteArray
  }
  override def deserialize(bytes: Array[Byte]): Option[ThetaSketch] =
    if (bytes.isEmpty) None else Some(ThetaCodec.deserialize(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): ThetaMergeAgg =
    copy(child = c)
}

/** `graft_theta_estimate(sk)` — |S| / θ; exact while θ = 1. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch, got ${t.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_estimate"
  override def nullSafeEval(bytes: Any): Any =
    ThetaCodec.deserialize(bytes.asInstanceOf[Array[Byte]]).estimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** `graft_theta_setop(a, b, op)` — set algebra over two sketches;
  * `op` must be a foldable string: union | intersect | difference.
  */
case class ThetaSetOp(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != BinaryType || second.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary sketches")
    else if (third.dataType != StringType || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal op string")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_setop"
  override def nullSafeEval(a: Any, b: Any, op: Any): Any =
    ThetaCodec.serialize(ThetaCodec.setOp(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]], op.toString))
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): ThetaSetOp = copy(f, s, t)
}
