package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications") — the POINT-QUERY
  * member of the engine's mergeable sketch trio (HLL: distinct counts;
  * Misra-Gries: WHICH items are frequent; Count-Min: how often is THIS
  * item, for any item, in O(depth) time from O(depth×width) space).
  *
  * `depth` rows × `width` counters; each row has an independent hash;
  * add() increments one counter per row; estimate(x) = min over rows.
  * Estimates NEVER undercount; the overcount is ≤ 2n/width with
  * probability ≥ 1 − 2^−depth. Merge = cell-wise addition — summaries
  * from any partitioning combine associatively (Agarwal et al.,
  * "Mergeable Summaries"), which is what makes this the 100 TB shape:
  * one small sketch per partition/hour crosses the shuffle, never
  * per-item state, and a persisted sketch-per-day table answers
  * "how often did THIS url/token appear in any span" by merging.
  *
  * Hashing is self-contained and deterministic (FNV-1a 64 over the
  * UTF-8 bytes, then one splitmix64 per row with odd row salts):
  * a sketch built today, persisted, and merged next month indexes
  * identically. With a fixed small key domain the estimate is provably
  * exact as soon as no key pair collides in EVERY row — checkable once
  * per domain, independent of data volume (the cm1b oracle regime,
  * same trick as hh1's full-capacity Misra-Gries).
  *
  * Three functions mirror the quantile-sketch surface:
  * `graft_countmin(x, depth, width)` (agg → binary),
  * `graft_cm_merge(sk)` (agg → binary),
  * `graft_cm_estimate(sk, x)` (scalar → bigint).
  */
final class CmSketch(val depth: Int, val width: Int) {
  require(depth >= 1 && width >= 1 && depth.toLong * width <= (1L << 28),
    s"CmSketch needs 1 <= depth*width <= 2^28 cells, got " +
      s"depth=$depth width=$width (${depth.toLong * width} cells)")
  val table: Array[Long] = new Array[Long](depth * width)
  var n: Long = 0L

  def add(item: UTF8String): Unit = {
    val base = CmCodec.fnv1a64(item)
    var d = 0
    while (d < depth) {
      table(d * width + CmCodec.cell(base, d, width)) += 1L
      d += 1
    }
    n += 1L
  }

  def estimate(item: UTF8String): Long = {
    val base = CmCodec.fnv1a64(item)
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = table(d * width + CmCodec.cell(base, d, width))
      if (c < best) best = c
      d += 1
    }
    best
  }

  def mergeIn(o: CmSketch): CmSketch = {
    require(o.depth == depth && o.width == width,
      s"cannot merge count-min sketches of different shape: " +
        s"${depth}x$width vs ${o.depth}x${o.width}")
    var i = 0
    while (i < table.length) { table(i) += o.table(i); i += 1 }
    n += o.n
    this
  }
}

object CmCodec {
  /** FNV-1a 64 over UTF-8 bytes — stable, allocation-free base hash. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  /** Row-d cell index: one splitmix64 over (base ^ row salt), floor-mod
    * width. Row salts are the shared splitmix64 stream — same generator
    * discipline as MinHashSig's coefficients.
    */
  def cell(base: Long, d: Int, width: Int): Int =
    java.lang.Math.floorMod(
      GraftFunctions.splitmix64(base ^ GraftFunctions.splitmix64(d + 1L)),
      width.toLong).toInt

  def serialize(sk: CmSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(sk.depth)
    out.writeInt(sk.width)
    out.writeLong(sk.n)
    var i = 0
    while (i < sk.table.length) { out.writeLong(sk.table(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): CmSketch = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val sk = new CmSketch(in.readInt(), in.readInt())
    sk.n = in.readLong()
    var i = 0
    while (i < sk.table.length) { sk.table(i) = in.readLong(); i += 1 }
    sk
  }
}

/** `graft_countmin(x, depth, width)` — build a Count-Min sketch of a
  * string column; returns the serialized sketch (binary, persistable).
  */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmSketch] with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 32, s"depth must be in [1, 32], got $depth")
  require(width >= 1 && width <= (1 << 26),
    s"width must be in [1, 2^26], got $width")
  // Bound the PRODUCT too: depth=32 x width=2^26 is 2^31 cells, which
  // overflows the Int table index (NegativeArraySizeException) — and
  // even just below that is a 16 GiB allocation per aggregation buffer.
  // 2^28 cells (2 GiB of longs) is the largest allocatable-and-sane
  // sketch; every accepted configuration is guaranteed constructable.
  require(depth.toLong * width <= (1L << 28),
    s"depth*width must be <= 2^28 cells, got ${depth.toLong * width} " +
      s"(depth=$depth, width=$width)")

  override def prettyName: String = "graft_countmin"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_countmin needs a string column, got $other")
  }

  override def createAggregationBuffer(): CmSketch =
    new CmSketch(depth, width)

  override def update(b: CmSketch, input: InternalRow): CmSketch = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String])
    b
  }

  override def merge(b: CmSketch, o: CmSketch): CmSketch = b.mergeIn(o)
  override def eval(b: CmSketch): Any = CmCodec.serialize(b)
  override def serialize(b: CmSketch): Array[Byte] = CmCodec.serialize(b)
  override def deserialize(bytes: Array[Byte]): CmSketch =
    CmCodec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): CountMinAgg =
    copy(child = c)
}

/** `graft_cm_merge(sk)` — merge serialized Count-Min sketches (the
  * incremental-rollup half: per-partition/per-day sketches → one).
  * Empty input → null (no shape to default to).
  */
case class CmMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[CmSketch]]
  with UnaryLike[Expression] {

  override def prettyName: String = "graft_cm_merge"
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cm_merge needs a binary sketch column, got $other")
  }

  override def createAggregationBuffer(): Option[CmSketch] = None

  override def update(b: Option[CmSketch],
      input: InternalRow): Option[CmSketch] = {
    val v = child.eval(input)
    if (v == null) b
    else {
      val sk = CmCodec.deserialize(v.asInstanceOf[Array[Byte]])
      b match {
        case Some(acc) => Some(acc.mergeIn(sk))
        case None => Some(sk)
      }
    }
  }

  override def merge(b: Option[CmSketch],
      o: Option[CmSketch]): Option[CmSketch] = (b, o) match {
    case (Some(x), Some(y)) => Some(x.mergeIn(y))
    case (Some(x), None) => Some(x)
    case (None, y) => y
  }

  override def eval(b: Option[CmSketch]): Any =
    b.map(CmCodec.serialize).orNull

  override def serialize(b: Option[CmSketch]): Array[Byte] =
    b.map(CmCodec.serialize).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[CmSketch] =
    if (bytes.isEmpty) None else Some(CmCodec.deserialize(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): CmMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): CmMergeAgg =
    copy(child = c)
}

/** `graft_cm_union(a, b)` — SCALAR two-sketch union (the state-merge
  * step of sketch-feed maintenance, where the stored and delta
  * sketches meet row-wise in a join, not under an aggregate — the
  * [[QuantileUnion]] pattern). Null-safe: either side null → the
  * other. Shape mismatch throws (CmSketch.mergeIn's guard).
  */
case class CmUnion(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_cm_union"
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_cm_union needs (binary, binary), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null) r
    else if (r == null) l
    else CmCodec.serialize(
      CmCodec.deserialize(l.asInstanceOf[Array[Byte]]).mergeIn(
        CmCodec.deserialize(r.asInstanceOf[Array[Byte]])))
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CmUnion = copy(left = l, right = r)
}

/** `graft_cm_estimate(sk, x)` — point-frequency estimate of `x` from a
  * serialized sketch: min over rows, never an undercount.
  */
case class CmEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_cm_estimate"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_cm_estimate needs (binary sketch, string item), got $other")
    }

  override def nullSafeEval(sk: Any, item: Any): Any = {
    val sketch = CmCodec.deserialize(sk.asInstanceOf[Array[Byte]])
    java.lang.Long.valueOf(
      sketch.estimate(item.asInstanceOf[UTF8String]))
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CmEstimate = copy(left = l, right = r)
}
