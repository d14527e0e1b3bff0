package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.types._

/** Mergeable quantile sketches — the third sketch family of the
  * incremental-analytics trio (HLL distinct counts: a19; Misra-Gries
  * heavy hitters: hh1/hh2; quantiles: here). The summary is
  * Greenwald-Khanna (Spark's own [[QuantileSummaries]], the structure
  * behind `percentile_approx`), persisted as BYTES so a 100 TB lake can
  * keep one small sketch per partition/hour and answer "p99 latency over
  * any span" by MERGING sketches — no rescan of raw data. Rank error is
  * certified: a queried quantile's true rank is within ±relativeError·n
  * of the target; with relativeError below 1/(2n) the structure keeps
  * every sample and answers are exact (the oracle-able configuration,
  * same trick as hh1's full-capacity Misra-Gries).
  *
  * Three functions mirror the Datasketches HLL surface:
  * `graft_quantile_sketch(x[, eps])` (agg → binary),
  * `graft_quantile_merge(sk)` (agg → binary),
  * `graft_quantile_estimate(sk, p)` (scalar → double).
  */
object QSketchCodec {
  /** Numeric-literal extraction for function-registration sites: SQL
    * fractional literals arrive as DecimalType (0.001 is a Decimal, not
    * a java.lang.Number), double spellings (1e-3, 0.001d) as Double.
    */
  def numArg(e: Expression): Double = e.eval() match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"expected a numeric literal, got $other")
  }

  /** Foldable-integer-literal extraction for registration sites
    * (depth/width/k/capacity/bits args): a missing, non-foldable,
    * null, or non-numeric arg gets a clear plan-time error instead of
    * IndexOutOfBounds/NPE/ClassCast from a bare `es(i).eval()`.
    */
  def intArg(es: Seq[Expression], idx: Int, fname: String): Int = {
    require(es.length > idx,
      s"$fname: expected at least ${idx + 1} arguments, got ${es.length}")
    val e = es(idx)
    require(e.foldable,
      s"$fname: argument #${idx + 1} must be a literal")
    e.eval() match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble.toInt
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fname: argument #${idx + 1} must be a numeric literal, " +
          s"got ${if (other == null) "NULL" else other}")
    }
  }

  /** Foldable-double-literal extraction — [[intArg]]'s sibling for
    * smoothing coefficients (α/β/γ) at SQL registration sites. */
  def doubleArg(es: Seq[Expression], idx: Int, fname: String): Double = {
    require(es.length > idx,
      s"$fname: expected at least ${idx + 1} arguments, got ${es.length}")
    val e = es(idx)
    require(e.foldable,
      s"$fname: argument #${idx + 1} must be a literal")
    e.eval() match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"$fname: argument #${idx + 1} must be a numeric literal, " +
          s"got ${if (other == null) "NULL" else other}")
    }
  }

  /** Plan-time arity guard for registration-site lambdas. */
  def arity(es: Seq[Expression], n: Int, fname: String): Seq[Expression] = {
    require(es.length == n,
      s"$fname: expected $n arguments, got ${es.length}")
    es
  }

  /** Foldable-string-literal extraction — dictionary/config args at
    * SQL registration sites (e.g. graft_ac_count's pattern list). */
  def stringArg(es: Seq[Expression], idx: Int, fname: String): String = {
    require(es.length > idx,
      s"$fname: expected at least ${idx + 1} arguments, got ${es.length}")
    val e = es(idx)
    require(e.foldable,
      s"$fname: argument #${idx + 1} must be a literal")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"$fname: argument #${idx + 1} must be a string literal, " +
          s"got ${if (other == null) "NULL" else other}")
    }
  }

  /** compress() has no early return on the compressed flag and costs a
    * full pass over sampled — skip it when already compressed
    * (deserialized sketches and merge() results always are).
    */
  def ensureCompressed(qs: QuantileSummaries): QuantileSummaries =
    if (qs.compressed) qs else qs.compress()

  // NOTE: this format is intentionally field-for-field identical to
  // Spark's ApproximatePercentile.PercentileDigestSerializer
  // (compressThreshold, relativeError, count, sampled (value, g,
  // delta)*) — kept hand-rolled so the PERSISTED sketch-store format is
  // owned here, not by an upstream serializer that may change layout.
  def serialize(qs0: QuantileSummaries): Array[Byte] = {
    val qs = ensureCompressed(qs0)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(qs.compressThreshold)
    out.writeDouble(qs.relativeError)
    out.writeLong(qs.count)
    val s = qs.sampled
    out.writeInt(s.length)
    s.foreach { st =>
      out.writeDouble(st.value); out.writeLong(st.g); out.writeLong(st.delta)
    }
    out.flush()
    bos.toByteArray
  }

  /** Union with the eps guard: sketches built with different eps must
    * never silently merge — the result's certified rank-error bound
    * would be whichever eps it happens to carry.
    */
  def checkedMerge(a: QuantileSummaries,
      b: QuantileSummaries): QuantileSummaries = {
    require(a.relativeError == b.relativeError,
      s"cannot union quantile sketches with different " +
        s"relativeError (${a.relativeError} vs ${b.relativeError}) — " +
        "their certified error bounds are incompatible")
    ensureCompressed(a).merge(ensureCompressed(b))
  }

  def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val ct = in.readInt()
    val re = in.readDouble()
    val count = in.readLong()
    val n = in.readInt()
    val stats = Array.fill(n) {
      new QuantileSummaries.Stats(in.readDouble(), in.readLong(),
        in.readLong())
    }
    new QuantileSummaries(ct, re, stats, count, true)
  }
}

/** Mutable aggregation holder: GK summaries are persistent structures
  * (insert returns a new head), so the buffer tracks the latest.
  */
final class QSketchBuffer(var qs: QuantileSummaries)

/** `graft_quantile_sketch(x[, eps])` — build a GK sketch of a numeric
  * column; returns the serialized summary (binary, persistable).
  */
case class QuantileSketchAgg(child: Expression,
    relativeError: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketchBuffer] with UnaryLike[Expression] {

  require(relativeError > 0.0 && relativeError < 1.0,
    s"relativeError must be in (0, 1), got $relativeError")

  override def prettyName: String = "graft_quantile_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quantile_sketch needs a numeric column, got $other")
  }

  override def createAggregationBuffer(): QSketchBuffer =
    new QSketchBuffer(new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError))

  // Spark's Decimal is not a java.lang.Number — convert per input type
  @transient private lazy val toDouble: Any => Double =
    child.dataType match {
      case _: DecimalType =>
        v => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
      case _ => v => v.asInstanceOf[Number].doubleValue()
    }

  override def update(b: QSketchBuffer, input: InternalRow): QSketchBuffer = {
    val v = child.eval(input)
    if (v != null) b.qs = b.qs.insert(toDouble(v))
    b
  }

  override def merge(b: QSketchBuffer, o: QSketchBuffer): QSketchBuffer = {
    b.qs = QSketchCodec.ensureCompressed(b.qs)
      .merge(QSketchCodec.ensureCompressed(o.qs))
    b
  }

  override def eval(b: QSketchBuffer): Any = QSketchCodec.serialize(b.qs)

  override def serialize(b: QSketchBuffer): Array[Byte] =
    QSketchCodec.serialize(b.qs)
  override def deserialize(bytes: Array[Byte]): QSketchBuffer =
    new QSketchBuffer(QSketchCodec.deserialize(bytes))

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantileSketchAgg =
    copy(child = c)
}

/** `graft_quantile_merge(sk)` — union previously-built sketches (the
  * rollup step: per-hour sketches → any-span sketch). Null inputs are
  * skipped; an all-null/empty group yields an empty sketch of the first
  * merged sketch's parameters, or null when nothing merged.
  */
case class QuantileMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketchBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "graft_quantile_merge"
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quantile_merge needs a binary sketch column, got $other")
  }

  override def createAggregationBuffer(): QSketchBuffer =
    new QSketchBuffer(null)

  private def checkedMerge(a: QuantileSummaries,
      b: QuantileSummaries): QuantileSummaries =
    QSketchCodec.checkedMerge(a, b)

  override def update(b: QSketchBuffer, input: InternalRow): QSketchBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val in = QSketchCodec.deserialize(v.asInstanceOf[Array[Byte]])
      b.qs = if (b.qs == null) in else checkedMerge(b.qs, in)
    }
    b
  }

  override def merge(b: QSketchBuffer, o: QSketchBuffer): QSketchBuffer = {
    if (o.qs != null)
      b.qs = if (b.qs == null) o.qs else checkedMerge(b.qs, o.qs)
    b
  }

  override def eval(b: QSketchBuffer): Any =
    if (b.qs == null) null else QSketchCodec.serialize(b.qs)

  override def serialize(b: QSketchBuffer): Array[Byte] =
    if (b.qs == null) Array.empty else QSketchCodec.serialize(b.qs)
  override def deserialize(bytes: Array[Byte]): QSketchBuffer =
    new QSketchBuffer(
      if (bytes.isEmpty) null else QSketchCodec.deserialize(bytes))

  override def withNewMutableAggBufferOffset(o: Int): QuantileMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantileMergeAgg =
    copy(child = c)
}

/** `graft_quantile_estimate(sk, p)` — query a serialized sketch at
  * quantile p ∈ [0, 1]. Null sketch / empty sketch → null.
  */
case class QuantileEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_quantile_estimate"
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  // p accepts any numeric (the natural SQL spellings — 0.99 is a
  // DECIMAL literal, 1 an INT — must not fail analysis); converted at
  // eval. AbstractDataType is private[sql] in Spark 4, so the implicit-
  // cast trait is not available to external expressions.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, _: NumericType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_quantile_estimate needs (binary, numeric), got $other")
    }

  override def nullSafeEval(sk: Any, p: Any): Any = {
    val pd = p match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number => n.doubleValue()
    }
    require(pd >= 0.0 && pd <= 1.0,
      s"graft_quantile_estimate: quantile must be in [0, 1], got $pd")
    val qs = QSketchCodec.deserialize(sk.asInstanceOf[Array[Byte]])
    if (qs.count == 0L) null
    else qs.query(pd).map(Double.box).orNull
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): QuantileEstimate =
    copy(left = l, right = r)
}

/** `graft_quantile_union(a, b)` — SCALAR two-sketch union (the
  * state-merge step of incremental-view maintenance, where the current
  * and delta sketches meet row-wise in a join, not under an aggregate).
  * Null-safe: either side null → the other.
  */
case class QuantileUnion(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_quantile_union"
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_quantile_union needs (binary, binary), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null) r
    else if (r == null) l
    else QSketchCodec.serialize(QSketchCodec.checkedMerge(
      QSketchCodec.deserialize(l.asInstanceOf[Array[Byte]]),
      QSketchCodec.deserialize(r.asInstanceOf[Array[Byte]])))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): QuantileUnion =
    copy(left = l, right = r)
}
