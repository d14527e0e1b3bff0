package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable second-moment accumulator over quantized vectors: slot 0 is
  * the row count (at output scale), slots 1..d the per-dimension sums,
  * then the row-major upper triangle of pairwise product sums — the
  * exact layout of [[graft.operators.Pca.momentSums]].
  *
  * All arithmetic is integer (unscaled decimal), so sums are exact.
  * Fast path accumulates in a primitive long array; the FIRST overflow
  * (add or multiply) escalates the whole buffer to BigInteger slots —
  * correctness never depends on magnitudes, only speed does.
  */
final class MomentBuffer(val dim: Int, val scale: Int) {
  val n: Int = 1 + dim + dim * (dim + 1) / 2
  var longs: Array[Long] = new Array[Long](n)
  var bigs: Array[BigInteger] = null // non-null once escalated

  private def escalate(): Unit = {
    if (bigs == null) {
      bigs = new Array[BigInteger](n)
      var i = 0
      while (i < n) { bigs(i) = BigInteger.valueOf(longs(i)); i += 1 }
      longs = null
    }
  }

  private def addBig(i: Int, v: BigInteger): Unit = {
    escalate()
    bigs(i) = bigs(i).add(v)
  }

  private def add(i: Int, v: Long): Unit =
    if (bigs != null) bigs(i) = bigs(i).add(BigInteger.valueOf(v))
    else {
      val s = longs(i) + v
      // overflow iff operands share a sign the sum does not
      if (((longs(i) ^ s) & (v ^ s)) < 0) addBig(i, BigInteger.valueOf(v))
      else longs(i) = s
    }

  /** a*b with 128-bit overflow detection; overflowing products go to
    * the BigInteger path for THAT slot (escalating the buffer).
    */
  private def addProduct(i: Int, a: Long, b: Long): Unit = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    if (hi == (lo >> 63)) add(i, lo)
    else addBig(i, BigInteger.valueOf(a).multiply(BigInteger.valueOf(b)))
  }

  private val countUnit: Long = {
    // one row contributes 10^(2*scale) unscaled at the output scale
    var u = 1L; var i = 0
    while (i < 2 * scale) { u *= 10L; i += 1 }
    u
  }
  private val dimUnit: Long = {
    // per-dimension sums lift from input scale to 2*scale
    var u = 1L; var i = 0
    while (i < scale) { u *= 10L; i += 1 }
    u
  }

  /** One row: `vals(k)` is the unscaled decimal(18,scale) of dimension
    * k, `isNull(k)` marks holes. Null elements are skipped per-term
    * (their sums and products contribute nothing) while the row still
    * counts — exactly the posexplode+sum(null-skipping) semantics this
    * kernel replaces.
    */
  def update(vals: Array[Long], isNull: Array[Boolean]): Unit = {
    add(0, countUnit)
    var i = 0
    var idx = 1 + dim
    while (i < dim) {
      if (!isNull(i)) {
        addProduct(1 + i, vals(i), dimUnit)
        var j = i
        while (j < dim) {
          if (!isNull(j)) addProduct(idx + (j - i), vals(i), vals(j))
          j += 1
        }
      }
      idx += dim - i
      i += 1
    }
  }

  def mergeIn(o: MomentBuffer): MomentBuffer = {
    var i = 0
    if (o.bigs != null) { while (i < n) { addBig(i, o.bigs(i)); i += 1 } }
    else { while (i < n) { add(i, o.longs(i)); i += 1 } }
    this
  }

  def valueAt(i: Int): BigInteger =
    if (bigs != null) bigs(i) else BigInteger.valueOf(longs(i))
}

/** `graft_moment_sums(quantized_vec)` — the one-pass exact moment
  * aggregate behind PCA/covariance: input is the already-quantized
  * array<decimal(18,scale)> (quantization stays a Catalyst projection so
  * its rounding semantics are exactly Spark's), output is the full
  * moment array<decimal(38,2*scale)> of [[graft.operators.Pca.momentSums]]
  * layout. Replaces the interpreted nested-`transform` product build +
  * `posexplode` of d(d+1)/2+d+1 decimal rows PER INPUT ROW + hash
  * aggregate (d=64: 2,145 interpreted decimal ops and exploded rows per
  * row — the entirety of sim12/sim13's cost) with one primitive-long
  * multiply-add loop per row; the shuffle carries ONE moment array per
  * partition instead of (terms × partitions) rows.
  *
  * Exactness: identical integers — unscaled products and sums of the
  * same quantized values; a sum that exceeds DECIMAL(38) emits a null
  * slot, mirroring Spark's non-ANSI decimal-sum overflow. Null vector
  * elements are skipped per-term, null vectors skip the row entirely
  * (posexplode-of-null emits nothing), both matching the relational
  * form it replaces. Rows must carry exactly `dim` elements (the caller
  * filters `size(vec) === dim` first; anything else throws loudly).
  *
  * Documented divergence (r15 ADVICE, out-of-contract input): a moment
  * slot whose contributions are ALL null — a dimension null in every
  * surviving row — evaluates to exact 0 here, where the replaced
  * relational `sum` (and an external SQL oracle's SUM) yields NULL.
  * [[graft.operators.Pca]] callers never see the difference on
  * in-contract inputs (embedding pipelines filter all-null dimensions
  * upstream, and every oracled entry is hash-exact); a caller feeding a
  * fully-null dimension should pre-filter it, as the 0-based mean it
  * would get is a silent anomaly the old plan surfaced as NULL.
  */
case class MomentSumsAgg(child: Expression, dim: Int, scale: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentBuffer] with UnaryLike[Expression] {

  require(dim >= 1 && dim <= 4096, s"dim must be in [1, 4096], got $dim")
  require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")

  override def prettyName: String = "graft_moment_sums"
  override def nullable: Boolean = false
  private val outScale = 2 * scale
  override def dataType: DataType =
    ArrayType(DecimalType(38, outScale), containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(d: DecimalType, _)
        if d.precision <= 18 && d.scale == scale =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_moment_sums needs array<decimal(<=18,$scale)>, got $other")
  }

  override def createAggregationBuffer(): MomentBuffer =
    new MomentBuffer(dim, scale)

  @transient private lazy val inPrecision = child.dataType match {
    case ArrayType(d: DecimalType, _) => d.precision
    case _ => 18
  }

  override def update(b: MomentBuffer, input: InternalRow): MomentBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"graft_moment_sums: expected $dim elements, got " +
            s"${arr.numElements()} — filter size(vec) === dim upstream")
      val vals = new Array[Long](dim)
      val isNull = new Array[Boolean](dim)
      var i = 0
      while (i < dim) {
        if (arr.isNullAt(i)) isNull(i) = true
        else vals(i) = arr.getDecimal(i, inPrecision, scale).toUnscaledLong
        i += 1
      }
      b.update(vals, isNull)
    }
    b
  }

  override def merge(b: MomentBuffer, o: MomentBuffer): MomentBuffer =
    b.mergeIn(o)

  private val maxUnscaled = BigInteger.TEN.pow(38)

  override def eval(b: MomentBuffer): Any = {
    val out = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      val v = b.valueAt(i)
      out(i) =
        if (v.abs.compareTo(maxUnscaled) >= 0) null // decimal(38) overflow
        else org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(v, outScale), 38, outScale)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: MomentBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.dim)
    out.writeInt(b.scale)
    out.writeBoolean(b.bigs != null)
    if (b.bigs != null) {
      var i = 0
      while (i < b.n) {
        val bytes = b.bigs(i).toByteArray
        out.writeInt(bytes.length); out.write(bytes); i += 1
      }
    } else {
      var i = 0
      while (i < b.n) { out.writeLong(b.longs(i)); i += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MomentBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new MomentBuffer(in.readInt(), in.readInt())
    val big = in.readBoolean()
    if (big) {
      b.bigs = new Array[BigInteger](b.n)
      b.longs = null
      var i = 0
      while (i < b.n) {
        val len = in.readInt()
        val arr = new Array[Byte](len)
        in.readFully(arr)
        b.bigs(i) = new BigInteger(arr)
        i += 1
      }
    } else {
      var i = 0
      while (i < b.n) { b.longs(i) = in.readLong(); i += 1 }
    }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): MomentSumsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MomentSumsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MomentSumsAgg =
    copy(child = c)
}
