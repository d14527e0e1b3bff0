package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary: at most `capacity` counters.
  *
  * Guarantees (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): after summarizing n items,
  *   count_lb(x) <= true(x) <= count_lb(x) + delta,  delta <= n/(capacity+1)
  * and every item with true frequency > n/(capacity+1) is PRESENT in the
  * summary. `delta` (the max undercount) is tracked exactly and exposed,
  * so callers get per-run certified error bars, not just the worst case.
  *
  * Merge is the counter-wise sum followed by the (capacity+1)-th-largest
  * subtraction, which preserves the additive error bound — summaries from
  * any partitioning of the data combine associatively. That is what makes
  * this the 100 TB heavy-hitters path: each task keeps `capacity`
  * counters, the shuffle carries one small sketch per partition, and no
  * per-item state ever crosses the wire (t7's exact top-k shuffles every
  * distinct token).
  */
final class FreqSketch(val capacity: Int) {
  val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty
  var delta: Long = 0L

  def add(item: UTF8String): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1L)
      case None =>
        if (counts.size < capacity) {
          // UTF8String from an unsafe row points into a reused buffer —
          // keys that outlive the row must own their bytes
          counts.update(item.clone(), 1L)
        } else {
          // classic MG step: the new item and every counter lose 1
          delta += 1L
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          counts.mapValuesInPlace { (_, c) => c - 1L }
          counts.foreach { case (k, c) => if (c <= 0L) dead += k }
          dead.foreach(counts.remove)
        }
    }
  }

  def mergeIn(o: FreqSketch): FreqSketch = {
    o.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    delta += o.delta
    if (counts.size > capacity) {
      // subtract the (capacity+1)-th largest count from all counters:
      // exactly `capacity` survive and the undercount grows by it
      val cut = counts.values.toArray.sortInPlaceWith(_ > _).apply(capacity)
      delta += cut
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      counts.mapValuesInPlace { (_, c) => c - cut }
      counts.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(counts.remove)
    }
    this
  }
}

/** `graft_freq_items(item, capacity)` — the Misra-Gries summary as a
  * Catalyst [[TypedImperativeAggregate]]: extension level (b) for
  * aggregates (native > UDAF), sitting beside the built-in Datasketches
  * HLL (a19) as the engine's second mergeable sketch family.
  *
  * Returns array<struct<item, count_lb, max_err>> sorted by
  * (count_lb DESC, item): `count_lb` is a certified lower bound and
  * `count_lb + max_err` the matching upper bound for every item. With
  * `capacity` >= the number of distinct items no decrement can ever fire,
  * `max_err` is 0, and the result provably equals the exact group-by
  * counts — the oracle-able configuration (hh1_freq_items), same trick
  * as sim3's nprobe=nlist and sim5b's covering codebooks.
  */
case class FreqItems(child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch] with UnaryLike[Expression] {

  require(capacity >= 1, "capacity must be >= 1")

  override def prettyName: String = "graft_freq_items"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_lb", LongType, nullable = false),
    StructField("max_err", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_freq_items needs a string item column, got $other")
    }

  override def createAggregationBuffer(): FreqSketch = new FreqSketch(capacity)

  override def update(b: FreqSketch, input: InternalRow): FreqSketch = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String])
    b
  }

  override def merge(b: FreqSketch, o: FreqSketch): FreqSketch = b.mergeIn(o)

  override def eval(b: FreqSketch): Any = {
    val entries = b.counts.toArray
    // certified order: count lower-bound desc, then binary item order —
    // deterministic for any map iteration order
    java.util.Arrays.sort(entries,
      (x: (UTF8String, Long), y: (UTF8String, Long)) => {
        val c = java.lang.Long.compare(y._2, x._2)
        if (c != 0) c else x._1.compareTo(y._1)
      })
    new GenericArrayData(entries.map { case (item, c) =>
      InternalRow(item, c, b.delta)
    })
  }

  override def serialize(b: FreqSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.capacity)
    out.writeLong(b.delta)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (k, c) =>
      val bytes = k.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val sk = new FreqSketch(in.readInt())
    sk.delta = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      sk.counts.update(UTF8String.fromBytes(buf), in.readLong())
      i += 1
    }
    sk
  }

  override def withNewMutableAggBufferOffset(offset: Int): FreqItems =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqItems =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): FreqItems =
    copy(child = c)
}
