package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftshim.SparkShim
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matching as a native Catalyst expression —
  * the scale path for dictionary filtering (blocklists, PII term lists,
  * contamination markers) over a 100 TB corpus.
  *
  * Why not a regex alternation: `(p1|p2|…|pk)` scans are O(n·k) in the
  * worst case (and regex engines count NON-overlapping matches only);
  * the AC automaton matches every dictionary term at every end position
  * in ONE O(n + matches) pass regardless of k. The automaton is built
  * once per executor from the pattern literals baked into the
  * expression (a broadcast-free closure — patterns are plan constants),
  * so the per-row cost is a single character walk.
  *
  * Match semantics (the oracle contract): every OCCURRENCE counts,
  * including overlapping and nested ones — pattern "aa" occurs twice in
  * "aaa", and "a" + "and" both fire inside "and". Matching is exact
  * (case-sensitive) over UTF-16 code units, which equals per-character
  * matching for any BMP corpus.
  */
object AhoCorasick {

  /** goto/fail automaton with per-node AGGREGATED output counts (dict
    * suffix outputs folded in at build time, so the query walk never
    * chases suffix links).
    */
  final class Automaton(patterns: Seq[String]) extends Serializable {
    require(patterns.nonEmpty, "AhoCorasick needs at least one pattern")
    require(patterns.forall(_.nonEmpty), "empty pattern in dictionary")
    require(patterns.distinct.size == patterns.size,
      s"duplicate patterns in dictionary")

    private val trans =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.HashMap.empty[Char, Int])
    private val outs =
      scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

    patterns.zipWithIndex.foreach { case (p, idx) =>
      var s = 0
      p.foreach { ch =>
        s = trans(s).getOrElseUpdate(ch, {
          trans += scala.collection.mutable.HashMap.empty[Char, Int]
          outs += Nil
          trans.size - 1
        })
      }
      outs(s) = idx :: outs(s)
    }

    private val fail = new Array[Int](trans.size)
    locally {
      val queue = scala.collection.mutable.Queue.empty[Int]
      trans(0).valuesIterator.foreach { v => fail(v) = 0; queue += v }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        trans(u).foreach { case (ch, v) =>
          var f = fail(u)
          while (f != 0 && !trans(f).contains(ch)) f = fail(f)
          fail(v) = if (trans(f).contains(ch) && trans(f)(ch) != v)
            trans(f)(ch) else 0
          outs(v) = outs(v) ++ outs(fail(v)) // aggregate suffix outputs
          queue += v
        }
      }
    }

    private val transF: Array[scala.collection.Map[Char, Int]] =
      trans.map(m => m: scala.collection.Map[Char, Int]).toArray
    private val outsF: Array[Array[Int]] = outs.map(_.toArray).toArray
    private val failF: Array[Int] = fail

    val size: Int = patterns.size

    /** Per-pattern occurrence counts over one text. */
    def count(text: String): Array[Long] = {
      val counts = new Array[Long](size)
      var s = 0
      var i = 0
      val n = text.length
      while (i < n) {
        val ch = text.charAt(i)
        while (s != 0 && !transF(s).contains(ch)) s = failF(s)
        s = transF(s).getOrElse(ch, 0)
        val o = outsF(s)
        var j = 0
        while (j < o.length) { counts(o(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }

    private val patLen: Array[Int] = patterns.map(_.length).toArray

    /** Every match as (patternIdx, 1-based START position), in scan
      * order (by end position, then dictionary order within one end).
      */
    def find(text: String): Seq[(Int, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var s = 0
      var i = 0
      val n = text.length
      while (i < n) {
        val ch = text.charAt(i)
        while (s != 0 && !transF(s).contains(ch)) s = failF(s)
        s = transF(s).getOrElse(ch, 0)
        val o = outsF(s)
        var j = 0
        while (j < o.length) {
          out += ((o(j), i - patLen(o(j)) + 2)) // 1-based start
          j += 1
        }
        i += 1
      }
      out.toSeq
    }
  }

  /** `string → array<bigint>` of per-pattern occurrence counts, in
    * dictionary order. Null text → null.
    */
  case class AcCountExpr(child: Expression, patterns: Seq[String])
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string")
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_ac_count"
    @transient private lazy val automaton = new Automaton(patterns)
    override def nullSafeEval(text: Any): Any =
      new GenericArrayData(
        automaton.count(text.asInstanceOf[UTF8String].toString))
    override protected def withNewChildInternal(
        newChild: Expression): AcCountExpr = copy(child = newChild)
  }

  def acCount(text: Column, patterns: Seq[String]): Column =
    SparkShim.toColumn(
      AcCountExpr(SparkShim.toExpression(text), patterns))

  /** `string → array<struct<pattern_idx int, pos int>>` of every match
    * (1-based start positions, scan order). Null text → null.
    */
  case class AcFindExpr(child: Expression, patterns: Seq[String])
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("pattern_idx", IntegerType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "graft_ac_find"
    @transient private lazy val automaton = new Automaton(patterns)
    override def nullSafeEval(text: Any): Any = {
      val ms = automaton.find(text.asInstanceOf[UTF8String].toString)
      new GenericArrayData(ms.map { case (idx, pos) =>
        InternalRow(idx, pos)
      }.toArray[Any])
    }
    override protected def withNewChildInternal(
        newChild: Expression): AcFindExpr = copy(child = newChild)
  }

  def acFind(text: Column, patterns: Seq[String]): Column =
    SparkShim.toColumn(
      AcFindExpr(SparkShim.toExpression(text), patterns))
}
