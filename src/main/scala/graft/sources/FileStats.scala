package graft.sources

import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Type}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{StructField, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-file column statistics for manifest-level data skipping — the
  * Iceberg "metrics in manifests" design (spec §Manifests: lower_bounds /
  * upper_bounds / null_value_counts per data file) re-expressed for the
  * graft manifest protocol: one `#stats <file> <json>` line per data
  * file, written once by the committing writer from the file's parquet
  * FOOTER and carried forward by every later commit, so scan PLANNING
  * prunes whole files against pushed predicates without opening any file
  * — at 100 TB the difference between launching tasks for every file and
  * launching them only where the predicate can hold.
  *
  * Bounds live in a typed comparison domain: `BigDecimal` for every
  * numeric shape (integers, floats, decimals — and timestamps as epoch
  * MICROS, dates as epoch DAYS, so predicate values and footer values
  * meet on one axis), `String` for UTF8 columns, `java.lang.Boolean` for
  * booleans. Everything unprovable — missing stats, unsupported physical
  * type (INT96), NaN/Infinite float bounds, non-ASCII string bounds
  * (parquet orders binary UNSIGNED-bytewise, `String.compareTo` by
  * UTF-16 unit; they agree only when the stored bound is pure ASCII) —
  * is simply OMITTED, and an omitted bound can never prune. Spark
  * re-evaluates every pushed filter above the scan, so skipping is a
  * pure optimization: a false "may match" costs a read, a false "cannot
  * match" is impossible by construction.
  *
  * Stats keys are `i<fieldId>` when the parquet column carries a field
  * id ([[VersionedTable.FieldIdKey]] stamping) and `n<dottedName>`
  * otherwise — id-keyed stats survive column RENAME exactly like the
  * data files themselves (resolved by id, not name).
  */
private[graft] object FileStats {

  /** Aggregated whole-file bounds for one leaf column. `min`/`max` are
    * values of the comparison domain; `allNull` means every row's value
    * is null (bounds absent).
    */
  final case class ColStats(min: Option[Any], max: Option[Any],
      nulls: Option[Long], allNull: Boolean)

  /** One file's parsed stats: total row count, on-disk byte length (files
    * are immutable, so the commit-time length holds forever — planning
    * needs no per-file `getFileStatus` RPC), per-key column bounds, and
    * the WRITE-TIME sort order of the file's rows as a list of stats
    * keys (`sorted` nonEmpty ⇒ the committing writer sorted the file
    * ascending, nulls first, on those columns in that order — footer
    * bounds can never prove inner sortedness, so only the writer may
    * stamp this). Id-keyed entries survive column rename like bounds do.
    */
  final case class FileStat(rows: Option[Long], bytes: Option[Long],
      cols: Map[String, ColStats], sorted: Seq[String] = Nil)

  // ---------------------------------------------------------------- domain

  /** A Spark filter value normalized into the comparison domain, or None
    * when no sound comparison exists (then the filter cannot prune).
    */
  def normalize(v: Any): Option[Any] = v match {
    case null => None
    case b: java.lang.Boolean => Some(b)
    case s: String => Some(s)
    case n: java.lang.Byte => Some(BigDecimal(n.longValue))
    case n: java.lang.Short => Some(BigDecimal(n.longValue))
    case n: java.lang.Integer => Some(BigDecimal(n.longValue))
    case n: java.lang.Long => Some(BigDecimal(n.longValue))
    case f: java.lang.Float =>
      if (f.isNaN || f.isInfinite) None else Some(BigDecimal(f.toDouble))
    case d: java.lang.Double =>
      if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d))
    case d: java.math.BigDecimal => Some(BigDecimal(d))
    case d: scala.math.BigDecimal => Some(d)
    case t: java.sql.Timestamp => Some(BigDecimal(
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)))
    case i: java.time.Instant => Some(BigDecimal(
      org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i)))
    case d: java.sql.Date => Some(BigDecimal(
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong))
    case d: java.time.LocalDate => Some(BigDecimal(d.toEpochDay))
    case d: java.time.LocalDateTime => Some(BigDecimal(
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .localDateTimeToMicros(d)))
    case _ => None
  }

  /** Sign of `a compare b` within the domain; None = incomparable. */
  def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => Some(x.compare(y))
    case (x: String, y: String) => Some(Integer.signum(x.compareTo(y)))
    case (x: java.lang.Boolean, y: java.lang.Boolean) => Some(x.compareTo(y))
    case _ => None
  }

  // ------------------------------------------------------------- evaluator

  /** In-sets beyond this size answer "may match" without probing — the
    * probe is O(|set| × files) at planning and a runtime-DPP key set can
    * be arbitrarily large.
    */
  private val InProbeMax = 10000

  /** May a file with these stats contain a row satisfying ALL `filters`?
    * Sound under partial knowledge: any missing bound/column answers
    * true. `lookup` resolves a filter's attribute to column stats (None
    * = column unknown).
    */
  def mayMatch(lookup: String => Option[ColStats],
      filters: Seq[Filter]): Boolean = {
    def within(a: String, v: Any): Boolean = lookup(a).forall { s =>
      !s.allNull && normalize(v).forall { nv =>
        s.min.flatMap(cmp(_, nv)).forall(_ <= 0) &&
          s.max.flatMap(cmp(_, nv)).forall(_ >= 0)
      }
    }
    def may(f: Filter): Boolean = f match {
      case EqualTo(a, v) => if (v == null) true else within(a, v)
      case EqualNullSafe(a, null) => may(IsNull(a))
      case EqualNullSafe(a, v) => within(a, v)
      case GreaterThan(a, v) => lookup(a).forall { s =>
        !s.allNull && normalize(v).forall(nv =>
          s.max.flatMap(cmp(_, nv)).forall(_ > 0))
      }
      case GreaterThanOrEqual(a, v) => lookup(a).forall { s =>
        !s.allNull && normalize(v).forall(nv =>
          s.max.flatMap(cmp(_, nv)).forall(_ >= 0))
      }
      case LessThan(a, v) => lookup(a).forall { s =>
        !s.allNull && normalize(v).forall(nv =>
          s.min.flatMap(cmp(_, nv)).forall(_ < 0))
      }
      case LessThanOrEqual(a, v) => lookup(a).forall { s =>
        !s.allNull && normalize(v).forall(nv =>
          s.min.flatMap(cmp(_, nv)).forall(_ <= 0))
      }
      case In(a, vs) =>
        if (vs == null || vs.length > InProbeMax) true
        else vs.exists(v => v == null || within(a, v))
      case IsNull(a) => lookup(a).forall(s => !s.nulls.contains(0L))
      case IsNotNull(a) => lookup(a).forall(!_.allNull)
      case StringStartsWith(a, p) if p != null => lookup(a).forall { s =>
        !s.allNull && {
          // any string with prefix p compares >= p and agrees with the
          // bounds on the first |p| characters — so min's prefix above p
          // or max's prefix below p both rule the whole file out
          val minOk = s.min.forall {
            case m: String => m.take(p.length) <= p
            case _ => true
          }
          val maxOk = s.max.forall {
            case m: String => m.take(p.length) >= p
            case _ => true
          }
          minOk && maxOk
        }
      }
      case And(l, r) => may(l) && may(r)
      case Or(l, r) => may(l) || may(r)
      case AlwaysTrue() => true
      case AlwaysFalse() => false
      case _ => true // Not, string contains/ends-with, unknown kinds
    }
    filters.forall(may)
  }

  /** Candidate stats keys per queryable column path of `schema` — field
    * id first (rename-proof), then name — for every nesting level.
    */
  def lookupKeys(schema: StructType): Map[String, Seq[String]] = {
    def walk(fields: Seq[StructField], prefix: String)
        : Seq[(String, Seq[String])] =
      fields.flatMap { f =>
        val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        val fid =
          if (f.metadata.contains(VersionedTable.FieldIdKey))
            Seq("i" + f.metadata.getLong(VersionedTable.FieldIdKey))
          else Nil
        val self = name -> (fid :+ ("n" + name))
        f.dataType match {
          case st: StructType => self +: walk(st.fields.toSeq, name)
          case _ => Seq(self)
        }
      }
    walk(schema.fields.toSeq, "").toMap
  }

  /** [[mayMatch]] over one file's parsed stats, resolving attributes
    * through `keys` (from [[lookupKeys]]).
    */
  def fileMayMatch(stat: FileStat, keys: Map[String, Seq[String]],
      filters: Seq[Filter]): Boolean =
    mayMatch(a => keys.getOrElse(a, Seq("n" + a))
      .iterator.flatMap(stat.cols.get).nextOption(), filters)

  // ------------------------------------------------- limit / top-n pruning

  /** A file subset provably sufficient for any valid `LIMIT limit`
    * (`topN` = None) or `ORDER BY col [DESC] LIMIT limit` (`topN` =
    * Some(statsKeyCandidates, desc)) result over `names` — at 100 TB
    * the difference between "read everything to show the latest 100"
    * and reading one file. Plain LIMIT takes files until their known
    * row counts certify `limit` rows. Top-n derives a value threshold
    * T from the files with the cheapest bounds (ascending nulls-first:
    * every row of a chosen file is ≤ its max or null, and nulls sort
    * first, so all-null files contribute count without raising T;
    * descending nulls-last: only the `rows - nulls` non-null rows
    * count, all ≥ the file's min), then keeps exactly the files that
    * could still hold a qualifying row. Ties at T are kept on the
    * chosen side and excluded beyond it — any tie choice is a valid
    * answer under SQL's non-deterministic LIMIT, exactly like Spark's
    * own TopK. Every unknown (missing rows, bounds, null counts)
    * fails toward keeping the file; if the knowns cannot certify
    * `limit` rows, nothing is pruned. The caller re-applies the real
    * limit/sort above the scan (partial pushdown), so pruning here is
    * a pure optimization.
    */
  def limitPruneFiles(stat: String => Option[FileStat],
      names: Seq[String], limit: Int,
      topN: Option[(Set[String], Boolean)]): Seq[String] = topN match {
    case None =>
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      var cum = 0L
      val it = names.iterator
      while (cum < limit && it.hasNext) {
        val n = it.next(); acc += n
        cum += stat(n).flatMap(_.rows).getOrElse(0L)
      }
      if (cum >= limit) acc.toSeq else names
    case Some((keys, desc)) =>
      def col(n: String): Option[ColStats] =
        stat(n).flatMap(st => keys.iterator.flatMap(st.cols.get).nextOption())
      final case class Cand(contrib: Long, bound: Option[Any])
      val cands = names.flatMap { n =>
        (stat(n).flatMap(_.rows), col(n)) match {
          case (Some(r), Some(c)) =>
            if (!desc) {
              if (c.allNull) Some(Cand(r, None)) // nulls-only: free count
              else c.max.map(m => Cand(r, Some(m)))
            } else if (c.allNull) None // nulls last: contributes nothing
            else (c.min, c.nulls) match {
              case (Some(m), Some(z)) => Some(Cand(r - z, Some(m)))
              case _ => None
            }
          case _ => None
        }
      }
      // threshold from the cheapest bounds first (smallest max asc /
      // largest min desc; bound-free null-only files cost nothing)
      val ordered = cands.sortWith { (a, b) =>
        (a.bound, b.bound) match {
          case (None, Some(_)) => true
          case (Some(x), Some(y)) =>
            cmp(x, y).exists(c => if (desc) c > 0 else c < 0)
          case _ => false
        }
      }
      var cum = 0L
      var thresh: Option[Any] = None
      val it = ordered.iterator
      while (cum < limit && it.hasNext) {
        val c = it.next()
        cum += c.contrib
        c.bound.foreach { b =>
          thresh = thresh match {
            case Some(t) if cmp(b, t).exists(x =>
              if (desc) x >= 0 else x <= 0) => Some(t)
            case _ => Some(b)
          }
        }
      }
      if (cum < limit) names // cannot certify enough rows — keep all
      else names.filter { n =>
        col(n) match {
          case Some(c) =>
            val excludable =
              if (!desc)
                // beyond T and provably null-free (nulls sort first)
                c.nulls.contains(0L) && !c.allNull && (thresh match {
                  case Some(t) => c.min.exists(m => cmp(m, t).exists(_ > 0))
                  case None => true // top-n is all nulls
                })
              else
                // ≥ limit non-null rows ≥ T exist, so nulls (last) and
                // anything provably below T are out
                c.allNull || (thresh match {
                  case Some(t) => c.max.exists(m => cmp(m, t).exists(_ < 0))
                  case None => false
                })
            !excludable
          case None => true
        }
      }
  }

  // ------------------------------------------------------- footer -> stats

  /** Longest string bound kept verbatim; longer mins truncate (a prefix
    * is a valid lower bound), longer maxes truncate-and-increment
    * (Iceberg's upper-bound rule) or drop.
    */
  private val StringBoundMax = 64

  /** Most columns recorded per file — bounds manifest growth on very
    * wide schemas (leading schema columns win; the rest never prune).
    */
  private val MaxStatsCols = 100

  private def leafColumns(schema: MessageType)
      : Seq[(String, PrimitiveType)] = {
    import scala.jdk.CollectionConverters._
    def walk(t: Type, prefix: String): Seq[(String, PrimitiveType)] = {
      val name = if (prefix.isEmpty) t.getName else s"$prefix.${t.getName}"
      t match {
        case p: PrimitiveType => Seq(name -> p)
        case g: GroupType => g.getFields.asScala.toSeq.flatMap(walk(_, name))
      }
    }
    schema.getFields.asScala.toSeq.flatMap(walk(_, ""))
  }

  /** ASCII-guarded, truncation-safe string bound; None = unusable. */
  private def stringBound(b: org.apache.parquet.io.api.Binary,
      isMax: Boolean): Option[String] = {
    val s = b.toStringUsingUTF8
    if (!s.forall(_ < 0x80)) None
    else if (s.length <= StringBoundMax) Some(s)
    else if (!isMax) Some(s.take(StringBoundMax))
    else {
      // round the truncated prefix UP so it stays an upper bound
      val t = s.take(StringBoundMax)
      val i = t.lastIndexWhere(_ < 0x7f)
      if (i < 0) None
      else Some(t.take(i) + (t.charAt(i) + 1).toChar)
    }
  }

  /** Converter from a parquet footer stat value of `pt` into the
    * comparison domain; None = physical/logical type unsupported. The
    * `isMax` flag keeps lossy conversions (nanos→micros, string
    * truncation) on the sound side of the bound.
    */
  private def converter(pt: PrimitiveType)
      : Option[(Any, Boolean) => Option[Any]] = {
    import LogicalTypeAnnotation._
    val logical = pt.getLogicalTypeAnnotation
    def num(f: (Any, Boolean) => Option[Any]) = Some(f)
    pt.getPrimitiveTypeName match {
      case PrimitiveTypeName.BOOLEAN =>
        num((v, _) => Some(v.asInstanceOf[java.lang.Boolean]))
      case PrimitiveTypeName.INT32 => logical match {
        case _: TimeLogicalTypeAnnotation => None
        case d: DecimalLogicalTypeAnnotation => num((v, _) => Some(BigDecimal(
          java.math.BigDecimal.valueOf(
            v.asInstanceOf[Number].longValue, d.getScale))))
        case _ => // plain/int/date: days and ints share the numeric axis
          num((v, _) => Some(BigDecimal(v.asInstanceOf[Number].longValue)))
      }
      case PrimitiveTypeName.INT64 => logical match {
        case t: TimestampLogicalTypeAnnotation =>
          val unit = t.getUnit
          num { (v, isMax) =>
            val x = v.asInstanceOf[Number].longValue
            unit match {
              case TimeUnit.MILLIS => Some(BigDecimal(x) * 1000)
              case TimeUnit.MICROS => Some(BigDecimal(x))
              case TimeUnit.NANOS =>
                // round toward the sound side of the bound
                Some(BigDecimal(if (isMax) -Math.floorDiv(-x, 1000L)
                  else Math.floorDiv(x, 1000L)))
              case _ => None
            }
          }
        case _: TimeLogicalTypeAnnotation => None
        case d: DecimalLogicalTypeAnnotation => num((v, _) => Some(BigDecimal(
          java.math.BigDecimal.valueOf(
            v.asInstanceOf[Number].longValue, d.getScale))))
        case _ =>
          num((v, _) => Some(BigDecimal(v.asInstanceOf[Number].longValue)))
      }
      case PrimitiveTypeName.FLOAT => num { (v, _) =>
        val f = v.asInstanceOf[java.lang.Float]
        if (f.isNaN || f.isInfinite) None else Some(BigDecimal(f.toDouble))
      }
      case PrimitiveTypeName.DOUBLE => num { (v, _) =>
        val d = v.asInstanceOf[java.lang.Double]
        if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d))
      }
      case PrimitiveTypeName.BINARY | PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY =>
        logical match {
          case _: StringLogicalTypeAnnotation | _: EnumLogicalTypeAnnotation |
              _: JsonLogicalTypeAnnotation =>
            num((v, isMax) => stringBound(
              v.asInstanceOf[org.apache.parquet.io.api.Binary], isMax))
          case d: DecimalLogicalTypeAnnotation => num((v, _) => Some(
            BigDecimal(new java.math.BigDecimal(new java.math.BigInteger(
              v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes),
              d.getScale))))
          case _ => None
        }
      case _ => None // INT96 (unordered stats), unknown physical types
    }
  }

  /** Whole-file stats JSON from a parquet footer. Row count and byte
    * length always; per-column bounds only where every row group proves
    * them.
    */
  def fromFooter(
      md: org.apache.parquet.hadoop.metadata.ParquetMetadata,
      fileLen: Long, sortedBy: Seq[String] = Nil): String = {
    import scala.jdk.CollectionConverters._
    val blocks = md.getBlocks.asScala.toSeq
    val rows = blocks.map(_.getRowCount).sum
    val leaves = leafColumns(md.getFileMetaData.getSchema)
    val byPath = blocks.map(b =>
      b.getColumns.asScala.map(c => c.getPath.toDotString -> c).toMap)
    val entries = leaves.iterator.flatMap { case (path, pt) =>
      converter(pt).flatMap { conv =>
        val key = Option(pt.getId).map("i" + _.intValue)
          .getOrElse("n" + path)
        // every block must carry usable stats or the column is unknown
        val perBlock = blocks.indices.map { i =>
          byPath(i).get(path).map(_.getStatistics) match {
            case Some(s) if s != null && !s.isEmpty =>
              if (!s.hasNonNullValue)
                // all-null block: no bounds, nulls = block row count
                Some((None, None,
                  if (s.isNumNullsSet) Some(s.getNumNulls)
                  else Some(blocks(i).getRowCount), true))
              else Some((conv(s.genericGetMin, false),
                conv(s.genericGetMax, true),
                if (s.isNumNullsSet) Some(s.getNumNulls) else None, false))
            case _ => None
          }
        }
        if (perBlock.exists(_.isEmpty)) None
        else {
          val bs = perBlock.flatten
          val valued = bs.filterNot(_._4)
          def agg(side: Int): Option[Any] = {
            val vals = valued.map(b => if (side < 0) b._1 else b._2)
            if (valued.isEmpty || vals.exists(_.isEmpty)) None
            else {
              val vs = vals.flatten
              vs.tail.foldLeft(Option(vs.head)) { (acc, b) =>
                // an incomparable pair poisons the bound for good
                acc.flatMap(a => cmp(a, b).map(c =>
                  if ((side < 0) == (c <= 0)) a else b))
              }
            }
          }
          val nulls =
            if (bs.forall(_._3.isDefined)) Some(bs.flatMap(_._3).sum)
            else None
          val allNull = bs.nonEmpty && bs.forall(_._4)
          val stat = ColStats(agg(-1), agg(1), nulls, allNull)
          if (stat.min.isEmpty && stat.max.isEmpty && stat.nulls.isEmpty &&
            !stat.allNull) None
          else Some(key -> stat)
        }
      }
    }.take(MaxStatsCols).toSeq
    render(FileStat(Some(rows),
      if (fileLen > 0) Some(fileLen) else None, entries.toMap, sortedBy))
  }

  // ------------------------------------------------------------------ json

  private def encode(v: Any): JValue = v match {
    case b: java.lang.Boolean => JBool(b)
    case s: String => JString(s)
    case d: BigDecimal => JDecimal(d)
    case _ => JNothing
  }

  private def decode(j: JValue): Option[Any] = j match {
    case JBool(b) => Some(java.lang.Boolean.valueOf(b))
    case JString(s) => Some(s)
    case JDecimal(d) => Some(d)
    case JDouble(d) => Some(BigDecimal(d))
    case JInt(i) => Some(BigDecimal(i))
    case JLong(l) => Some(BigDecimal(l))
    case _ => None
  }

  def render(stat: FileStat): String = {
    val cols = stat.cols.toSeq.sortBy(_._1).map { case (k, s) =>
      k -> JObject(List(
        s.min.map(v => "l" -> encode(v)),
        s.max.map(v => "u" -> encode(v)),
        s.nulls.map(n => "z" -> (JLong(n): JValue)),
        if (s.allNull) Some("a" -> (JBool(true): JValue)) else None
      ).flatten)
    }
    JsonMethods.compact(JsonMethods.render(JObject(
      "n" -> stat.rows.map(r => JLong(r): JValue).getOrElse(JNothing),
      "b" -> stat.bytes.map(b => JLong(b): JValue).getOrElse(JNothing),
      "s" -> (if (stat.sorted.isEmpty) JNothing
        else JArray(stat.sorted.toList.map(JString(_)))),
      "c" -> JObject(cols.toList))))
  }

  /** Parse one `#stats` JSON payload; None on any malformation (a
    * corrupt stats line must never fail a read — it just cannot prune).
    */
  def parse(json: String): Option[FileStat] =
    try {
      val j = JsonMethods.parse(json, useBigDecimalForDouble = true)
      def long(v: JValue): Option[Long] = v match {
        case JInt(i) => Some(i.toLong)
        case JLong(l) => Some(l)
        case JDecimal(d) => Some(d.toLong)
        case _ => None
      }
      val rows = long(j \ "n")
      val bytes = long(j \ "b")
      val cols = j \ "c" match {
        case JObject(fields) => fields.map { case (k, v) =>
          k -> ColStats(
            decode(v \ "l"), decode(v \ "u"), long(v \ "z"),
            v \ "a" match { case JBool(b) => b; case _ => false })
        }.toMap
        case _ => Map.empty[String, ColStats]
      }
      val sorted = j \ "s" match {
        case JArray(vs) => vs.collect { case JString(s) => s }
        case _ => Nil
      }
      Some(FileStat(rows, bytes, cols, sorted))
    } catch { case _: Exception => None }
}
