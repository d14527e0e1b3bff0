package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.types._

/** Answers whole-table aggregates from the manifest's `#stats` lines at
  * PLAN time: an unfiltered, ungrouped `COUNT(*)` / `COUNT(col)` /
  * `MIN(col)` / `MAX(col)` over a graft table becomes ONE driver-side
  * row and the scan launches zero tasks — the "metadata-only query" of
  * Iceberg (manifest metrics) and Delta (stats-backed OPTIMIZE
  * metadata queries), served by the same per-file bounds that drive
  * file skipping. On a 100 TB table this turns the most common
  * freshness checks (`SELECT count(*)`, `SELECT max(event_ts)`) from a
  * full scan into a manifest read.
  *
  * Soundness gates — any miss returns None and the query runs as a
  * normal scan, so pushdown can never change an answer:
  *  - no grouping, and Spark pushed no predicates (a residual filter
  *    means rows must be re-evaluated — the caller refuses);
  *  - no pending merge-on-read delete layer: footer stats count rows
  *    the layers have logically deleted;
  *  - EVERY snapshot file carries parsed stats with the needed fields
  *    (absent/corrupt stats lines make the file unknowable);
  *  - MIN/MAX only for types whose recorded bounds are EXACT data
  *    values: integer family, date, decimal, boolean, and
  *    micros-precision timestamps (every graft writer stages int64
  *    TIMESTAMP_MICROS). Strings never push (bounds may be truncated
  *    prefixes), nor do float/double (parquet drops NaN from stats,
  *    while Spark orders NaN greatest).
  */
private[sources] object StatsAggregate {

  /** Aggregate-output schema + the final rows, or None when any gate
    * fails. Ungrouped → one row; `GROUP BY _commit_version` (the
    * metadata partition column — every file belongs to exactly one
    * commit) → one row per version with rows, schema = group column ++
    * aggregates, matching Spark's pushed-aggregate scan-output
    * convention. Field order matches `agg.aggregateExpressions` — Spark
    * maps scan output to aggregate results positionally.
    */
  def plan(agg: Aggregation, dataSchema: StructType, files: Seq[String],
      stats: Map[String, FileStats.FileStat], hasDeleteLayers: Boolean,
      fileVersions: => Option[Map[String, Long]] = None)
      : Option[(StructType, Array[InternalRow])] = {
    if (hasDeleteLayers) return None
    // grouping: none, or exactly the _commit_version metadata column —
    // the one column whose value is constant per FILE, so per-file stats
    // aggregate exactly within each group
    val groupByVersion = agg.groupByExpressions.toSeq match {
      case Nil => false
      case Seq(r: NamedReference) if r.fieldNames.length == 1 &&
          r.fieldNames.head.equalsIgnoreCase(GraftTableScan.VersionCol) =>
        true
      case _ => return None
    }
    val perFile = files.map(f => stats.get(f).map(f -> _))
    if (perFile.exists(_.isEmpty)) return None
    // zero-row files (a rewrite can empty a file out) contribute nothing
    // to any aggregate and carry no bounds — drop them from the fold
    // (for grouped mode this also drops empty GROUPS, matching a real
    // scan, where a version with no surviving rows yields no group)
    val named = perFile.flatten.filterNot(_._2.rows.contains(0L))
    val keys = FileStats.lookupKeys(dataSchema)

    def field(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[StructField] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        dataSchema.fields.find(_.name.equalsIgnoreCase(r.fieldNames.head))
      case _ => None
    }

    /** fold the aggregate list over one file subset (the whole snapshot,
      * or one version's files)
      */
    def fold(sts: Seq[FileStats.FileStat])
        : Option[Seq[(DataType, Boolean, Any)]] = {
      /** every file's stats entry for `f`, or None if any file lacks one
        * (schema evolution can leave old files without the column —
        * their values read as null, but stats can't distinguish that
        * from an unusable bound, so the whole pushdown bails)
        */
      def colStats(f: StructField): Option[Seq[FileStats.ColStats]] = {
        val ks = keys.getOrElse(f.name, Seq("n" + f.name))
        val per = sts.map(s => ks.iterator.flatMap(s.cols.get).nextOption())
        if (per.exists(_.isEmpty)) None else Some(per.flatten)
      }
      def rowCount: Option[Long] =
        if (sts.exists(_.rows.isEmpty)) None
        else Some(sts.flatMap(_.rows).sum)

      def countStar: Option[(DataType, Boolean, Any)] =
        rowCount.map(n => (LongType, false, n))

      def countCol(f: StructField): Option[(DataType, Boolean, Any)] =
        for {
          total <- rowCount
          cs <- colStats(f)
          nulls <- if (cs.exists(_.nulls.isEmpty)) None
                   else Some(cs.flatMap(_.nulls).sum)
        } yield (LongType, false, total - nulls)

      /** fold bounds across files; Some(None) = a genuinely empty/all-null
        * column (SQL MIN/MAX = null), None = unknowable
        */
      def bound(f: StructField, isMax: Boolean)
          : Option[(DataType, Boolean, Any)] = {
        if (!exactBounds(f.dataType)) return None
        colStats(f).flatMap { cs =>
          val valued = cs.filterNot(_.allNull)
          val sides = valued.map(s => if (isMax) s.max else s.min)
          if (sides.exists(_.isEmpty)) None // poisoned/omitted bound
          else {
            val vs = sides.flatten
            val folded: Option[Option[Any]] =
              if (vs.isEmpty) Some(None) // zero rows or all null
              else vs.tail.foldLeft(Option(vs.head)) { (acc, b) =>
                acc.flatMap(a => FileStats.cmp(a, b).map(c =>
                  if (isMax == (c >= 0)) a else b))
              }.map(Some(_))
            folded.flatMap {
              case None => Some((f.dataType, true, null))
              case Some(v) => internal(f.dataType, v)
                .map(iv => (f.dataType, true, iv))
            }
          }
        }
      }

      val out = agg.aggregateExpressions.toSeq.map {
        case _: CountStar => countStar
        case c: Count if !c.isDistinct => field(c.column).flatMap(countCol)
        case m: Min => field(m.column).flatMap(bound(_, isMax = false))
        case m: Max => field(m.column).flatMap(bound(_, isMax = true))
        case _ => None
      }
      if (out.exists(_.isEmpty) || out.isEmpty) None else Some(out.flatten)
    }

    if (!groupByVersion) {
      fold(named.map(_._2)).map { resolved =>
        val schema = StructType(resolved.zipWithIndex.map {
          case ((dt, nullable, _), i) => StructField(s"agg_$i", dt, nullable)
        })
        (schema, Array[InternalRow](new GenericInternalRow(
          resolved.map(_._3).toArray[Any])))
      }
    } else {
      fileVersions.flatMap { fv =>
        if (named.exists { case (f, _) => !fv.contains(f) }) None
        else {
          val groups = named.groupBy { case (f, _) => fv(f) }.toSeq
            .sortBy(_._1) // deterministic row order
          val folded = groups.map { case (v, fs) =>
            fold(fs.map(_._2)).map(v -> _)
          }
          // schema types come from a fold of the EMPTY subset (pure type
          // derivation) so an all-empty snapshot still yields a correct
          // zero-row scan schema
          val typeRow = fold(Nil)
          if (folded.exists(_.isEmpty) || typeRow.isEmpty) None
          else {
            val rows = folded.flatten
            // schema convention: group column first, then aggregates
            val aggFields = typeRow.get.zipWithIndex.map {
              case ((dt, nullable, _), i) =>
                StructField(s"agg_$i", dt, nullable) }
            val schema = StructType(
              StructField(GraftTableScan.VersionCol, LongType,
                nullable = false) +: aggFields)
            Some((schema, rows.map { case (v, res) =>
              new GenericInternalRow(
                (v +: res.map(_._3)).toArray[Any]): InternalRow
            }.toArray))
          }
        }
      }
    }
  }

  /** Types whose manifest bounds are exact data values (see class doc). */
  private def exactBounds(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        BooleanType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Comparison-domain value -> Spark internal value of `dt`; None on
    * any mismatch (overflow, scale change) — bail, never approximate.
    */
  private def internal(dt: DataType, v: Any): Option[Any] =
    try (dt, v) match {
      case (BooleanType, b: java.lang.Boolean) => Some(b.booleanValue)
      case (ByteType, d: BigDecimal) => Some(d.toByteExact)
      case (ShortType, d: BigDecimal) => Some(d.toShortExact)
      case (IntegerType, d: BigDecimal) => Some(d.toIntExact)
      case (LongType, d: BigDecimal) => Some(d.toLongExact)
      case (DateType, d: BigDecimal) => Some(d.toIntExact)
      case (TimestampType, d: BigDecimal) => Some(d.toLongExact)
      case (TimestampNTZType, d: BigDecimal) => Some(d.toLongExact)
      case (t: DecimalType, d: BigDecimal) =>
        val dec = Decimal(d)
        if (dec.changePrecision(t.precision, t.scale)) Some(dec) else None
      case _ => None
    } catch { case _: ArithmeticException => None }
}
