package graft.sources

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ColumnChunkMetaData
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.sources._

/** Plan-time file skipping for EQUALITY predicates via PARQUET-NATIVE
  * bloom filters — the complement of the manifest min/max bounds
  * ([[FileStats]]): bounds prune range predicates on clustered data;
  * blooms prune point lookups on HIGH-CARDINALITY columns where every
  * file's [min, max] overlaps (the needle-in-100 TB shape: "find this
  * doc_id / user / fingerprint" over an unclustered corpus).
  *
  * The filters live INSIDE the data files (written by the standard
  * parquet writer when the `graft.bloom.columns` table property is set
  * at [[VersionedTable]] stage time), so they cost nothing in the
  * manifest, survive compaction rewrites automatically, and any other
  * parquet reader (Spark, Trino, Iceberg converts) sees the same
  * structures. The probe reads the file FOOTER + one bloom header page
  * per (row group, column) — no data pages — and only runs on files the
  * min/max pass already kept, on tables that opted in.
  *
  * Soundness: a file is dropped ONLY when every row group carries a
  * bloom for the column and none contains the probed value's hash.
  * Missing blooms, unknown columns, type mismatches, or any IO error
  * answer "may match". Spark re-evaluates all filters above the scan,
  * so skipping can only prune, never change a result.
  */
private[graft] object BloomSkip {

  /** A conjunct of disjunctive probes: the file must possibly contain at
    * least one `(column, value)` of each inner Seq. Built by
    * [[probesOf]] from the pushed filters — `EqualTo` gives a 1-element
    * disjunction, a small `In` gives one per value.
    */
  type Probes = Seq[Seq[(String, Any)]]

  /** In-sets beyond this size answer "may match" without probing (the
    * FileStats.InProbeMax rationale, tighter because each probe is a
    * bloom-page read, not an in-memory compare).
    */
  private val InProbeMax = 16

  /** Extract bloom-answerable probes from pushed filters, restricted to
    * `bloomCols` (lower-cased simple column names). Only top-level
    * conjuncts prune — `Or`/`Not` trees answer "may match" (sound).
    */
  def probesOf(filters: Seq[Filter], bloomCols: Set[String]): Probes = {
    def colOf(a: String): Option[String] = {
      val n = a.toLowerCase(java.util.Locale.ROOT)
      if (bloomCols.contains(n)) Some(n) else None
    }
    filters.flatMap {
      case EqualTo(a, v) if v != null =>
        colOf(a).map(c => Seq(c -> v))
      case EqualNullSafe(a, v) if v != null =>
        colOf(a).map(c => Seq(c -> v))
      case In(a, vs)
          if vs != null && vs.nonEmpty && vs.length <= InProbeMax &&
            !vs.contains(null) =>
        colOf(a).map(c => vs.toSeq.map(c -> _))
      case And(l, r) =>
        probesOf(Seq(l), bloomCols) ++ probesOf(Seq(r), bloomCols)
      case _ => Nil
    }
  }

  /** [[fileMayMatch]] over a file list, order-preserving, probed with a
    * bounded thread pool: a point lookup on an UNCLUSTERED column is
    * exactly the case where min/max keeps every file, so the probe set
    * can be the whole snapshot — serial footer reads would make
    * planning O(files) in wall-clock on a 100k-file table. 16 in-flight
    * probes bound both the speedup and the driver file-handle pressure.
    */
  def filterFiles(conf: Configuration, table: String, files: Seq[String],
      probes: Probes): Seq[String] = {
    if (probes.isEmpty || files.isEmpty) return files
    if (files.sizeIs <= 2)
      return files.filter(n => fileMayMatch(conf, new Path(table, n), probes))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, files.size))
    try {
      val futs = files.map { n =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          override def call(): Boolean =
            fileMayMatch(conf, new Path(table, n), probes)
        })
      }
      files.zip(futs).collect { case (n, f) if f.get() => n }
    } finally pool.shutdown()
  }

  /** May `file` satisfy every probe conjunct? Opens the reader ONCE and
    * probes all conjuncts against each row group's blooms.
    */
  def fileMayMatch(conf: Configuration, file: Path,
      probes: Probes): Boolean = {
    if (probes.isEmpty) return true
    try {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        val blocks = r.getRowGroups.asScala.toSeq
        // every conjunct must be possible in SOME row group
        probes.forall { alts =>
          blocks.isEmpty || blocks.exists { b =>
            val reader = r.getBloomFilterDataReader(b)
            val byPath = b.getColumns.asScala.map(c =>
              c.getPath.toDotString
                .toLowerCase(java.util.Locale.ROOT) -> c).toMap
            alts.exists { case (c, v) =>
              byPath.get(c) match {
                case None => true // column absent/renamed: cannot prune
                case Some(cc) =>
                  val bloom = reader.readBloomFilter(cc)
                  if (bloom == null) true
                  else hashOf(bloom, cc, v) match {
                    case Some(h) => bloom.findHash(h)
                    case None => true // unprobeable type: cannot prune
                  }
              }
            }
          }
        }
      } finally r.close()
    } catch { case NonFatal(_) => true }
  }

  /** Hash `v` the way the file's writer hashed column values — only for
    * (physical type, filter value) pairs where the parquet-written
    * representation is unambiguous. Everything else (decimals, dates,
    * timestamps with their logical-type encodings) returns None → "may
    * match": correctness never depends on getting an encoding right.
    */
  private def hashOf(
      bloom: org.apache.parquet.column.values.bloomfilter.BloomFilter,
      cc: ColumnChunkMetaData, v: Any): Option[Long] = {
    val logical = cc.getPrimitiveType.getLogicalTypeAnnotation
    def plainInt = logical == null ||
      logical.isInstanceOf[org.apache.parquet.schema
        .LogicalTypeAnnotation.IntLogicalTypeAnnotation]
    def isString = logical != null &&
      logical.isInstanceOf[org.apache.parquet.schema
        .LogicalTypeAnnotation.StringLogicalTypeAnnotation]
    (cc.getPrimitiveType.getPrimitiveTypeName, v) match {
      case (INT64, x: java.lang.Long) if plainInt =>
        Some(bloom.hash(x.longValue))
      case (INT32, x: java.lang.Integer) if plainInt =>
        Some(bloom.hash(x.intValue))
      case (INT32, x: java.lang.Short) if plainInt =>
        Some(bloom.hash(x.intValue))
      case (INT32, x: java.lang.Byte) if plainInt =>
        Some(bloom.hash(x.intValue))
      case (BINARY, s: String) if isString =>
        Some(bloom.hash(Binary.fromString(s)))
      case (DOUBLE, x: java.lang.Double) => Some(bloom.hash(x.doubleValue))
      case (FLOAT, x: java.lang.Float) => Some(bloom.hash(x.floatValue))
      case _ => None
    }
  }
}
