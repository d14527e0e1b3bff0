package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{GraftCatalog, VersionedTable}

/** Sorted-file ordering reporting (`SupportsReportOrdering`): every
  * graft write that sorts its output (bucketed stage, clustering-on-
  * write, layout-preserving compaction) stamps the sort into the file's
  * manifest `#stats` line, and the DSv2 scan reports the resulting
  * per-partition order to Catalyst — so a storage-partitioned join of
  * two same-bucketed tables drops its per-partition SortExec on top of
  * SPJ's dropped exchanges, and the 100 TB fact-fact join plans as a
  * pure zero-shuffle merge (Iceberg write-order + SPJ parity). Footer
  * bounds can never prove inner sortedness, so only the committing
  * writer stamps the marker; every read-side gate fails toward "claim
  * nothing".
  */
class OrderingSpec extends SparkTestBase {
  import spark.implicits._

  private val wh = Files.createTempDirectory("ord").toString
  spark.conf.set("spark.sql.catalog.ord", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.ord.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS ord.ns")

  private def withSpj[A](body: => A): A = {
    val key = "spark.sql.sources.v2.bucketing.enabled"
    val prev = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    try body finally spark.conf.set(key, prev)
  }

  private def shuffles(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))

  // string-matched because collect() does not descend into
  // AdaptiveSparkPlanExec; "Sort [" can't match SortMergeJoin lines
  private def sorts(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Sort ["))

  /** Bucketed table fed in RANDOM row order — any sortedness in the
    * files comes from stage()'s within-bucket sort alone.
    */
  private def mk(name: String, rows: Int, seed: Int,
      offset: Long = 0L): String = {
    if (!spark.catalog.tableExists(s"ord.ns.$name"))
      spark.sql(s"CREATE TABLE ord.ns.$name (k BIGINT, v STRING) " +
        "TBLPROPERTIES ('graft.bucketBy'='k,4')")
    spark.range(rows).toDF("k").select((col("k") + offset).as("k"))
      .withColumn("v", format_string(s"$name-%d", col("k")))
      .orderBy(xxhash64(col("k"), lit(seed)))
      .write.format("graft-table").mode("append")
      .insertInto(s"ord.ns.$name")
    s"$wh/ns/$name"
  }

  /** Parsed `#stats` lines of the latest manifest. */
  private def statsOf(t: String)
      : Map[String, graft.sources.FileStats.FileStat] = {
    val (v, _) = VersionedTable.latest(spark, t)
    scala.io.Source.fromFile(s"$t/_commits/v${"%08d".format(v)}")
      .getLines().toSeq.filter(_.startsWith("#stats "))
      .map(_.stripPrefix("#stats "))
      .map(l => l.takeWhile(_ != ' ') -> l.dropWhile(_ != ' ').drop(1))
      .flatMap { case (n, j) =>
        graft.sources.FileStats.parse(j).map(n -> _) }
      .toMap
  }

  private def mergeJoin(a: String, b: String) = spark.sql(
    s"SELECT /*+ MERGE(y) */ x.k, y.v AS yv FROM ord.ns.$a x " +
      s"JOIN ord.ns.$b y ON x.k = y.k")

  test("single-file buckets: SPJ merge join plans ZERO exchanges and " +
      "ZERO sorts; result correct") {
    mk("fact", 2000, 1)
    mk("dim", 500, 2)
    withSpj {
      val j = mergeJoin("fact", "dim")
      assert(shuffles(j) === 0, j.queryExecution.executedPlan.toString)
      assert(sorts(j) === 0, j.queryExecution.executedPlan.toString)
      assert(j.count() === 500L)
      assert(j.where(col("k") === 123).head().getString(1) === "dim-123")
    }
  }

  test("overlapping multi-file buckets drop the claim (sorts return, " +
      "SPJ stays); layout-preserving compaction restores zero-sort") {
    val path = mk("multi", 800, 3)
    mk("multi", 800, 4) // second append, same key range — overlap
    withSpj {
      def j = mergeJoin("multi", "fact")
      assert(shuffles(j) === 0, "SPJ must survive multi-file buckets")
      assert(sorts(j) > 0,
        "overlapping per-bucket ranges cannot claim a concatenated sort")
      assert(j.count() === 1600L)
      VersionedTable.compact(spark, path, numFiles = 4)
      assert(sorts(j) === 0,
        "compaction re-sorts each bucket into one file — claim returns")
      assert(shuffles(j) === 0)
      assert(j.count() === 1600L)
    }
  }

  test("STRICTLY disjoint multi-file buckets keep the claim, and files " +
      "concatenate in min-bound order") {
    mk("disj", 1000, 5)                   // keys 0..999
    mk("disj", 1000, 6, offset = 1000L)   // keys 1000..1999 — disjoint
    withSpj {
      val j = mergeJoin("disj", "fact")
      assert(shuffles(j) === 0)
      assert(sorts(j) === 0,
        "disjoint per-bucket ranges certify the concatenated order:\n" +
          j.queryExecution.executedPlan.toString)
      // a MERGE join over a wrongly-claimed order would silently drop
      // matches — the exact count is the correctness proof
      assert(j.count() === 2000L)
      assert(j.where(col("k") === 1999).count() === 1L)
    }
  }

  test("ordering claim is field-id-keyed: column rename keeps the " +
      "zero-sort plan") {
    val path = mk("ren", 600, 7)
    VersionedTable.renameColumn(spark, path, "k", "key")
    withSpj {
      val j = spark.sql(
        "SELECT /*+ MERGE(y) */ x.key, y.v FROM ord.ns.ren x " +
          "JOIN ord.ns.ren y ON x.key = y.key")
      assert(shuffles(j) === 0)
      assert(sorts(j) === 0, "files sorted pre-rename must still claim " +
        "via their field-id marker:\n" +
        j.queryExecution.executedPlan.toString)
      assert(j.count() === 600L)
    }
  }

  test("clustered unbucketed appends stamp the marker; ORDER BY the " +
      "cluster key over one file needs no sort") {
    val t = Files.createTempDirectory("ordc").toString + "/t"
    VersionedTable.create(spark, t,
      new org.apache.spark.sql.types.StructType()
        .add("k", "long").add("v", "string"))
    VersionedTable.alterProperties(spark, t,
      Map(VersionedTable.ClusterByProperty -> "k"))
    VersionedTable.append(spark,
      spark.range(500).toDF("k")
        .withColumn("v", format_string("r-%d", col("k")))
        .orderBy(xxhash64(col("k"), lit(8))), t)
    val df = spark.read.format("graft-table").load(t).orderBy("k")
    // per-partition order is claimed; a single-partition global sort
    // over it is recognized as already satisfied
    val ordered = df.collect().map(_.getLong(0)).toSeq
    assert(ordered === (0L until 500L))
    val stats = statsOf(t)
    assert(stats.values.forall(_.sorted.nonEmpty),
      "every clustered append must stamp its write-time sort")
  }

  test("CTAS/RTAS with CLUSTER BY stamp the marker on the initial data " +
      "(no rewrite needed before ordering claims)") {
    spark.sql("CREATE TABLE ord.ns.ct CLUSTER BY (k) AS " +
      "SELECT id AS k, CAST(id AS STRING) AS v FROM range(300)")
    val ct = statsOf(s"$wh/ns/ct")
    assert(ct.nonEmpty && ct.values.forall(_.sorted.nonEmpty),
      s"CTAS initial files must carry the write-time sort marker: $ct")
    spark.sql("REPLACE TABLE ord.ns.ct CLUSTER BY (k) AS " +
      "SELECT id AS k, CAST(id AS STRING) AS v FROM range(400, 900)")
    val rt = statsOf(s"$wh/ns/ct")
    assert(rt.nonEmpty && rt.values.forall(_.sorted.nonEmpty),
      s"RTAS replacement files must carry the marker too: $rt")
    // and the marker resolves under the NEW schema's field ids: the
    // scan's ordering claim feeds a correct merge result
    assert(spark.sql("SELECT count(*) FROM ord.ns.ct").head().getLong(0)
      === 500L)
  }

  test("plain unsorted appends claim nothing") {
    val t = Files.createTempDirectory("ordp").toString + "/t"
    VersionedTable.append(spark,
      Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("k", "v"), t)
    val stats = statsOf(t)
    assert(stats.values.forall(_.sorted.isEmpty))
  }
}
