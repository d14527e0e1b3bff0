package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch profiler for the r16 lifecycle investigation: runs dq8's
  * exact op sequence with a wall-clock stamp per VersionedTable op.
  * (Deleted at round close if no longer needed.)
  */
object ProfileLifecycle {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.put(js.jobId, js.time); ()
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.get(je.jobId)).foreach { t0 =>
            System.err.println(
              f"  [job] ${je.jobId}%4d ${(je.time - t0) / 1000.0}%7.3f s")
          }
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val i = sc.stageInfo
          val dt = (for { a <- i.completionTime; b <- i.submissionTime }
            yield (a - b) / 1000.0).getOrElse(-1.0)
          System.err.println(
            f"  [stage] ${i.stageId}%4d $dt%7.3f s tasks=${i.numTasks}%3d ${i.name.take(70)}")
        }
      })
    def run(tag: String): Unit = {
      var t0 = System.nanoTime()
      def mark(op: String): Unit = {
        val t1 = System.nanoTime()
        System.err.println(f"[$tag] $op%-22s ${(t1 - t0) / 1e9}%7.3f s")
        t0 = t1
      }
      val s = spark
      val ev = graft.sources.LakeReader.table(s, sfDir, "events")
        .where(col("event_id").isNotNull)
        .select(col("event_id"), col("event_type"),
          col("value").cast(DoubleType).as("value"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_dq8prof").toString
      val src = root + "/src"
      val dst = root + "/dst"
      val vt = graft.sources.VersionedTable
      mark("setup")
      vt.create(s, src, StructType(Seq(
        StructField("event_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType))))
      mark("create")
      vt.alterProperties(s, src, Map(vt.CdcProperty -> "true"))
      mark("alterProps")
      vt.append(s, ev.where(col("event_id") % 2 === 0), src)
      mark("append1")
      vt.append(s, ev.where(col("event_id") % 2 === 1), src)
      mark("append2")
      vt.upsert(s, ev.where(col("event_id") % 100 === 3)
        .withColumn("value", lit(0.0)), src, "event_id")
      mark("upsert")
      vt.deleteByKeys(s, src,
        ev.where(col("event_id") % 7 === 0).select("event_id"))
      mark("deleteByKeys")
      val q = graft.streaming.VersionedSink.startReplicateCDF(s,
        src, dst, "dq8-mirror", "event_id", root + "/ckpt")
      q.awaitTermination(300000)
      mark("mirrorCDF")
      val a = vt.read(s, src).select(col("event_id"), lit(1L).as("pa"),
        col("event_type").as("ta"), col("value").as("va"))
      mark("read-src-plan")
      a.count()
      mark("read-src-count")
      val b = vt.read(s, dst).select(col("event_id"), lit(1L).as("pb"),
        col("event_type").as("tb"), col("value").as("vb"))
      mark("read-dst-plan")
      b.count()
      mark("read-dst-count")
      val out = a.join(b, Seq("event_id"), "full_outer")
        .agg(count(col("pa")).as("n_src"), count(col("pb")).as("n_dst"))
        .localCheckpoint(true)
      out.count()
      mark("join-agg")
    }
    run("warm")
    run("timed")
    spark.stop()
  }
}
