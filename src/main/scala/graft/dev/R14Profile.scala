package graft.dev

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** r14 optimization-round probe: per-query JOB-LEVEL time attribution.
  *
  * At the bench scale (sf0.1: 5k docs / 2k embeddings / 600k lineitem) a
  * gate's wall-clock is dominated by fixed per-job costs (planning,
  * codegen, stage scheduling, driver collects between jobs), not by data
  * volume — so the first question for every slow gate is "how many Spark
  * jobs does it launch, and where are the gaps where the driver computes
  * alone?". This probe answers exactly that: for each named query it
  * replays the bench methodology (same session confs, warmFixtures, one
  * untimed warm pass, then a timed pass) and prints every job with its
  * duration plus the DRIVER GAP since the previous job ended — gaps are
  * planning/codegen/driver-side model work; job time is cluster work.
  *
  * Usage: runMain graft.dev.R14Profile <dir> <q1,q2,...> [reps=1]
  */
object R14Profile {
  final case class JobRec(id: Int, start: Long, var end: Long,
      var nStages: Int, var nTasks: Int, desc: String)

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PART", "64k"))
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new ConcurrentLinkedQueue[JobRec]()
    @volatile var recording = false
    spark.sparkContext.addSparkListener(new SparkListener {
      private val byId = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
      override def onJobStart(js: SparkListenerJobStart): Unit = if (recording) {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val rec = JobRec(js.jobId, js.time, 0L, js.stageInfos.size,
          js.stageInfos.map(_.numTasks).sum, desc.take(60))
        byId.put(js.jobId, rec); jobs.add(rec)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = byId.get(je.jobId)
        if (r != null) r.end = je.time
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = ()
    })

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    materialize(spark.range(1000).toDF("id"))
    graft.Tables.names.foreach { t =>
      try materialize(graft.Tables.load(spark, dir, t).limit(1))
      catch { case _: Throwable => () }
    }
    try SparkEntry.warmFixtures(spark, dir)
    catch { case e: Throwable =>
      System.err.println(s"[r14profile] warmFixtures failed: ${e.getMessage}") }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm pass (codegen cache, JIT) — mirrors the bench's min-of-2
      val tw0 = System.nanoTime()
      try materialize(fn(spark, dir))
      catch { case e: Throwable =>
        System.err.println(s"[r14profile] $name warm FAILED: ${e.getMessage}")
      }
      val warmS = (System.nanoTime() - tw0) / 1e9
      spark.catalog.clearCache(); System.gc()
      (1 to reps).foreach { rep =>
        jobs.clear()
        recording = true
        val t0 = System.nanoTime()
        try materialize(fn(spark, dir))
        catch { case e: Throwable =>
          System.err.println(s"[r14profile] $name FAILED: ${e.getMessage}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        recording = false
        val t0ms = t0 / 1000000L
        val recs = jobs.toArray(Array.empty[JobRec]).sortBy(_.start)
        println(f"== $name rep$rep total ${sec}%7.3f s (warm pass was ${warmS}%.3f s), ${recs.length} jobs")
        var prevEnd = t0ms
        var jobSum = 0L
        var gapSum = 0L
        recs.foreach { r =>
          val gap = math.max(0L, r.start - prevEnd)
          val dur = math.max(0L, r.end - r.start)
          jobSum += dur; gapSum += gap
          println(f"   job ${r.id}%4d  gap ${gap / 1000.0}%6.3f  run ${dur / 1000.0}%6.3f  stages ${r.nStages}%2d tasks ${r.nTasks}%4d  ${r.desc}")
          prevEnd = math.max(prevEnd, r.end)
        }
        val tail = math.max(0L, (System.nanoTime() / 1000000L) - prevEnd)
        println(f"   == jobs ${jobSum / 1000.0}%6.3f s + gaps ${gapSum / 1000.0}%6.3f s + tail ${tail / 1000.0}%6.3f s")
        spark.catalog.clearCache(); System.gc()
      }
    }
    spark.stop()
  }
}
