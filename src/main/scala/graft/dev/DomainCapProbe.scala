package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** Skew probe for [[Corpus.domainCap]]: the heavy-hitter-domain shape
  * (one domain owns half the corpus — every web crawl has one), with a
  * ~1 KB text payload per row so shuffle volume is realistic.
  *
  * What it established: Spark ≥ 3.5 rewrites the rank filter into a
  * Partial WindowGroupLimit before the exchange, so the window form's
  * shuffle stays at MBs (not the corpus) and the straggler task stays
  * bounded under 10%→90% hot-domain skew — the naive-looking
  * formulation is already scale-safe, and it needs no session config.
  * The explicit bounded-heap variant ([[Corpus.domainCapViaHeap]]) is
  * slightly faster steady-state (round 2 here) but depends on the
  * objectHashAggregate fallback threshold; both must keep the exact
  * same id set.
  *
  * Run: sbt "runMain graft.dev.DomainCapProbe 5000000 1000 100 5"
  */
object DomainCapProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20_000_000L)
    val domains = args.lift(1).map(_.toInt).getOrElse(1000)
    val n = args.lift(2).map(_.toInt).getOrElse(100)
    // tenths of the corpus owned by the hot domain (default 5 = 50%)
    val hotTenths = args.lift(3).map(_.toInt).getOrElse(5)
    val localDir = s"target/spark-local-probe-${ProcessHandle.current().pid()}"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .config("spark.sql.adaptive.enabled", "true")
      // without this the TypedImperativeAggregate partial agg falls back
      // to SORT-BASED aggregation at 128 distinct keys (the default) and
      // the heap path degenerates into the very window sort it replaces
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // hotTenths/10 of the rows land in domain 0; the rest spread
    // uniformly. The ~1 KB text payload is the point: a corpus row is
    // wide, and what separates the two plans at 100 TB is whether that
    // payload crosses the network.
    val df = spark.range(rows).select(
      col("id"),
      when(pmod(col("id"), lit(10)) < hotTenths, lit(0))
        .otherwise(pmod(col("id"), lit(domains)).cast("int")).as("domain"),
      xxhash64(col("id")).as("quality"),
      repeat(concat(lit("doc"), col("id"), lit(" ")), 64).as("text"))
      .cache()
    df.count()

    // what a 1000-executor cluster's wall-clock follows is the LONGEST
    // task, not the local[32] total: track it per measured block
    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          maxTask.getAndAccumulate(e.taskInfo.duration, math.max)
          val m = e.taskMetrics
          if (m != null)
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      })

    def timed(tag: String)(f: => Long): Long = {
      maxTask.set(0); shuffleBytes.set(0)
      val t0 = System.nanoTime()
      val out = f
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $tag%-24s $wall%8.2fs  maxTask=${maxTask.get / 1e3}%6.2fs  " +
        f"shuffle=${shuffleBytes.get / 1048576.0}%9.1fMB  kept=$out")
      out
    }

    // two rounds: round 1 pays JIT warmup, read round 2
    var winKept = 0L; var heapKept = 0L
    for (round <- 1 to 2) {
      winKept = timed(s"window_group_limit r$round") {
        Corpus.domainCap(df, "id", "domain", "quality", n).count()
      }
      heapKept = timed(s"heap_variant r$round") {
        Corpus.domainCapViaHeap(df, "id", "domain", "quality", n).count()
      }
    }
    require(heapKept == winKept, s"kept-set size diverged: $heapKept vs $winKept")
    // full id-set equality, not just counts
    val diff = Corpus.domainCap(df, "id", "domain", "quality", n)
      .select("id")
      .exceptAll(Corpus.domainCapViaHeap(df, "id", "domain", "quality", n)
        .select("id"))
      .count()
    require(diff == 0, s"kept-id sets diverged by $diff rows")
    println(s"[probe] kept-id sets identical ($heapKept rows)")
    spark.stop()
  }
}
