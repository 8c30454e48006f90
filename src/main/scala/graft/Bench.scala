package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Timing forces full materialization of the physical plan
  * (`toRdd.foreachPartition`) rather than `count()`, which Catalyst would
  * optimize into a scan-only plan and under-report operator cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop sink = full optimized execution (AQE, TakeOrderedAndProject)
    // with the rows actually produced but not written anywhere
    def materialize(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // session warm-up so the first measured query doesn't absorb executor
    // bootstrap, first-parquet-footer reads, and codegen compiler init
    materialize(spark.range(1000).toDF("id"))
    graft.Tables.names.foreach { t =>
      try materialize(graft.Tables.load(spark, sfDir, t).limit(1))
      catch { case _: Throwable => () }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try materialize(fn(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // isolate queries from each other: drop caches a query created and
      // nudge the collector so earlier queries' garbage doesn't bill here
      spark.catalog.clearCache()
      System.gc()
      System.err.println(f"[bench] $name%-24s ${sec}%8.2fs")
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // reference-baseline comparison table (recall/QPS per algorithm vs
    // BASELINE.md) — extra artifact data, NOT part of the total. Each
    // algorithm carries its own watchdog inside BaselineCompare (canceled
    // job group on overrun), so a wedged algorithm costs its own entry,
    // not the round's BENCH artifact; partial results still land.
    val baseline =
      if (sys.env.getOrElse("SPARK_GRAFT_BASELINE", "1") == "0") "{}"
      else
        try {
          val entries = graft.harness.BaselineCompare.run(spark)
          entries.foreach(e => System.err.println(
            f"[baseline] ${e.algo}%-10s recall=${e.recall}%.4f qps=${e.qps}%.0f " +
              f"build=${e.buildS}%.2fs (ref ${e.refRecall}%.4f/${e.refQps}%.0f)"))
          graft.harness.BaselineCompare.json(entries)
        } catch { case e: Throwable =>
          System.err.println(s"[baseline] skipped: ${e.getMessage}")
          "{}"
        }
    // Stop BEFORE printing the artifact line: a noisy shutdown (e.g. a
    // blockmgr temp-dir delete failing under /tmp) must never land its
    // stack trace after the JSON line — the driver reads the output TAIL,
    // and round 2 lost its artifact exactly that way.
    try spark.stop()
    catch { case e: Throwable =>
      System.err.println(s"[bench] spark.stop failed (ignored): ${e.getMessage}")
    }
    System.err.flush()
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"baseline":$baseline,"sf":"$sfDir"}""")
  }
}
