package graft.dev

import org.apache.spark.sql.SparkSession

import graft.operators.{BoundedTopK, LocalScan}

/** Cost of turning per-query heaps into the canonical result DataFrame
  * and collecting it — the fixed tail every driver-local search pays.
  * 256 queries × k=20 = 5,120 rows, the baseline batch shape. */
object ResultDfMicro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nQ = 256; val k = 20
    val qids = Array.tabulate(nQ)(_.toLong)
    // resultDf drains its heaps (packed-row rewrite), so every timed call
    // gets a fresh set; the build is part of no timed phase
    def freshHeaps(): Array[BoundedTopK] = {
      val rnd = new java.util.Random(7)
      Array.fill(nQ) {
        val h = new BoundedTopK(k)
        (0 until 40).foreach(i => h.insert(i.toLong, rnd.nextDouble()))
        h
      }
    }
    var heaps = freshHeaps()
    def t(label: String)(f: => Unit): Unit = {
      f; f
      var best = Double.MaxValue
      (1 to 20).foreach { _ =>
        val t0 = System.nanoTime(); f
        best = math.min(best, (System.nanoTime() - t0) / 1e6)
      }
      println(f"$label%-22s $best%8.3f ms (min-of-20)")
    }
    t("resultDf only") {
      heaps = freshHeaps(); LocalScan.resultDf(spark, qids, heaps)
    }
    t("resultDf + collect") {
      heaps = freshHeaps(); LocalScan.resultDf(spark, qids, heaps).collect()
    }
    t("heap rebuild only") { heaps = freshHeaps() }
    val df = LocalScan.resultDf(spark, qids, freshHeaps())
    t("collect prebuilt df")(df.collect())
    t("analyzed")(df.queryExecution.analyzed)
    t("optimizedPlan") {
      LocalScan.resultDf(spark, qids, freshHeaps())
        .queryExecution.optimizedPlan: Unit
    }
    t("executedPlan") {
      LocalScan.resultDf(spark, qids, freshHeaps())
        .queryExecution.executedPlan: Unit
    }
    spark.stop()
  }
}
