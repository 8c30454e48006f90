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
    val rnd = new java.util.Random(7)
    val heaps = Array.fill(nQ) {
      val h = new BoundedTopK(k)
      (0 until 40).foreach(i => h.insert(i.toLong, rnd.nextDouble()))
      h
    }
    def t(label: String)(f: => Unit): Unit = {
      f; f
      var best = Double.MaxValue
      (1 to 20).foreach { _ =>
        val t0 = System.nanoTime(); f
        best = math.min(best, (System.nanoTime() - t0) / 1e6)
      }
      println(f"$label%-22s $best%8.3f ms (min-of-20)")
    }
    t("resultDf only")(LocalScan.resultDf(spark, qids, heaps))
    t("resultDf + collect")(LocalScan.resultDf(spark, qids, heaps).collect())
    // phase split: where do the milliseconds actually go?
    t("rows build only") {
      val out = qids.indices.iterator.flatMap { qi =>
        val h = heaps(qi)
        h.sorted.iterator.zipWithIndex.map { case ((id, d), pos) =>
          (qids(qi), pos + 1, id, d)
        }
      }.toSeq
      out.map(tu =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](tu._1, tu._2, tu._3, tu._4))): Unit
    }
    val df = LocalScan.resultDf(spark, qids, heaps)
    t("collect prebuilt df")(df.collect())
    t("analyzed")(df.queryExecution.analyzed)
    t("optimizedPlan") {
      LocalScan.resultDf(spark, qids, heaps).queryExecution.optimizedPlan: Unit
    }
    t("executedPlan") {
      LocalScan.resultDf(spark, qids, heaps).queryExecution.executedPlan: Unit
    }
    spark.stop()
  }
}
