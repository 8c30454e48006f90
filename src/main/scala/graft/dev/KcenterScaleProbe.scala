package graft.dev

import org.apache.spark.sql.SparkSession

import graft.operators.Coreset

/** Scale shape of greedy k-center: per-round cost must stay one
  * shuffle-free scan + a TakeOrdered reduce, so doubling rows should
  * ~double round time and k only multiplies linearly. Measures k=12 at
  * 250k/500k/1M × 64 and prints per-round seconds. */
object KcenterScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq(250000L, 500000L, 1000000L)) {
      val df = graft.sources.RandomDataset.vectors(spark, n, 64, seed = 9).cache()
      df.count()
      val t0 = System.nanoTime()
      val sel = Coreset.kCenterGreedy(df, k = 12).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[kcenter] n=$n%8d k=12 total ${secs}%6.2f s  (${secs / 12}%5.2f s/round, last radius ${sel.last.getDouble(2)}%.4f)")
      df.unpersist()
    }
    spark.stop()
  }
}
