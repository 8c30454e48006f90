package graft.dev

import org.apache.spark.sql.SparkSession

import graft.operators.Coreset

/** Scale shape of greedy k-center: per-round cost must stay one
  * shuffle-free scan + a TakeOrdered reduce, so doubling rows should
  * ~double round time and k only multiplies linearly. Measures k=12 at
  * 250k/500k/1M × 64 and prints per-round seconds; then the batch
  * variant at large k — per-PASS cost should stay ~flat as `b` grows
  * (the min-update folds b distances into the same single scan), so
  * per-CENTER cost drops ~b× — the large-k (k ≈ 10⁴ at 100 TB) knob. */
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
    // batch variant: same corpus, k=256 centers at growing batch sizes
    val df = graft.sources.RandomDataset.vectors(spark, 1000000L, 64, seed = 9).cache()
    df.count()
    for (b <- Seq(1, 8, 32, 64)) {
      val k = 256
      val passes = math.ceil(k.toDouble / b).toInt
      val t0 = System.nanoTime()
      val sel = Coreset.kCenterBatch(df, k, b).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[kcenter-batch] n=1000000 k=$k b=$b%3d total ${secs}%7.2f s  " +
        f"(${secs / passes}%5.2f s/pass over $passes%3d passes, " +
        f"${secs / sel.length * 1000}%6.1f ms/center, last radius ${sel.last.getDouble(2)}%.4f)")
    }
    df.unpersist()
    spark.stop()
  }
}
