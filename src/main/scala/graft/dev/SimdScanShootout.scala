package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** scalar vs SIMD flat-scan kernels, interleaved min-of-reps (see
  * dev/Sq8ScanShootout for why interleaving is mandatory on this box):
  * exact full scan at the random and msmarco baseline shapes. */
object SimdScanShootout {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()
    println(s"vectorKernel=${SimdDist.vectorKernel.isDefined}")
    for ((name, n, dims, nQ) <- Seq(("random", 20000, 64, 256),
      ("msmarco", 100000, 384, 70))) {
      val train = RandomDataset.vectors(spark, n, dims, 42).cache()
      val test = RandomDataset.vectors(spark, nQ, dims, 43)
        .withColumnRenamed("id", "qid").cache()
      train.count(); test.count()
      val artifact = BruteForceIndexer().build(train)
      val searcher = LinearSearcher("l2")
      def once(): Unit = { searcher.search(artifact, test, 20).collect(); () }
      def withFlag(on: Boolean)(f: => Unit): Unit = {
        if (on) System.setProperty("graft.scan.simd", "true")
        try f finally System.clearProperty("graft.scan.simd")
      }
      withFlag(false)(once()); withFlag(true)(once()) // warm both
      var bestOff = Double.MaxValue
      var bestOn = Double.MaxValue
      (1 to 12).foreach { _ =>
        val t0 = System.nanoTime(); withFlag(false)(once())
        bestOff = math.min(bestOff, (System.nanoTime() - t0) / 1e6)
        val t1 = System.nanoTime(); withFlag(true)(once())
        bestOn = math.min(bestOn, (System.nanoTime() - t1) / 1e6)
      }
      println(f"$name%-8s scalar=$bestOff%8.2fms simd=$bestOn%8.2fms " +
        f"speedup=${bestOff / bestOn}%.2fx")
      train.unpersist(); test.unpersist(); artifact.data.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
