package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** Is the exact CoverTree feasible at the msmarco shape (100k × 384-d,
  * hardened stand-in)? The reference publishes this row (1.0000 recall /
  * 5.76 QPS / 4,388 s build — benchmark_summary.md:49) but
  * BaselineCompare has excluded it since r7 on watchdog grounds. Prints
  * build + search so the exclusion can be revisited with data. */
object CoverTreeMsmarcoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()
    val n = if (args.length > 0) args(0).toInt else 100000
    // msmarco stand-in config from BaselineCompare.workloads: clustered
    // (512 centers, sigma 1.2, intrinsicDim 64), overlap 0.7, normalized
    val train = RandomDataset.clusteredVectors(spark, n, 384, 512, 1.2, 42,
        centerSeed = 7, intrinsicDim = 64, overlap = 0.7)
      .withColumn("vector", graft.functions.VectorFunctions.vec_normalize(col("vector")))
      .cache()
    val test = RandomDataset.clusteredVectors(spark, 70, 384, 512, 1.2, 43,
        centerSeed = 7, intrinsicDim = 64, overlap = 0.7)
      .withColumnRenamed("id", "qid")
      .withColumn("vector", graft.functions.VectorFunctions.vec_normalize(col("vector")))
      .cache()
    train.count(); test.count()
    // JIT warm like prepOne does
    val warm = CoverTreeIndexer("l2").build(train.limit(2000))
    warm.data.unpersist()
    val t0 = System.nanoTime()
    val artifact = CoverTreeIndexer("l2").build(train)
    artifact.data.cache().count()
    println(f"build n=$n: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val searcher = CoverTreeSearcher("l2")
    searcher.search(artifact, test, 20).collect()
    (1 to 3).foreach { i =>
      val t1 = System.nanoTime()
      val res = searcher.search(artifact, test, 20).collect()
      println(f"search 70q rep$i: ${(System.nanoTime() - t1) / 1e6}%.0fms " +
        f"qps=${70e9 / (System.nanoTime() - t1)}%.0f rows=${res.length}")
    }
    spark.stop()
  }
}
