package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** Is the driver-parallel HnswGlobal build feasible at the msmarco shape
  * (100k × 384-d)? Prints build + search + recall so BaselineCompare's
  * exclusion can be revisited with data. */
object HnswMsmarcoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()
    val train = RandomDataset.vectors(spark, 100000, 384, 42)
      .withColumn("vector", graft.functions.VectorFunctions.vec_normalize(col("vector")))
      .cache()
    val test = RandomDataset.vectors(spark, 70, 384, 43)
      .withColumnRenamed("id", "qid")
      .withColumn("vector", graft.functions.VectorFunctions.vec_normalize(col("vector")))
      .cache()
    train.count(); test.count()
    val t0 = System.nanoTime()
    val artifact = Registry.indexer("hnsw_global",
      Map("m" -> "16", "ef_construction" -> "200", "seed" -> "42"), "l2")
      .build(train)
    artifact.data.cache().count()
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val searcher = Registry.searcher("hnsw_global",
      Map("ef_search" -> "256"), "l2")
    searcher.search(artifact, test, 20).collect()
    val t1 = System.nanoTime()
    val res = searcher.search(artifact, test, 20).collect()
    println(f"search 70q: ${(System.nanoTime() - t1) / 1e6}%.0fms qps=${70e9 / (System.nanoTime() - t1)}%.0f rows=${res.length}")
    spark.stop()
  }
}
