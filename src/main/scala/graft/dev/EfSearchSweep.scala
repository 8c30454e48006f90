package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** ef_search → (recall@20, QPS) for hnsw_global at the three baseline
  * shapes — same tuning logic as dev/NprobeSweep: the pinned ef=256 was
  * chosen for recall parity on the OLD stand-in data; the comparison
  * only credits recall ≥ reference, so surplus beam depth is pure QPS
  * loss. */
object EfSearchSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Registry.init()
    // msmarco matches the r8 HARDENED baseline stand-in (sigma 1.2 +
    // overlap 0.7 — BaselineCompare.workloads); keep in sync
    for ((name, n, dims, nQ, clusters, sigma, intrinsic, normalize, refRecall, overlap) <- Seq(
      ("random", 20000, 64, 256, 0, 0.0, 0, false, 0.9156, 0.0),
      ("glove50", 20000, 256, 256, 200, 1.1, 0, false, 0.9750, 0.0),
      ("msmarco", 100000, 384, 70, 512, 1.2, 64, true, 0.9857, 0.7))) {
      val dimsFix = if (name == "glove50") 50 else dims
      def gen(count: Long, seed: Long) = {
        val raw =
          if (clusters > 0)
            RandomDataset.clusteredVectors(spark, count, dimsFix, clusters, sigma,
              seed, centerSeed = 7, intrinsicDim = intrinsic, overlap = overlap)
          else RandomDataset.vectors(spark, count, dimsFix, seed)
        if (normalize) raw.withColumn("vector",
          graft.functions.VectorFunctions.vec_normalize(col("vector")))
        else raw
      }
      val train = gen(n, 42).cache()
      val test = gen(nQ, 43).withColumnRenamed("id", "qid").cache()
      train.count(); test.count()
      val gt = KnnJoin.knnJoinAgg(test, train, 20, "l2")
        .select(col("qid"), transform(col("nn"), x => x("id")).as("gt_ids")).cache()
      gt.count()
      val artifact = Registry.indexer("hnsw_global",
        Map("m" -> "16", "ef_construction" -> "200", "seed" -> "42"), "l2")
        .build(train)
      artifact.data.cache().count()
      for (ef <- Seq(40, 48, 56, 64, 80, 100, 128, 160)) {
        val searcher = Registry.searcher("hnsw_global",
          Map("ef_search" -> ef.toString), "l2")
        searcher.search(artifact, test, 20).collect() // warm
        val secs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          searcher.search(artifact, test, 20).collect()
          (System.nanoTime() - t0) / 1e9
        }.min
        val res = LocalScan.rowsDf(spark,
          searcher.search(artifact, test, 20).collect().toSeq)
        val recall = res.groupBy("qid")
          .agg(TopKByDist.topK(col("id"), col("dist"), 20).as("nn"))
          .select(col("qid"), transform(col("nn"), x => x("id")).as("pred"))
          .join(gt, Seq("qid"))
          .select(avg(Metrics.recallAtK(col("pred"), col("gt_ids"), 20)))
          .as[Double].head()
        val flag = if (recall >= refRecall) "ok" else "BELOW-REF"
        println(f"$name%-8s ef=$ef%-4d recall=$recall%.4f (ref $refRecall%.4f $flag) qps=${nQ / secs}%8.0f")
      }
      train.unpersist(); test.unpersist(); gt.unpersist(); artifact.data.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
