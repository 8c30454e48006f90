package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** Quantifies the 384-d PQ recall gap (msmarco-standin pq 0.52 vs ref
  * 0.78): codebook training variants (init strategy × iterations) scored
  * by recall@20 against exact GT at the baseline msmarco shape. */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Registry.init()
    val nTrain = if (args.length > 0) args(0).toInt else 100000
    val dims = 384
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("vector", graft.functions.VectorFunctions.vec_normalize(col("vector")))
    val intrinsic = if (args.length > 1) args(1).toInt else 0
    val train = norm(RandomDataset.clusteredVectors(spark, nTrain, dims, 512, 0.9, 42,
      centerSeed = 7, intrinsicDim = intrinsic)).cache()
    val test = norm(RandomDataset.clusteredVectors(spark, 70, dims, 512, 0.9, 43,
      centerSeed = 7, intrinsicDim = intrinsic))
      .withColumnRenamed("id", "qid").cache()
    train.count(); test.count()
    val gt = KnnJoin.knnJoinAgg(test, train, 20, "l2")
      .select(col("qid"), transform(col("nn"), x => x("id")).as("gt_ids"))
      .cache()
    gt.count()

    def recallOf(artifact: IndexArtifact, searcher: Searcher): Double = {
      val res = LocalScan.rowsDf(spark,
        searcher.search(artifact, test, 20).collect().toSeq)
      val pred = res.groupBy("qid")
        .agg(TopKByDist.topK(col("id"), col("dist"), 20).as("nn"))
        .select(col("qid"), transform(col("nn"), x => x("id")).as("pred"))
      pred.join(gt, Seq("qid"))
        .select(avg(Metrics.recallAtK(col("pred"), col("gt_ids"), 20)))
        .as[Double].head()
    }

    for ((label, params) <- Seq(
      ("pq m=64 base", Map("num_subspaces" -> "64", "num_centroids" -> "256")),
      ("pq m=64 iters=25", Map("num_subspaces" -> "64", "num_centroids" -> "256",
        "train_iters" -> "25")),
      ("pq m=64 ++ iters=25", Map("num_subspaces" -> "64", "num_centroids" -> "256",
        "train_iters" -> "25", "kmeans_init" -> "++")),
      ("pq m=96 ++ iters=25", Map("num_subspaces" -> "96", "num_centroids" -> "256",
        "train_iters" -> "25", "kmeans_init" -> "++")))) {
      val t0 = System.nanoTime()
      try {
        val artifact = Registry.indexer("pq", params + ("seed" -> "42"), "l2").build(train)
        artifact.data.cache().count()
        val r = recallOf(artifact, Registry.searcher("pq", params, "l2"))
        println(f"$label%-24s recall@20=$r%.4f build=${(System.nanoTime() - t0) / 1e9}%.1fs")
        artifact.data.unpersist()
      } catch { case e: Throwable => println(s"$label FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
