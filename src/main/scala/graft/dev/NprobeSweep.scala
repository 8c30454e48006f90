package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** nprobe → (recall@20, QPS) sweep for the IVF family at the glove50 /
  * msmarco baseline shapes: with the corrected stand-in data the pinned
  * nprobe values over-probe well past the reference's recall point,
  * paying QPS for recall headroom the comparison doesn't credit. */
object NprobeSweep {
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
    // optional arg: restrict to one dataset (e.g. "random")
    val onlyDs = args.headOption
    for ((name, n, dims, nQ, clusters, sigma, intrinsic, normalize, overlap) <- Seq(
      ("random", 20000, 64, 256, 0, 0.0, 0, false, 0.0),
      ("glove50", 20000, 50, 256, 200, 1.1, 0, false, 0.0),
      ("msmarco", 100000, 384, 70, 512, 1.2, 64, true, 0.7))
        if onlyDs.forall(_ == name)) {
      def norm(df: org.apache.spark.sql.DataFrame) =
        if (normalize) df.withColumn("vector",
          graft.functions.VectorFunctions.vec_normalize(col("vector")))
        else df
      def gen(cnt: Int, seed: Long) =
        if (clusters == 0) RandomDataset.vectors(spark, cnt, dims, seed)
        else RandomDataset.clusteredVectors(spark, cnt, dims, clusters,
          sigma, seed, centerSeed = 7, intrinsicDim = intrinsic,
          overlap = overlap)
      val train = norm(gen(n, 42)).cache()
      val test = norm(gen(nQ, 43))
        .withColumnRenamed("id", "qid").cache()
      train.count(); test.count()
      val gt = KnnJoin.knnJoinAgg(test, train, 20, "l2")
        .select(col("qid"), transform(col("nn"), x => x("id")).as("gt_ids")).cache()
      gt.count()
      val m = if (dims % 64 == 0) 64 else dims
      for ((algo, baseParams) <- Seq(
        ("ivf", Map("nlist" -> "100")),
        ("ivf_sq8", Map("nlist" -> "256")),
        ("ivf_pq", Map("nlist" -> "256", "num_subspaces" -> m.toString,
          "num_centroids" -> "256", "residual" -> "true", "train_iters" -> "25")))) {
        val artifact = Registry.indexer(algo, baseParams + ("seed" -> "42"), "l2")
          .build(train)
        artifact.data.cache().count()
        for (nprobe <- Seq(3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 26, 28, 30, 32)) {
          val searcher = Registry.searcher(algo,
            baseParams + ("nprobe" -> nprobe.toString), "l2")
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
          println(f"$name%-8s $algo%-9s nprobe=$nprobe%-3d recall=$recall%.4f qps=${nQ / secs}%8.0f")
        }
        artifact.data.unpersist()
      }
      train.unpersist(); test.unpersist(); gt.unpersist()
    }
    spark.stop()
  }
}
