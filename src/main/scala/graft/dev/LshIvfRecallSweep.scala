package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** Close the last below-reference recall rows: random ivf_flat
  * (0.39 vs 0.41) and random/glove50 lsh (0.30 vs 0.32 / 0.43 vs 0.51).
  * Both rows run 25-80× the reference QPS, so deeper probes /
  * more candidates are nearly free. */
object LshIvfRecallSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Registry.init()
    for ((name, dims, clusters, sigma, refIvf, refLsh) <- Seq(
      ("random", 64, 0, 0.0, Some(0.4105), 0.3191),
      ("glove50", 50, 200, 1.1, None, 0.5074))) {
      def gen(count: Long, seed: Long) =
        if (clusters > 0)
          RandomDataset.clusteredVectors(spark, count, dims, clusters, sigma,
            seed, centerSeed = 7)
        else RandomDataset.vectors(spark, count, dims, seed)
      val train = gen(20000, 42).cache()
      val test = gen(256, 43).withColumnRenamed("id", "qid").cache()
      train.count(); test.count()
      val gt = KnnJoin.knnJoinAgg(test, train, 20, "l2")
        .select(col("qid"), transform(col("nn"), x => x("id")).as("gt_ids")).cache()
      gt.count()
      def evalOne(algo: String, build: Map[String, String],
          search: Map[String, String], label: String): Unit = {
        val artifact = Registry.indexer(algo, build + ("seed" -> "42"), "l2").build(train)
        artifact.data.cache().count()
        val searcher = Registry.searcher(algo, search, "l2")
        searcher.search(artifact, test, 20).collect()
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
        println(f"$name%-8s $label%-28s recall=$recall%.4f qps=${256 / secs}%8.0f")
        artifact.data.unpersist()
      }
      refIvf.foreach { _ =>
        for (np <- Seq(10, 12, 14, 16))
          evalOne("ivf", Map("nlist" -> "100"),
            Map("nlist" -> "100", "nprobe" -> np.toString), s"ivf nprobe=$np")
      }
      for ((tables, hash, mult) <- Seq(
        (12, 4, 64), (12, 4, 128), (24, 4, 128), (12, 3, 128), (24, 4, 256)))
        evalOne("lsh",
          Map("num_tables" -> tables.toString, "hash_size" -> hash.toString,
            "bucket_width" -> "20.0"),
          Map("candidate_multiplier" -> mult.toString),
          s"lsh T=$tables h=$hash mult=$mult")
      println(s"$name ref: ivf=${refIvf.getOrElse("-")} lsh=$refLsh")
      train.unpersist(); test.unpersist(); gt.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
