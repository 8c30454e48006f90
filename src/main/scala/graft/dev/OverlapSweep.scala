package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** overlap × nprobe → recall@20 for ivf_flat at the msmarco baseline
  * shape (100k × 384-d cosine, nlist=100). Picks the edge-bridge overlap
  * value that reproduces the reference's coarse-probe hardness: real
  * msmarco needs nprobe=32 for recall 0.9529
  * (benchmark_summary.md:45); the overlap=0 stand-in saturates at
  * 1.0000 by nprobe=4 (r7 verdict, "missing hardness"). Target: recall
  * at nprobe=4 < 0.99 and ≈ 0.95 somewhere in nprobe 16-32. */
object OverlapSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Registry.init()
    // each arg is overlap[:degree[:sigma]]
    val configs: Seq[(Double, Int, Double)] =
      if (args.nonEmpty) args.toSeq.map { a =>
        val p = a.split(":")
        (p(0).toDouble,
          if (p.length > 1) p(1).toInt else 4,
          if (p.length > 2) p(2).toDouble else 0.9)
      }
      else Seq((0.0, 4, 0.9), (0.4, 4, 0.9), (0.7, 4, 0.9), (1.0, 4, 0.9))
    val (n, dims, nQ, clusters, intrinsic) = (100000, 384, 70, 512, 64)
    for ((ov, deg, sigma) <- configs) {
      def mk(count: Int, seed: Long) =
        RandomDataset.clusteredVectors(spark, count, dims, clusters, sigma,
          seed, centerSeed = 7, intrinsicDim = intrinsic, overlap = ov,
          overlapDegree = deg)
          .withColumn("vector",
            graft.functions.VectorFunctions.vec_normalize(col("vector")))
      val train = mk(n, 42).cache()
      val test = mk(nQ, 43).withColumnRenamed("id", "qid").cache()
      train.count(); test.count()
      val gt = KnnJoin.knnJoinAgg(test, train, 20, "l2")
        .select(col("qid"), transform(col("nn"), x => x("id")).as("gt_ids")).cache()
      gt.count()
      val artifact = Registry.indexer("ivf",
        Map("nlist" -> "100", "seed" -> "42"), "l2").build(train)
      artifact.data.cache().count()
      for (nprobe <- Seq(2, 4, 8, 16, 24, 32, 48)) {
        val searcher = Registry.searcher("ivf",
          Map("nlist" -> "100", "nprobe" -> nprobe.toString), "l2")
        val res = LocalScan.rowsDf(spark,
          searcher.search(artifact, test, 20).collect().toSeq)
        val recall = res.groupBy("qid")
          .agg(TopKByDist.topK(col("id"), col("dist"), 20).as("nn"))
          .select(col("qid"), transform(col("nn"), x => x("id")).as("pred"))
          .join(gt, Seq("qid"))
          .select(avg(Metrics.recallAtK(col("pred"), col("gt_ids"), 20)))
          .as[Double].head()
        println(f"overlap=$ov%.2f deg=$deg%-2d sigma=$sigma%.2f nprobe=$nprobe%-3d recall=$recall%.4f")
      }
      artifact.data.unpersist()
      train.unpersist(); test.unpersist(); gt.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
