package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** glove50 pq is the one baseline row with recall below reference
  * (0.9750 vs 0.9820, within FAISS's own tolerance): does deeper /
  * ++-seeded codebook training close the 0.7-point gap?
  * Run: sbt "runMain graft.dev.Glove50PqProbe" */
object Glove50PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Registry.init()
    val train = RandomDataset.clusteredVectors(spark, 20000, 50, 200, 1.1,
      42, centerSeed = 7).cache()
    val test = RandomDataset.clusteredVectors(spark, 256, 50, 200, 1.1,
      43, centerSeed = 7).withColumnRenamed("id", "qid").cache()
    train.count(); test.count()
    val gt = KnnJoin.knnJoinAgg(test, train, 20, "l2")
      .select(col("qid"), transform(col("nn"), x => x("id")).as("gt_ids"))
      .cache()
    gt.count()

    for ((label, iters, init) <- Seq(
        ("base 25/random", 25, "random"),
        ("25/++", 25, "++"),
        ("40/++", 40, "++"),
        ("60/++", 60, "++"))) {
      val t0 = System.nanoTime()
      val art = PqIndexer(numSubspaces = 50, numCentroids = 256, seed = 42,
        trainIters = iters, kmeansInit = init).build(train)
      art.data.cache().count()
      val buildS = (System.nanoTime() - t0) / 1e9
      val res = LocalScan.rowsDf(spark,
        PqSearcher(metric = "l2").search(art, test, 20).collect().toSeq)
      val recall = res.groupBy("qid")
        .agg(TopKByDist.topK(col("id"), col("dist"), 20).as("nn"))
        .select(col("qid"), transform(col("nn"), x => x("id")).as("pred"))
        .join(gt, Seq("qid"))
        .select(avg(Metrics.recallAtK(col("pred"), col("gt_ids"), 20)))
        .as[Double].head()
      println(f"[g50pq] $label%-16s recall=$recall%.4f build=$buildS%.2fs (ref 0.9820)")
      art.data.unpersist()
    }
    spark.stop()
  }
}
