package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** ef_construction sweep at the msmarco baseline shape (BaselineCompare's
  * exact data law: clustered stand-in, intrinsicDim=64, centerSeed=7,
  * normalized, ef_search=64): the round-7 build sits at 21-33 s with
  * recall 0.999 vs the reference's 0.986 — surplus recall the comparison
  * never credits, paid for in construction beam width. Find the smallest
  * efC that stays >= ref recall with ~1-point margin.
  * Run: sbt "runMain graft.dev.HnswEfcSweep"
  */
object HnswEfcSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Registry.init()
    def vecs(n: Long, seed: Long) =
      RandomDataset.clusteredVectors(spark, n, 384, 512, 0.9, seed,
          centerSeed = 7, intrinsicDim = 64)
        .withColumn("vector",
          graft.functions.VectorFunctions.vec_normalize(col("vector")))
    val train = vecs(100000, 42).cache()
    val test = vecs(70, 43).withColumnRenamed("id", "qid").cache()
    train.count(); test.count()
    val gt = KnnJoin.knnJoinAgg(test, train, 20, "l2")
      .select(col("qid"), transform(col("nn"), x => x("id")).as("gt_ids"))
      .cache()
    gt.count()
    // JIT warm-up once (the baseline harness does the same 2k pre-build)
    Registry.indexer("hnsw_global",
        Map("m" -> "16", "ef_construction" -> "100", "seed" -> "42"), "l2")
      .build(train.limit(2000)).data.unpersist()
    for (efc <- Seq(100, 120, 140, 200)) {
      val t0 = System.nanoTime()
      val artifact = Registry.indexer("hnsw_global",
        Map("m" -> "16", "ef_construction" -> efc.toString, "seed" -> "42"),
        "l2").build(train)
      artifact.data.cache().count()
      val buildS = (System.nanoTime() - t0) / 1e9
      val searcher = Registry.searcher("hnsw_global",
        Map("ef_search" -> "64"), "l2")
      searcher.search(artifact, test, 20).collect() // warm
      val t1 = System.nanoTime()
      val rows = searcher.search(artifact, test, 20).collect()
      val searchS = (System.nanoTime() - t1) / 1e9
      val recall = LocalScan.rowsDf(spark, rows.toSeq)
        .groupBy("qid")
        .agg(TopKByDist.topK(col("id"), col("dist"), 20).as("nn"))
        .select(col("qid"), transform(col("nn"), x => x("id")).as("pred"))
        .join(gt, Seq("qid"))
        .select(avg(Metrics.recallAtK(col("pred"), col("gt_ids"), 20)))
        .as[Double].head()
      println(f"efc=$efc%-4d build=$buildS%6.1fs recall=$recall%.4f " +
        f"qps=${70 / searchS}%.0f")
      artifact.data.unpersist()
    }
    spark.stop()
  }
}
