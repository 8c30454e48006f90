package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** dev aid: run the reference BASELINE workload shape (random 20k × 64-d,
  * 256 queries, k=20, L2 — BASELINE.md primary run) through every
  * registered algorithm and print recall/QPS next to the reference's
  * published numbers. */
object BaselineShape {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Registry.init()

    val train = RandomDataset.vectors(spark, 20000, 64, 42).cache()
    val test = RandomDataset.vectors(spark, 256, 64, 43)
      .withColumnRenamed("id", "qid").cache()
    train.count(); test.count()
    val gt = KnnJoin.knnJoinAgg(test, train, 20, "l2")
      .select(col("qid"), transform(col("nn"), x => x("id")).as("gt_ids"))
      .cache()
    gt.count()

    // (name, indexer, searcher, params) — configs mirror BASELINE.md rows
    val algos = Seq(
      ("exact", "brute_force", "linear", Map.empty[String, String]),
      ("lsh", "lsh", "lsh", Map("num_tables" -> "12", "hash_size" -> "4",
        "bucket_width" -> "20.0", "candidate_multiplier" -> "64")),
      ("ivf_flat", "ivf", "ivf", Map("nlist" -> "100", "nprobe" -> "10")),
      ("sq8", "sq8", "sq8", Map.empty[String, String]),
      ("pq64", "pq", "pq", Map("num_subspaces" -> "64", "num_centroids" -> "256")),
      ("nsw", "hnsw", "hnsw", Map("n_partitions" -> "16", "m" -> "12",
        "nprobe" -> "4", "ef_search" -> "100")),
      ("covertree", "covertree", "covertree", Map.empty[String, String]))

    val reference = Map(
      "exact" -> (1.0000, 220.0), "lsh" -> (0.3191, 173.0),
      "ivf_flat" -> (0.4105, 111697.0), "sq8" -> (0.5090, 248897.0),
      "pq64" -> (0.9672, 25606.0), "nsw" -> (0.9156, 23886.0),
      "covertree" -> (1.0000, 34.4))

    println(f"${"algo"}%-10s ${"recall@20"}%10s ${"QPS"}%10s ${"build_s"}%8s   reference(recall/QPS)")
    algos.foreach { case (name, in, se, params) =>
      try {
        val t0 = System.nanoTime()
        val artifact = Registry.indexer(in, params + ("seed" -> "42"), "l2").build(train)
        artifact.data.cache().count()
        val buildS = (System.nanoTime() - t0) / 1e9
        val searcher = Registry.searcher(se, params, "l2")
        def timed(): (Double, org.apache.spark.sql.DataFrame) = {
          val t1 = System.nanoTime()
          val res = searcher.search(artifact, test, 20)
            .groupBy("qid")
            .agg(TopKByDist.topK(col("id"), col("dist"), 20).as("nn"))
            .select(col("qid"), transform(col("nn"), x => x("id")).as("pred"))
            .cache()
          res.count()
          ((System.nanoTime() - t1) / 1e9, res)
        }
        timed() // warm
        val (secs, pred) = timed()
        val recall = pred.join(gt, "qid")
          .select(avg(Metrics.recallAtK(col("pred"), col("gt_ids"), 20)))
          .as[Double].head()
        val (refR, refQ) = reference(name)
        println(f"$name%-10s $recall%10.4f ${256 / secs}%10.0f $buildS%8.2f   ($refR%.4f / $refQ%.0f)")
        artifact.data.unpersist()
      } catch { case e: Throwable =>
        println(f"$name%-10s FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
