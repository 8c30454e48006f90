package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Algorithm, KnnJoin, Metrics, Registry}

/** Dev-only: measures the recall of every registered ANN algorithm at the
  * gate-query parameterizations, to calibrate the self-validation floors
  * in SparkEntry (floor = measured min across SFs − safety margin). */
object RecallAudit {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()
    val cases = Seq(
      ("lsh", Map("num_tables" -> "12", "hash_size" -> "4",
        "candidate_multiplier" -> "32"), "cosine"),
      // j4 E2LSH gate config
      ("lsh", Map("num_tables" -> "8", "hash_size" -> "4",
        "bucket_width" -> "4.0", "candidate_multiplier" -> "32"), "l2"),
      ("ivf", Map("nlist" -> "16", "nprobe" -> "4"), "l2"),
      ("pq", Map("num_subspaces" -> "16", "num_centroids" -> "64"), "l2"),
      ("ivf_sq8", Map("nlist" -> "16", "nprobe" -> "8"), "l2"),
      ("sq8", Map[String, String](), "l2"),
      ("ivf_pq", Map("nlist" -> "16", "nprobe" -> "8",
        "num_subspaces" -> "16", "num_centroids" -> "64"), "l2"),
      ("hnsw", Map("n_partitions" -> "8", "m" -> "8", "nprobe" -> "3",
        "ef_search" -> "64"), "l2"))
    dirs.foreach { dir =>
      val q = Tables.embQueries(spark, dir)
      val b = Tables.embBase(spark, dir).cache()
      val gt = KnnJoin.knnJoinAgg(q, b, 10, "l2")
        .select(col("qid"), transform(col("nn"), x => x("id")).as("gt")).cache()
      val gtCos = KnnJoin.knnJoinAgg(q, b, 10, "cosine")
        .select(col("qid"), transform(col("nn"), x => x("id")).as("gt")).cache()
      cases.foreach { case (name, params, metric) =>
        val alg = Algorithm(name,
          Registry.indexer(name, params + ("seed" -> "42"), metric),
          Registry.searcher(name, params, metric))
        val pred = alg.run(b, q, 10)
          .groupBy("qid")
          .agg(graft.operators.TopKByDist.topK(col("id"), col("dist"), 10).as("nn"))
          .select(col("qid"), transform(col("nn"), x => x("id")).as("pred"))
        val g = if (metric == "cosine") gtCos else gt
        val r = g.join(pred, Seq("qid"), "left")
          .withColumn("pred", coalesce(col("pred"), array().cast("array<bigint>")))
          .agg(avg(Metrics.recallAtK(col("pred"), col("gt"), 10)).as("recall"))
          .head().getDouble(0)
        println(f"[recall] $dir%-26s $name%-10s $r%.4f")
      }
      b.unpersist(); gt.unpersist(); gtCos.unpersist()
    }
    spark.stop()
  }
}
