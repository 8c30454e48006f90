package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.KnnJoin

/** scratch profiling of the dedup_embedding_top stages (dev aid) */
object EmbTopProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val e = Tables.load(spark, dir, "embeddings").cache()
    time("load+cache") { e.count() }
    for (round <- 1 to 3) {
      val agg = KnnJoin.knnJoinAgg(e, e, k = 21, metric = "cosine",
        queryIdCol = "vec_id", queryVecCol = "embedding",
        baseIdCol = "vec_id", baseVecCol = "embedding")
      time(s"knnJoinAgg r$round") {
        agg.write.mode("overwrite").format("noop").save()
      }
      val full = KnnJoin.knnJoin(e, e, k = 21, metric = "cosine",
          queryIdCol = "vec_id", queryVecCol = "embedding",
          baseIdCol = "vec_id", baseVecCol = "embedding")
        .filter(col("id") =!= col("qid"))
        .select(least(col("qid"), col("id")).as("a"),
          greatest(col("qid"), col("id")).as("b"),
          (lit(1.0) - col("dist")).as("cosine"))
        .dropDuplicates("a", "b")
        .orderBy(col("cosine").desc, col("a"), col("b")).limit(20)
      time(s"full query r$round") {
        full.write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
