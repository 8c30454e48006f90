package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** Per-algorithm search timing at the msmarco baseline shape (100k ×
  * 384-d, 70 queries): where the QPS gap vs the reference lives.
  * Run: sbt "runMain graft.dev.MsmarcoSearchProfile" */
object MsmarcoSearchProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Registry.init()

    def norm(df: org.apache.spark.sql.DataFrame) = df.withColumn("vector",
      graft.functions.VectorFunctions.vec_normalize(col("vector")))
    val train = norm(RandomDataset.clusteredVectors(spark, 100000, 384, 512, 0.9, 42, 7)).cache()
    val test = norm(RandomDataset.clusteredVectors(spark, 70, 384, 512, 0.9, 43, 7))
      .withColumnRenamed("id", "qid").cache()
    train.count(); test.count()

    sys.env.get("FLOPCAP").foreach(
      sys.props("graft.local.fullScanFlopCap") = _)
    val algos = Seq[(String, Indexer, Searcher)](
      ("exact", BruteForceIndexer(), LinearSearcher("l2")),
      ("ivf_flat", IvfIndexer(100, 42), IvfSearcher(10, "l2")),
      ("ivf_sq8", IvfSq8Indexer(256, 42), IvfSq8Searcher(48, "l2")),
      ("pq", PqIndexer(64, 256, 42), PqSearcher("l2")),
      ("ivf_pq", IvfPqIndexer(256, 64, 256, 42, residual = true),
        IvfPqSearcher(48, "l2")),
      ("hnsw", HnswGlobalIndexer(16, 200, "l2", 42),
        HnswGlobalSearcher(256, "l2")))
    algos.foreach { case (name, in, se) =>
      val t0 = System.nanoTime()
      val art = in.build(train)
      art.data.cache().count()
      val buildS = (System.nanoTime() - t0) / 1e9
      def timed(): Double = {
        val t1 = System.nanoTime()
        se.search(art, test, 20).collect()
        (System.nanoTime() - t1) / 1e9
      }
      timed()
      val secs = (1 to 3).map(_ => timed()).min
      System.err.println(f"[msearch] $name%-10s build=$buildS%6.2fs search=$secs%7.3fs qps=${70.0 / secs}%8.0f")
      art.data.unpersist()
    }
    spark.stop()
  }
}
