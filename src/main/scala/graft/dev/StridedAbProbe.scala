package graft.dev

import org.apache.spark.sql.SparkSession

import graft.operators._
import graft.sources.RandomDataset

/** A/B the strided_accum kernels against the default kernels at the
  * glove50 / random baseline shapes (20k rows, 256 queries), where the
  * first strided bench showed a reproducible 2.6-6x QPS DROP while
  * msmarco (100k x 384) improved 1.5x.
  * Run: sbt "runMain graft.dev.StridedAbProbe" */
object StridedAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Registry.init()

    for ((label, n, dim, clusters) <- Seq(
        ("random", 20000, 64, None),
        ("glove50", 20000, 50, Some((200, 1.1, 0))))) {
      val train = (clusters match {
        case Some((c, s, intr)) =>
          RandomDataset.clusteredVectors(spark, n, dim, c, s, 42,
            centerSeed = 7, intrinsicDim = intr)
        case None => RandomDataset.vectors(spark, n, dim, 42)
      }).cache()
      val test = (clusters match {
        case Some((c, s, intr)) =>
          RandomDataset.clusteredVectors(spark, 256, dim, c, s, 43,
            centerSeed = 7, intrinsicDim = intr)
        case None => RandomDataset.vectors(spark, 256, dim, 43)
      }).withColumnRenamed("id", "qid").cache()
      train.count(); test.count()

      val flat = BruteForceIndexer().build(train)
      flat.data.cache().count()
      val ivf = IvfIndexer(100, 42).build(train)
      ivf.data.cache().count()

      def bench(name: String, se: Searcher): Unit = {
        def timed(): Double = {
          val t1 = System.nanoTime()
          se.search(if (name.startsWith("ivf")) ivf else flat, test, 20)
            .collect()
          (System.nanoTime() - t1) / 1e9
        }
        (1 to 3).foreach(_ => timed())
        val secs = (1 to 5).map(_ => timed()).min
        System.err.println(
          f"[ab] $label%-8s $name%-16s search=$secs%7.4fs qps=${256.0 / secs}%8.0f")
      }
      bench("exact_default", LinearSearcher("l2_gram"))
      bench("exact_strided", LinearSearcher("l2_gram", strided = true))
      val np = if (label == "random") 12 else 8
      bench("ivf_default", IvfSearcher(np, "l2"))
      bench("ivf_strided", IvfSearcher(np, "l2", strided = true))
      flat.data.unpersist(); ivf.data.unpersist()
      train.unpersist(); test.unpersist()
    }
    spark.stop()
  }
}
