package graft.dev

import org.apache.spark.sql.SparkSession

import graft.operators._
import graft.sources.RandomDataset

/** Stage-level timing of the ADC searchers on the baseline workload
  * (random 20k × 64-d, 256 queries): driver prep vs the scan job. The
  * numbers motivating AdcScan's query-major partition scan live in this
  * file's git history (pair-row BNLJ scoring: ~0.25 s scoring + ~0.4 s
  * topk tail + LUT DRAM thrash; scan: one pass, survivors only).
  * Run: sbt "runMain graft.dev.AdcProfile" */
object AdcProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Registry.init()

    val train = RandomDataset.vectors(spark, 20000, 64, 42).cache()
    val test = RandomDataset.vectors(spark, 256, 64, 43)
      .withColumnRenamed("id", "qid").cache()
    train.count(); test.count()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[adcprofile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      r
    }

    val algos = Seq[(String, Indexer, Searcher)](
      ("pq", PqIndexer(64, 256, 42), PqSearcher("l2")),
      ("sq8", Sq8Indexer(), Sq8Searcher("l2")),
      ("ivf_sq8", IvfSq8Indexer(256, 42), IvfSq8Searcher(32, "l2")),
      ("ivf_pq_res", IvfPqIndexer(256, 64, 256, 42, residual = true),
        IvfPqSearcher(32, "l2")))
    for ((name, indexer, searcher) <- algos) {
      val artifact = t(s"$name build") {
        val a = indexer.build(train)
        a.data.cache().count(); a
      }
      // warm run (JIT, codegen, broadcast machinery)
      searcher.search(artifact, test, 20)
        .write.format("noop").mode("overwrite").save()
      for (_ <- 1 to 3)
        t(s"$name search") {
          searcher.search(artifact, test, 20)
            .write.format("noop").mode("overwrite").save()
        }
      artifact.data.unpersist()
      System.err.println()
    }
    spark.stop()
  }
}
