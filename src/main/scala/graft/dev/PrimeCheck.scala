package graft.dev
import org.apache.spark.sql.SparkSession
import graft.operators._
import graft.sources.RandomDataset
/** Per-call warm-up curve of the full ivf_sq8 serve batch (the real
  * searcher path) — the r13 serve-loop prime moved the late-C2 cliff
  * (qIntState lzycompute + scan loops, previously call ~29) into the
  * first (untimed-warm) call. */
object PrimeCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()
    val train = RandomDataset.vectors(spark, 20000, 64, 42).cache()
    val test = RandomDataset.vectors(spark, 256, 64, 43)
      .withColumnRenamed("id", "qid").cache()
    train.count(); test.count()
    val artifact = Registry.indexer("ivf_sq8",
      Map("nlist" -> "256", "seed" -> "42"), "l2").build(train)
    artifact.data.cache().count()
    val searcher = Registry.searcher("ivf_sq8",
      Map("nlist" -> "256", "nprobe" -> "32", "strided_accum" -> "true"), "l2")
    (1 to 12).foreach { i =>
      val t0 = System.nanoTime()
      searcher.search(artifact, test, 20).collect()
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"call $i%2d: $ms%8.2f ms  (qps=${256e3 / ms}%6.0f)")
    }
    spark.stop()
  }
}
