package graft.dev
import org.apache.spark.sql.SparkSession
import graft.sources.RandomDataset
import graft.operators.KnnJoin
/** dev aid: measure the reference BASELINE workload shape (random
  * 20k x 64-d, 256 queries, k=20 L2) on this engine's exact kNN join. */
object BaselineShape {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val train = RandomDataset.vectors(spark, 20000, 64, 42).cache()
    val test = RandomDataset.vectors(spark, 256, 64, 43)
      .withColumnRenamed("id", "qid").cache()
    train.count(); test.count()
    def run(): Double = {
      val t0 = System.nanoTime()
      KnnJoin.knnJoin(test, train, 20, "l2")
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    val times = (1 to 3).map(_ => run())
    val best = times.min
    println(f"[baseline-shape] exact 20k x 64d, 256 q, k=20: ${best}%.3f s = ${256 / best}%.0f QPS (reference exact: 220 QPS)")
    spark.stop()
  }
}
