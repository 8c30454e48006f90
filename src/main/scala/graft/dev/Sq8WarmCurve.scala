package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators._
import graft.sources.RandomDataset

/** Per-call serve latency curve at the glove50 ivf_sq8 baseline shape,
  * replicating BaselineCompare's call pattern (warm prefix build → real
  * build → successive searches): shows how many serve calls the path
  * needs before C2 steady state, i.e. whether the bench's 1-warm +
  * best-of-3 window measures warmup instead of the code. */
object Sq8WarmCurve {
  def main(args: Array[String]): Unit = {
    val algo = args.headOption.getOrElse("ivf_sq8")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()
    val train = RandomDataset.clusteredVectors(spark, 20000, 50, 200, 1.1, 42,
      centerSeed = 7).cache()
    val test = RandomDataset.clusteredVectors(spark, 256, 50, 200, 1.1, 43,
      centerSeed = 7).withColumnRenamed("id", "qid").cache()
    train.count(); test.count()
    val params: Map[String, String] = algo match {
      case "ivf_flat" => Map("nlist" -> "100", "nprobe" -> "5",
        "strided_accum" -> "true")
      case "ivf_pq" => Map("nlist" -> "100", "m" -> "10", "nbits" -> "8",
        "nprobe" -> "5", "train_iters" -> "25", "strided_accum" -> "true")
      case _ => Map("nlist" -> "256", "nprobe" -> "5",
        "strided_accum" -> "true")
    }
    // bench sequence: small warm build, then the timed build
    try {
      val warm = Registry.indexer(algo, params + ("seed" -> "42"), "l2")
        .build(train.limit(2000))
      warm.data.unpersist()
    } catch { case _: Throwable => () }
    val artifact = Registry.indexer(algo, params + ("seed" -> "42"), "l2")
      .build(train)
    artifact.data.cache().count()
    val searcher = Registry.searcher(algo, params, "l2")
    val times = (1 to 30).map { i =>
      val t0 = System.nanoTime()
      searcher.search(artifact, test, 20).collect()
      (System.nanoTime() - t0) / 1e6
    }
    println(s"[$algo] per-call ms: " +
      times.map(t => f"$t%.1f").mkString(" "))
    println(f"[$algo] call2-4 min=${times.slice(1, 4).min}%.2fms " +
      f"steady(last10 min)=${times.takeRight(10).min}%.2fms " +
      f"ratio=${times.slice(1, 4).min / times.takeRight(10).min}%.1fx")
    spark.stop()
  }
}
