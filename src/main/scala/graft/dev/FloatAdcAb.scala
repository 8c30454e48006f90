package graft.dev

import org.apache.spark.sql.SparkSession

import graft.operators._
import graft.sources.RandomDataset

/** interleaved A/B: exact-double vs float-LUT ADC scorers at the random
  * baseline shape (20k × 64-d codes, 256 q) — same process, alternating
  * reps, so box-load swings hit both arms equally. */
object FloatAdcAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()
    // arg "msmarco" switches to the 100k x 384-d / 70-query weak-row
    // shape (clustered + normalized like the baseline workload)
    val msmarco = args.headOption.contains("msmarco")
    val nq = if (msmarco) 70 else 256
    def vecs(n: Long, seed: Long) = {
      val raw =
        if (msmarco) RandomDataset.clusteredVectors(spark, n, 384, 512, 1.2,
          seed, centerSeed = 7, intrinsicDim = 64, overlap = 0.7)
        else RandomDataset.vectors(spark, n, 64, seed)
      if (msmarco) raw.withColumn("vector",
        graft.functions.VectorFunctions.vec_normalize(
          org.apache.spark.sql.functions.col("vector")))
      else raw
    }
    val train = vecs(if (msmarco) 100000 else 20000, 42).cache()
    val test = vecs(nq, 43).withColumnRenamed("id", "qid").cache()
    train.count(); test.count()
    val params = Map("num_subspaces" -> "64", "num_centroids" -> "256",
      "train_iters" -> "25", "seed" -> "42")
    val art = Registry.indexer("pq", params, "l2").build(train)
    art.data.cache().count()
    val sD = Registry.searcher("pq", params, "l2")
    val sF = Registry.searcher("pq", params + ("strided_accum" -> "true"), "l2")
    def t(s: Searcher): Double = {
      val t0 = System.nanoTime()
      s.search(art, test, 20).collect()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).foreach { _ => t(sD); t(sF) }
    val reps = (1 to 7).map(_ => (t(sD), t(sF)))
    val (d, f) = (reps.map(_._1).min, reps.map(_._2).min)
    println(f"double=${d * 1e3}%.1fms (qps=${nq / d}%.0f)  float=${f * 1e3}%.1fms (qps=${nq / f}%.0f)")

    // ivf_pq residual arm
    val params2 = Map("nlist" -> "256", "nprobe" -> (if (msmarco) "8" else "32"),
      "num_subspaces" -> "64", "num_centroids" -> "256",
      "residual" -> "true", "train_iters" -> "25", "seed" -> "42")
    val art2 = Registry.indexer("ivf_pq", params2, "l2").build(train)
    art2.data.cache().count()
    val sD2 = Registry.searcher("ivf_pq", params2, "l2")
    val sF2 = Registry.searcher("ivf_pq", params2 + ("strided_accum" -> "true"), "l2")
    def t2(s: Searcher): Double = {
      val t0 = System.nanoTime()
      s.search(art2, test, 20).collect()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).foreach { _ => t2(sD2); t2(sF2) }
    val reps2 = (1 to 7).map(_ => (t2(sD2), t2(sF2)))
    val (d2, f2) = (reps2.map(_._1).min, reps2.map(_._2).min)
    println(f"ivfpq double=${d2 * 1e3}%.1fms (qps=${nq / d2}%.0f)  float=${f2 * 1e3}%.1fms (qps=${nq / f2}%.0f)")
    spark.stop()
  }
}
