package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** Why is glove50 ivf_pq 19× slower than random at the same 20k scale?
  * Compares list-size distribution and total probed-code volume between
  * the isotropic (random, 64-d) and clustered (glove50, 50-d) baseline
  * shapes at the exact BaselineCompare configs. */
object IvfPqOutlierProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Registry.init()

    for ((name, dims, clustered) <- Seq(("random", 64, false), ("glove50", 50, true))) {
      val m = if (dims % 64 == 0) 64 else dims
      val train =
        (if (clustered)
          RandomDataset.clusteredVectors(spark, 20000, dims, 200, 1.1, 42, centerSeed = 7)
        else RandomDataset.vectors(spark, 20000, dims, 42)).cache()
      val test =
        (if (clustered)
          RandomDataset.clusteredVectors(spark, 256, dims, 200, 1.1, 43, centerSeed = 7)
        else RandomDataset.vectors(spark, 256, dims, 43))
          .withColumnRenamed("id", "qid").cache()
      train.count(); test.count()

      val t0 = System.nanoTime()
      val artifact = Registry.indexer("ivf_pq",
        Map("nlist" -> "256", "nprobe" -> "32", "num_subspaces" -> m.toString,
          "num_centroids" -> "256", "residual" -> "true", "seed" -> "42"), "l2")
        .build(train)
      artifact.data.cache().count()
      val buildS = (System.nanoTime() - t0) / 1e9

      val sizes = artifact.data.groupBy("centroid_id").count()
        .select("count").as[Long].collect().sorted
      val centArr = IvfModel.centroidsOf(artifact)
      val (qids, qVecArr) = LocalScan.queryVecsAlways(test)
      val probes = AdcScan.coarseProbes(qVecArr, centArr, 256, 32)
      // probed volume: Σ over lists (list_size × queries probing it)
      val sizeByCid = artifact.data.groupBy("centroid_id").count()
        .as[(Int, Long)].collect().toMap
      val volume = probes.zipWithIndex.map { case (qs, cid) =>
        qs.length.toLong * sizeByCid.getOrElse(cid, 0L)
      }.sum
      println(f"$name%-8s build=$buildS%.1fs lists: n=${sizes.length} " +
        f"min=${sizes.head} p50=${sizes(sizes.length / 2)} max=${sizes.last} " +
        f"probedVolume=$volume%,d (${volume / 256}%,d rows/query = " +
        f"${volume * 100.0 / 256 / 20000}%.1f%% of base)")

      val searcher = Registry.searcher("ivf_pq",
        Map("nprobe" -> "32"), "l2")
      searcher.search(artifact, test, 20).collect()
      val t1 = System.nanoTime()
      val res = searcher.search(artifact, test, 20).collect()
      println(f"$name%-8s search: ${(System.nanoTime() - t1) / 1e6}%.0fms " +
        f"qps=${256e9 / (System.nanoTime() - t1)}%.0f rows=${res.length}")
      train.unpersist(); test.unpersist(); artifact.data.unpersist()
    }
    spark.stop()
  }
}
