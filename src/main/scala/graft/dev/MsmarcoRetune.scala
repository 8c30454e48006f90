package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** Full algorithm retune at the HARDENED msmarco stand-in
  * (512 clusters, sigma=1.2, rank-64 noise, overlap=0.7 deg=4 — chosen
  * by dev/OverlapSweep to reproduce the reference's coarse-probe
  * hardness: recall ≈ 0.95 lands at nprobe 24-32 like real msmarco,
  * benchmark_summary.md:45). Sweeps every searcher knob so the baseline
  * operating points can be re-pinned at the reference recall anchors. */
object MsmarcoRetune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Registry.init()
    val (n, dims, nQ) = (100000, 384, 70)
    def mk(count: Int, seed: Long) =
      RandomDataset.clusteredVectors(spark, count, dims, 512, 1.2, seed,
        centerSeed = 7, intrinsicDim = 64, overlap = 0.7, overlapDegree = 4)
        .withColumn("vector",
          graft.functions.VectorFunctions.vec_normalize(col("vector")))
    val train = mk(n, 42).cache()
    val test = mk(nQ, 43).withColumnRenamed("id", "qid").cache()
    train.count(); test.count()
    val gt = KnnJoin.knnJoinAgg(test, train, 20, "l2")
      .select(col("qid"), transform(col("nn"), x => x("id")).as("gt_ids")).cache()
    gt.count()

    def measure(label: String, artifact: IndexArtifact, se: String,
        params: Map[String, String], refRecall: Double): Unit = {
      val searcher = Registry.searcher(se, params, "l2")
      searcher.search(artifact, test, 20).collect() // warm
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        searcher.search(artifact, test, 20).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      val res = LocalScan.rowsDf(spark,
        searcher.search(artifact, test, 20).collect().toSeq)
      val recall = res.groupBy("qid")
        .agg(TopKByDist.topK(col("id"), col("dist"), 20).as("nn"))
        .select(col("qid"), transform(col("nn"), x => x("id")).as("pred"))
        .join(gt, Seq("qid"))
        .select(avg(Metrics.recallAtK(col("pred"), col("gt_ids"), 20)))
        .as[Double].head()
      val flag = if (recall >= refRecall) "ok" else "below"
      println(f"$label%-28s recall=$recall%.4f (ref $refRecall%.4f $flag) qps=${nQ / secs}%8.0f")
    }

    val only = if (args.nonEmpty) args.toSet else Set.empty[String]
    def want(a: String) = only.isEmpty || only.contains(a)

    if (want("ivf_flat")) {
      val a = Registry.indexer("ivf", Map("nlist" -> "100", "seed" -> "42"), "l2")
        .build(train)
      a.data.cache().count()
      for (np <- Seq(16, 24, 32, 48))
        measure(s"ivf_flat nprobe=$np", a, "ivf",
          Map("nlist" -> "100", "nprobe" -> np.toString), 0.9529)
      a.data.unpersist()
    }
    if (want("ivf_sq8")) {
      val a = Registry.indexer("ivf_sq8",
        Map("nlist" -> "256", "seed" -> "42"), "l2").build(train)
      a.data.cache().count()
      for (np <- Seq(16, 24, 32, 48, 64, 96))
        measure(s"ivf_sq8 nprobe=$np", a, "ivf_sq8",
          Map("nlist" -> "256", "nprobe" -> np.toString), 0.9471)
      a.data.unpersist()
    }
    if (want("ivf_pq")) {
      val p = Map("nlist" -> "256", "num_subspaces" -> "64",
        "num_centroids" -> "256", "residual" -> "true",
        "train_iters" -> "25", "seed" -> "42")
      val a = Registry.indexer("ivf_pq", p, "l2").build(train)
      a.data.cache().count()
      for (np <- Seq(8, 16, 24, 32, 48))
        measure(s"ivf_pq nprobe=$np", a, "ivf_pq",
          p + ("nprobe" -> np.toString), 0.6986)
      a.data.unpersist()
    }
    if (want("pq")) {
      val p = Map("num_subspaces" -> "64", "num_centroids" -> "256",
        "train_iters" -> "25", "seed" -> "42")
      val a = Registry.indexer("pq", p, "l2").build(train)
      a.data.cache().count()
      measure("pq", a, "pq", p, 0.7757)
      a.data.unpersist()
    }
    if (want("lsh")) {
      // the reference's msmarco row is COSINE sign-LSH (lsh_cosine:
      // 12 tables × 18 bits, multiplier 8, brute-force fallback —
      // benchmark_config.yaml:80-85,115-119), not E2LSH; on normalized
      // vectors cosine ranks ≡ l2 so the GT stays valid
      for ((fam, t, h, m) <- Seq(("cosine", 12, 18, 8),
        ("cosine", 12, 16, 16), ("cosine", 16, 14, 16),
        ("l2", 48, 8, 256), ("l2", 24, 8, 512))) {
        val p = Map("num_tables" -> t.toString, "hash_size" -> h.toString,
          "bucket_width" -> "20.0", "candidate_multiplier" -> m.toString,
          "metric" -> fam, "seed" -> "42")
        val a = Registry.indexer("lsh", p, fam).build(train)
        a.data.cache().count()
        measure(s"lsh $fam t=$t h=$h m=$m", a, "lsh", p, 0.3286)
        a.data.unpersist()
      }
    }
    if (want("hnsw")) {
      val a = Registry.indexer("hnsw_global",
        Map("m" -> "16", "ef_construction" -> "200", "seed" -> "42"), "l2")
        .build(train)
      a.data.cache().count()
      for (ef <- Seq(64, 100, 160, 256, 384))
        measure(s"hnsw ef=$ef", a, "hnsw_global",
          Map("ef_search" -> ef.toString), 0.9857)
      a.data.unpersist()
    }
    train.unpersist(); test.unpersist(); gt.unpersist()
    spark.stop()
  }
}
