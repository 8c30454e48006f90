package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** Pin the auto-routed hnsw_global probe fraction with data (r11
  * VERDICT "what's wrong #2"): when a global-HNSW build exceeds the
  * driver budget, HnswGlobalIndexer routes to the distributed
  * per-centroid index with nPart = n/131072+1 groups (8..4096) and
  * serves it at `routed_nprobe` probes. The r11 value — max(12,
  * 3/4·nPart) — fixed the r10 fixed-12 collapse but the 3/4 fraction
  * was reasoned, not swept; the recall contract at hundreds-to-
  * thousands of groups was untested.
  *
  * This sweep builds the SAME index shape the auto-route builds
  * (HnswIndexer, spill=2, spillEps=0.15, efC=100) at high group counts
  * (256 / 1024 — forced via nPartitions; the fraction question is
  * about router quality at high group counts, which does not need the
  * 33M-row corpus the auto-route trigger would) on the clustered
  * msmarco-like stand-in (the router-hostile case: overlapping
  * clusters, normalized), and reports recall@10 per probe fraction.
  *
  * Measured (2026-08-15, local[12], 500k×64-d, 512 latent clusters,
  * sigma 1.2, overlap 0.7, normalized, 200 queries, recall@10 vs
  * exact GT; /tmp/nprobe_sweep.log):
  *
  *   groups=256:  frac 1/16 → 0.8320   1/4 → 0.9765   3/8 → 0.9905
  *                1/2 → 0.9935   3/4 → 0.9945   1 (all) → 0.9950
  *   groups=1024: frac 1/16 → 0.9315   1/4 → 0.9930   3/8 → 0.9965
  *                1/2 → 0.9970   3/4 → 0.9985   1 (all) → 0.9985
  *
  * Findings: (a) the fraction→recall curve is group-count-invariant-
  * or-better as groups grow (1024 ≥ 256 at every fraction), so a
  * fraction pinned here does not degrade toward the 4096-group cap;
  * (b) recall saturates at the walk's own efSearch ceiling (~0.995 /
  * ~0.9985) by frac 1/2 — probing 3/4 buys ≤ 0.0015 over 1/2 at 1.5×
  * the probe cost; (c) the hnsw_global contract floor (0.85) is
  * cleared from frac 1/16-1/4 with wide margin. PINNED:
  * routed_nprobe = max(12, nPart/2) (HnswGlobalIndexer.build), the
  * saturation knee at both group counts.
  */
object RoutedNprobeSweep {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "12")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Registry.init()
    val n = args.lift(0).map(_.toInt).getOrElse(500000)
    val nQ = 200
    // msmarco-hardened stand-in shape (BaselineCompare.workloads):
    // clustered, high sigma, overlapping, normalized
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("vector",
        graft.functions.VectorFunctions.vec_normalize(col("vector")))
    val train = norm(RandomDataset.clusteredVectors(spark, n, 64, 512,
      sigma = 1.2, seed = 42, centerSeed = 7, overlap = 0.7)).cache()
    val test = norm(RandomDataset.clusteredVectors(spark, nQ, 64, 512,
      sigma = 1.2, seed = 43, centerSeed = 7, overlap = 0.7))
      .withColumnRenamed("id", "qid").cache()
    train.count(); test.count()
    val gt = KnnJoin.knnJoinAgg(test, train, 10, "l2")
      .select(col("qid"), transform(col("nn"), x => x("id")).as("gt_ids"))
      .cache()
    gt.count()
    for (nPart <- args.lift(1).map(s => s.split(",").map(_.toInt).toSeq)
        .getOrElse(Seq(256, 1024))) {
      // the auto-route's exact build shape (HnswGlobalIndexer.build)
      val t0 = System.nanoTime()
      val art = HnswIndexer(nPartitions = nPart, m = 8, efConstruction = 100,
        metric = "l2", seed = 42, spill = 2, spillEps = 0.15).build(train)
      art.data.cache().count()
      println(f"[sweep] built nPart=$nPart in ${(System.nanoTime()-t0)/1e9}%.0f s")
      for (frac <- Seq(8, 16, 64, 96, 128, 160, 192, 256, 320, 384)
          .map(_ * nPart / 256).distinct.filter(_ >= 1)) {
        val searcher = HnswSearcher(nprobe = frac, efSearch = 64, metric = "l2")
        val res = LocalScan.rowsDf(spark,
          searcher.search(art, test, 10).collect().toSeq)
        val recall = res.groupBy("qid")
          .agg(TopKByDist.topK(col("id"), col("dist"), 10).as("nn"))
          .select(col("qid"), transform(col("nn"), x => x("id")).as("pred"))
          .join(gt, Seq("qid"))
          .select(avg(Metrics.recallAtK(col("pred"), col("gt_ids"), 10)))
          .as[Double].head()
        println(f"[sweep] nPart=$nPart%-5d nprobe=$frac%-4d frac=${frac.toDouble/nPart}%.3f recall@10=$recall%.4f")
      }
      art.data.unpersist()
    }
    spark.stop()
  }
}
