package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** Three SQ8 IVF scan formulations × two baseline shapes:
  * (a) per-query (q−x)² LUT, query-major; (b) inline deq-table scorer,
  * query-major; (c) inline deq-table scorer, list-major. Picks the
  * production wiring with data instead of cache theory. */
object Sq8ScanShootout {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()
    for ((name, n, dims, nQ, nlist, nprobe, clusters) <- Seq(
      ("random", 20000, 64, 256, 256, 32, 0),
      // r8 hardened stand-in shape + pinned nprobe=24 (BaselineCompare)
      ("msmarco", 100000, 384, 70, 256, 24, 512))) {
      val train0 =
        if (clusters > 0)
          RandomDataset.clusteredVectors(spark, n, dims, clusters, 1.2, 42,
            centerSeed = 7, intrinsicDim = 64, overlap = 0.7)
        else RandomDataset.vectors(spark, n, dims, 42)
      val test0 =
        if (clusters > 0)
          RandomDataset.clusteredVectors(spark, nQ, dims, clusters, 1.2, 43,
            centerSeed = 7, intrinsicDim = 64, overlap = 0.7)
        else RandomDataset.vectors(spark, nQ, dims, 43)
      def norm(df: org.apache.spark.sql.DataFrame) =
        if (clusters > 0) df.withColumn("vector",
          graft.functions.VectorFunctions.vec_normalize(col("vector")))
        else df
      val train = norm(train0).cache()
      val test = norm(test0).withColumnRenamed("id", "qid").cache()
      train.count(); test.count()
      val artifact = Registry.indexer("ivf_sq8",
        Map("nlist" -> nlist.toString, "seed" -> "42"), "l2").build(train)
      artifact.data.cache().count()
      val lo = artifact.meta("lo").split(",").map(_.toFloat)
      val hi = artifact.meta("hi").split(",").map(_.toFloat)
      val (qids, qVecs) = LocalScan.queryVecsAlways(test)
      val cents = IvfModel.centroidsOf(artifact)
      val ct = LocalScan.codeTable(artifact.data, ivf = true).get
      val probes = AdcScan.coarseProbes(qVecs, cents, nlist, nprobe)

      // interleaved min-of-reps: this box sees invisible CPU steal from
      // co-tenants (run-to-run swings of 2-5×); interleaving the
      // contenders and taking each one's MINIMUM cancels the drift
      val inline = new AdcScan.Sq8Scorer(AdcScan.LocalLut(qVecs), lo, hi, 0)
      val stridedSc = new AdcScan.Sq8FastScorer(AdcScan.LocalLut(qVecs), lo, hi, 0)
      val inlinePerRow = new AdcScan.Scorer {
        def score(qidx: Int, cid: Int, codes: Array[Byte], off: Int, len: Int): Double =
          inline.score(qidx, cid, codes, off, len)
        // inherits the default per-row scoreChunk
      }
      val variants: Seq[(String, () => Unit)] = Seq(
        ("lut_tiled", () => {
          val luts = Sq8Model.luts(qVecs, lo, hi, 0)
          val sc = new AdcScan.PqLutScorer(AdcScan.LocalLut(luts), sqrtOut = true)
          LocalScan.scanCodesIvf(spark, ct, qids, 20, sc, probes).collect(): Unit
        }),
        ("inline_tiled", () =>
          LocalScan.scanCodesIvf(spark, ct, qids, 20, inline, probes).collect(): Unit),
        ("fast_gram", () =>
          LocalScan.scanCodesIvf(spark, ct, qids, 20, stridedSc, probes).collect(): Unit),
        ("inline_per_row", () =>
          LocalScan.scanCodesIvf(spark, ct, qids, 20, inlinePerRow, probes).collect(): Unit))
      variants.foreach { case (_, f) => f(); f() } // warm all
      val reps = 12
      val best = scala.collection.mutable.Map.empty[String, Double]
      (1 to reps).foreach { _ =>
        variants.foreach { case (label, f) =>
          val t0 = System.nanoTime()
          f()
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms < best.getOrElse(label, Double.MaxValue)) best(label) = ms
        }
      }
      variants.foreach { case (label, _) =>
        println(f"$name%-8s $label%-24s ${best(label)}%8.2fms min-of-$reps")
      }
      train.unpersist(); test.unpersist(); artifact.data.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
