package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** In-context A/B for the CHUNKED SIMD iwsum (r12): production
  * `Sq8FastScorer` scan, int16+SIMD-chunk vs the double-lookup wsum,
  * at the three baseline ivf_sq8 shapes (glove50 50-d, random 64-d,
  * msmarco 384-d). The r12 per-row SIMD kernel LOST at 50-64-d
  * (glove50 99.6k → 51.1k QPS) to per-row overheads — this probe
  * decides whether the chunk form (weights widened once per tile, two
  * rows in flight) flips that, i.e. where `useInt16`'s dim gate should
  * sit now. The prop is read at scorer CONSTRUCTION, so each arm
  * builds its scorer under its own forced -Dgraft.sq8.int16; scans
  * interleave with per-arm minimums (CPU-steal defense). */
object Sq8ChunkAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()
    for ((name, n, dims, nQ, nlist, nprobe, clusters) <- Seq(
      ("glove50", 20000, 50, 256, 256, 20, 128),
      ("random", 20000, 64, 256, 256, 32, 0),
      ("msmarco", 100000, 384, 70, 256, 24, 512))) {
      val train0 =
        if (clusters > 0)
          RandomDataset.clusteredVectors(spark, n, dims, clusters, 1.2, 42,
            centerSeed = 7, intrinsicDim = math.min(64, dims), overlap = 0.7)
        else RandomDataset.vectors(spark, n, dims, 42)
      val test0 =
        if (clusters > 0)
          RandomDataset.clusteredVectors(spark, nQ, dims, clusters, 1.2, 43,
            centerSeed = 7, intrinsicDim = math.min(64, dims), overlap = 0.7)
        else RandomDataset.vectors(spark, nQ, dims, 43)
      def norm(df: org.apache.spark.sql.DataFrame) =
        if (name == "msmarco") df.withColumn("vector",
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

      def mkScorer(int16: String): AdcScan.Sq8FastScorer = {
        sys.props("graft.sq8.int16") = int16
        try new AdcScan.Sq8FastScorer(AdcScan.LocalLut(qVecs), lo, hi, 0)
        finally sys.props.remove("graft.sq8.int16")
      }
      val arms: Seq[(String, AdcScan.Sq8FastScorer)] = Seq(
        ("wsum_double", mkScorer("false")),
        ("int16_chunk", mkScorer("true")))
      arms.foreach { case (_, sc) =>
        val r = LocalScan.scanCodesIvf(spark, ct, qids, 20, sc, probes).collect()
        require(r.nonEmpty)
      }
      val reps = 12
      val best = scala.collection.mutable.Map.empty[String, Double]
      (1 to reps).foreach { _ =>
        arms.foreach { case (label, sc) =>
          val t0 = System.nanoTime()
          LocalScan.scanCodesIvf(spark, ct, qids, 20, sc, probes).collect(): Unit
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms < best.getOrElse(label, Double.MaxValue)) best(label) = ms
        }
      }
      arms.foreach { case (label, _) =>
        val qps = nQ / (best(label) / 1e3)
        println(f"$name%-8s $label%-12s ${best(label)}%8.2f ms  ${qps}%9.0f QPS  min-of-$reps")
      }
      train.unpersist(); test.unpersist(); artifact.data.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
