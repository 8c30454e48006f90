package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators._
import graft.sources.RandomDataset

/** Stage breakdown of the ivf_sq8 serve batch at the random baseline
  * shape (the 0.16× row): where do the ~6 ms per 256-query batch go
  * when the wsum kernel itself accounts for ~1 ms? */
object Sq8StageProfile {
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
    val params = Map("nlist" -> "256", "nprobe" -> "32",
      "strided_accum" -> "true")
    val searcher = Registry.searcher("ivf_sq8", params, "l2")
    // end-to-end
    (1 to 3).foreach(_ => searcher.search(artifact, test, 20).collect())
    val e2e = (1 to 7).map { _ =>
      val t0 = System.nanoTime()
      searcher.search(artifact, test, 20).collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"e2e: ${e2e * 1e3}%.2fms qps=${256 / e2e}%.0f")

    // stages, replicated from IvfSq8Searcher
    val lo = artifact.meta("lo").split(",").map(_.toFloat)
    val hi = artifact.meta("hi").split(",").map(_.toFloat)
    val q = test.select(col("qid").cast("long").as("qid"), col("vector"))
    val cents = IvfModel.centroidsOf(artifact)
    val nlist = cents.map(_._1).max + 1
    val ct = LocalScan.codeTable(artifact.data, ivf = true).get
    val (qids, qv) = LocalScan.queryVecsAlways(test)
    (1 to 3).foreach { _ =>
      val probes = AdcScan.probesAuto(q, qids, qv, cents, nlist, 32,
        artifact.aux("centroids"))
      val sc = new AdcScan.Sq8FastScorer(AdcScan.LocalLut(qv), lo, hi, 0)
      sc.precomputeNorms(ct.codes)
      LocalScan.scanCodesIvf(spark, ct, qids, 20, sc, probes).collect()
    }
    val best = (1 to 7).map { _ =>
      val t0 = System.nanoTime()
      val probes = AdcScan.probesAuto(q, qids, qv, cents, nlist, 32,
        artifact.aux("centroids"))
      val t1 = System.nanoTime()
      val sc = new AdcScan.Sq8FastScorer(AdcScan.LocalLut(qv), lo, hi, 0)
      sc.precomputeNorms(ct.codes)
      val t2 = System.nanoTime()
      val df = LocalScan.scanCodesIvf(spark, ct, qids, 20, sc, probes)
      val t3 = System.nanoTime()
      df.collect()
      val t4 = System.nanoTime()
      (t1 - t0, t2 - t1, t3 - t2, t4 - t3, t4 - t0)
    }.minBy(_._5)
    println(f"probes=${best._1 / 1e3}%6.0fus scorer+norms=${best._2 / 1e3}%6.0fus " +
      f"scan+pack=${best._3 / 1e3}%6.0fus collect=${best._4 / 1e3}%6.0fus " +
      f"total=${best._5 / 1e6}%5.2fms")
    spark.stop()
  }
}
