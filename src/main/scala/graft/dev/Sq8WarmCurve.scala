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
    // arg 2 = "msmarco" switches to the 100k × 384-d / 70-query
    // normalized shape (the 0.40× baseline row, nprobe 24) — added r14
    // to locate where that row's serve curve reaches steady state
    val msmarco = args.lift(1).contains("msmarco")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()
    def vecs(n: Long, seed: Long) = {
      val raw =
        if (msmarco) RandomDataset.clusteredVectors(spark, n, 384, 512, 1.2,
          seed, centerSeed = 7, intrinsicDim = 64, overlap = 0.7)
        else RandomDataset.clusteredVectors(spark, n, 50, 200, 1.1, seed,
          centerSeed = 7)
      if (msmarco) raw.withColumn("vector",
        graft.functions.VectorFunctions.vec_normalize(col("vector")))
      else raw
    }
    val train = vecs(if (msmarco) 100000 else 20000, 42).cache()
    val test = vecs(if (msmarco) 70 else 256, 43)
      .withColumnRenamed("id", "qid").cache()
    train.count(); test.count()
    val nprobe = if (msmarco) "24" else "5"
    val params: Map[String, String] = algo match {
      case "ivf_flat" => Map("nlist" -> "100", "nprobe" -> nprobe,
        "strided_accum" -> "true")
      case "ivf_pq" => Map("nlist" -> "100", "m" -> "10", "nbits" -> "8",
        "nprobe" -> nprobe, "train_iters" -> "25", "strided_accum" -> "true")
      // the glove50 baseline row's exact config (BaselineCompare
      // algoTable hnsw: m=16, efc=200, ef=56) — r14, for the weak-row
      // warm-curve question
      case "hnsw_global" => Map("m" -> "16", "ef_construction" -> "200",
        "ef_search" -> "56")
      case _ => Map("nlist" -> "256", "nprobe" -> nprobe,
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
    // arg 3 = "staged": replace the e2e curve with a per-call STAGED
    // curve (IvfSq8Searcher's pipeline replicated) — must be the first
    // serving this JVM does, so the per-stage descent IS the warm-up
    val stagedMode = args.lift(2).contains("staged")
    if (!stagedMode) {
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
    }
    if (stagedMode && !(msmarco && algo == "ivf_sq8"))
      println("[staged] unsupported combination — staged mode replicates " +
        "IvfSq8Searcher's pipeline and needs `ivf_sq8 msmarco staged`")
    if (stagedMode && msmarco && algo == "ivf_sq8") {
      val lo = artifact.meta("lo").split(",").map(_.toFloat)
      val hi = artifact.meta("hi").split(",").map(_.toFloat)
      val q = test.select(col("qid").cast("long").as("qid"), col("vector"))
      val cents = IvfModel.centroidsOf(artifact)
      val nlist = cents.map(_._1).max + 1
      val ct = LocalScan.codeTable(artifact.data, ivf = true).get
      val (qids, qv) = LocalScan.queryVecsAlways(test)
      val staged = (1 to 25).map { _ =>
        val t0 = System.nanoTime()
        val probes = AdcScan.probesAuto(q, qids, qv, cents, nlist, 24,
          artifact.aux("centroids"))
        val t1 = System.nanoTime()
        val sc = new AdcScan.Sq8FastScorer(AdcScan.LocalLut(qv), lo, hi, 0)
        sc.precomputeNorms(ct.codes)
        val t2 = System.nanoTime()
        LocalScan.scanCodesIvf(spark, ct, qids, 20, sc, probes).collect()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e6, (t2 - t1) / 1e6, (t3 - t2) / 1e6)
      }
      staged.foreach { case (p, s, sc) =>
        println(f"[staged] probes=$p%6.2f scorer=$s%6.2f scan+collect=$sc%6.2f") }
    }
    spark.stop()
  }
}
