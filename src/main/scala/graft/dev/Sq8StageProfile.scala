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
    // args: [msmarco|glove50] switch shapes (default: random 20k x 64)
    val msmarco = args.headOption.contains("msmarco")
    val glove50 = args.headOption.contains("glove50")
    val nprobeN = if (msmarco) 24 else if (glove50) 5 else 32
    def vecs(n: Long, seed: Long) = {
      val raw =
        if (msmarco) RandomDataset.clusteredVectors(spark, n, 384, 512, 1.2,
          seed, centerSeed = 7, intrinsicDim = 64, overlap = 0.7)
        else if (glove50) RandomDataset.clusteredVectors(spark, n, 50, 200,
          1.1, seed, centerSeed = 7)
        else RandomDataset.vectors(spark, n, 64, seed)
      if (msmarco) raw.withColumn("vector",
        graft.functions.VectorFunctions.vec_normalize(col("vector")))
      else raw
    }
    val train = vecs(if (msmarco) 100000 else 20000, 42).cache()
    val test = vecs(if (msmarco) 70 else 256, 43)
      .withColumnRenamed("id", "qid").cache()
    train.count(); test.count()
    val artifact = Registry.indexer("ivf_sq8",
      Map("nlist" -> "256", "seed" -> "42"), "l2").build(train)
    artifact.data.cache().count()
    val params = Map("nlist" -> "256", "nprobe" -> nprobeN.toString,
      "strided_accum" -> "true")
    val searcher = Registry.searcher("ivf_sq8", params, "l2")
    val nq = if (msmarco) 70 else 256
    // end-to-end
    (1 to 3).foreach(_ => searcher.search(artifact, test, 20).collect())
    val e2e = (1 to 7).map { _ =>
      val t0 = System.nanoTime()
      searcher.search(artifact, test, 20).collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"e2e: ${e2e * 1e3}%.2fms qps=${nq / e2e}%.0f")

    // stages, replicated from IvfSq8Searcher
    val lo = artifact.meta("lo").split(",").map(_.toFloat)
    val hi = artifact.meta("hi").split(",").map(_.toFloat)
    val q = test.select(col("qid").cast("long").as("qid"), col("vector"))
    val cents = IvfModel.centroidsOf(artifact)
    val nlist = cents.map(_._1).max + 1
    val ct = LocalScan.codeTable(artifact.data, ivf = true).get
    val (qids, qv) = LocalScan.queryVecsAlways(test)
    (1 to 3).foreach { _ =>
      val probes = AdcScan.probesAuto(q, qids, qv, cents, nlist, nprobeN,
        artifact.aux("centroids"))
      val sc = new AdcScan.Sq8FastScorer(AdcScan.LocalLut(qv), lo, hi, 0)
      sc.precomputeNorms(ct.codes)
      LocalScan.scanCodesIvf(spark, ct, qids, 20, sc, probes).collect()
    }
    val best = (1 to 7).map { _ =>
      val t0 = System.nanoTime()
      val probes = AdcScan.probesAuto(q, qids, qv, cents, nlist, nprobeN,
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

    // same-JVM interleaved A/B: list-major (Sq8FastScorer default) vs a
    // delegating wrapper that forces the query-major pass
    locally {
      val probes = AdcScan.probesAuto(q, qids, qv, cents, nlist, nprobeN,
        artifact.aux("centroids"))
      val fast = new AdcScan.Sq8FastScorer(AdcScan.LocalLut(qv), lo, hi, 0)
      fast.precomputeNorms(ct.codes)
      val queryMajor = new AdcScan.Scorer {
        override def prefersListMajor: Boolean = false
        def score(qidx: Int, cid: Int, codes: Array[Byte], off: Int, len: Int): Double =
          fast.score(qidx, cid, codes, off, len)
        override def scoreChunk(qidx: Int, cid: Int, codes: Array[Byte],
            off0: Int, stride: Int, nRows: Int, out: Array[Double]): Unit =
          fast.scoreChunk(qidx, cid, codes, off0, stride, nRows, out)
      }
      def run(sc: AdcScan.Scorer): Long = {
        val t0 = System.nanoTime()
        LocalScan.scanCodesIvf(spark, ct, qids, 20, sc, probes).collect()
        System.nanoTime() - t0
      }
      // wsum (pre-r10 double-lookup) scorer for the kernel A/B
      sys.props("graft.sq8.int16") = "false"
      val wsumScorer = new AdcScan.Sq8FastScorer(AdcScan.LocalLut(qv), lo, hi, 0)
      sys.props.remove("graft.sq8.int16")
      wsumScorer.precomputeNorms(ct.codes)
      val wsumQueryMajor = new AdcScan.Scorer {
        override def prefersListMajor: Boolean = false
        def score(qidx: Int, cid: Int, codes: Array[Byte], off: Int, len: Int): Double =
          wsumScorer.score(qidx, cid, codes, off, len)
        override def scoreChunk(qidx: Int, cid: Int, codes: Array[Byte],
            off0: Int, stride: Int, nRows: Int, out: Array[Double]): Unit =
          wsumScorer.scoreChunk(qidx, cid, codes, off0, stride, nRows, out)
      }
      // label honestly: `fast` only takes the list-major pass when the
      // router's 64 KB avg-list gate admits it (msmarco-shape lists);
      // at the ~5 KB random/glove50 shapes both columns are query-major
      val lmLabel =
        if (LocalScan.avgListBytes(ct) >= (64 << 10)) "list-major"
        else "routed(query-major)"
      (1 to 3).foreach { _ => run(fast); run(queryMajor); run(wsumQueryMajor) }
      (1 to 3).foreach { _ =>
        val lm = (1 to 5).map(_ => run(fast)).min
        val qm = (1 to 5).map(_ => run(queryMajor)).min
        val ws = (1 to 5).map(_ => run(wsumQueryMajor)).min
        println(f"A/B scan: $lmLabel=${lm / 1e6}%6.1fms query-major-int16=${qm / 1e6}%6.1fms query-major-wsum=${ws / 1e6}%6.1fms")
      }
      // fresh-scorer-per-run A/Bs (what production actually does: a new
      // Sq8FastScorer per serve batch) — isolates per-batch lazy-init
      // cost and fused-vs-two-phase with the init included
      def runFresh(int16: Boolean): Long = {
        if (!int16) sys.props("graft.sq8.int16") = "false"
        val sc = new AdcScan.Sq8FastScorer(AdcScan.LocalLut(qv), lo, hi, 0)
        if (!int16) sys.props.remove("graft.sq8.int16")
        sc.precomputeNorms(ct.codes)
        val t0 = System.nanoTime()
        LocalScan.scanCodesIvf(spark, ct, qids, 20, sc, probes).collect()
        System.nanoTime() - t0
      }
      def runFreshFused(): Long = {
        val sc = new AdcScan.Sq8FastScorer(AdcScan.LocalLut(qv), lo, hi, 0)
        sc.precomputeNorms(ct.codes)
        val t0 = System.nanoTime()
        LocalScan.scanCodesIvfFused(spark, ct, qids, qv, 20, sc, cents,
          nprobeN).collect()
        System.nanoTime() - t0
      }
      (1 to 3).foreach { _ => runFresh(true); runFresh(false); runFreshFused() }
      (1 to 3).foreach { _ =>
        val fi = (1 to 5).map(_ => runFresh(true)).min
        val fw = (1 to 5).map(_ => runFresh(false)).min
        val ff = (1 to 5).map(_ => runFreshFused()).min
        println(f"A/B fresh: two-phase-int16=${fi / 1e6}%6.1fms two-phase-wsum=${fw / 1e6}%6.1fms fused-int16=${ff / 1e6}%6.1fms")
      }
      // warm e2e (the searcher path, measured LAST — the opening e2e
      // number runs JIT-cold and has overstated the serve batch by 2-4x
      // on this box); int16 off reconstructs the r9 kernel inside the
      // current dispatch
      def e2eOnce(int16: Boolean): Long = {
        if (!int16) sys.props("graft.sq8.int16") = "false"
        val t0 = System.nanoTime()
        searcher.search(artifact, test, 20).collect()
        val dt = System.nanoTime() - t0
        if (!int16) sys.props.remove("graft.sq8.int16")
        dt
      }
      (1 to 3).foreach { _ => e2eOnce(true); e2eOnce(false) }
      (1 to 3).foreach { _ =>
        val a = (1 to 5).map(_ => e2eOnce(true)).min
        val b = (1 to 5).map(_ => e2eOnce(false)).min
        println(f"A/B warm e2e: int16=${a / 1e6}%6.2fms (qps=${nq * 1e9 / a}%6.0f) wsum=${b / 1e6}%6.2fms (qps=${nq * 1e9 / b}%6.0f)")
      }
    }
    spark.stop()
  }
}
