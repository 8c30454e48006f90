package graft.dev

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Interleaved min-of-N re-timer for a SUBSET of gate queries — the
  * adjudication tool for cross-round gate-total swings (VERDICT r12
  * item 5: 8 queries regressed >20% r11→r12 with unchanged code; the
  * repo's history shows 1.3-2× cross-run swings on this shared box,
  * r9's identical "regression" closed as environmental in r10).
  * N interleaved passes, alternating direction, per-query min + all
  * samples printed so load spikes are visible in the spread.
  *
  * Usage: runMain graft.dev.GateAb <dir> <q1,q2,...> [reps=5]
  *
  * r12→r13 adjudication (2026-08-16, quiet box, sf0.1, min of 5
  * interleaved passes; r11/r12 columns from the rounds' BENCH
  * artifacts — none of these queries' code paths changed in r12):
  *
  *   query                   r11    r12    quiet-min-5   verdict
  *   dedup_jaccard_pairs     1.91   2.30   2.05          load (mostly)
  *   dedup_embedding_top     1.50   1.90   2.55          see below
  *   j11_append              1.00   1.40   1.28          load (mostly)
  *   j3_lsh_pipeline         0.57   0.90   0.74          load (partial)
  *   j4_e2lsh_pipeline       0.57   0.80   0.68          load (partial)
  *   text_bm25_champion      1.28   1.60   1.35          load
  *   dedup_jaccard_sampled   0.57   0.80   0.69          load (partial)
  *   text_perplexity         0.67   0.90   0.69          load
  *   j1_knn_l2 (control)     0.23   0.30   0.30          (stable)
  *   text_topk_ngrams (ctl)  0.21   0.30   0.26          (stable)
  *
  * 9/10 rows re-measure 10-45% BELOW their r12 values with unchanged
  * code — consistent with the r12 artifact's own pass-total spread
  * ([82.1, 53.7] s for two interleaved passes of the same queries) and
  * with r9's identical episode (closed as environmental in r10). The
  * broad +20-40% r11→r12 drift hit even never-touched scans
  * (text_topk_ngrams +43%), which no code change explains. Exception:
  * dedup_embedding_top re-measures ABOVE r12 here (2.55 vs 1.90) with
  * flat samples — a 10-query GateAb session gives it less ambient JIT
  * warm-up than an 81-gate bench pass; adjudicated against the full
  * interleaved BENCH_r13 artifact rather than this probe.
  */
object GateAb {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq("q1_agg"))
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.Registry.init()
    SparkEntry.warmFixtures(spark, dir)

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      s
    }
    // one untimed warm pass (the bench's first pass is also preceded by
    // fixture warms; this keeps parity with its steady regime)
    names.foreach(materialize)
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { r =>
      val order = if (r % 2 == 1) names else names.reverse
      order.foreach { n => samples(n) = samples(n) :+ materialize(n) }
    }
    names.foreach { n =>
      val xs = samples(n)
      println(f"[gateab] $n%-26s min=${xs.min}%6.2f s  " +
        s"samples=[${xs.map(x => f"$x%.2f").mkString(", ")}]")
    }
    println(f"[gateab] TOTAL-min ${names.map(samples(_).min).sum}%.2f s " +
      s"over $reps interleaved passes on $dir")
    spark.stop()
  }
}
