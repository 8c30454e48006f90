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
