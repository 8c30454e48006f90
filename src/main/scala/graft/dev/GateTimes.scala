package graft.dev

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Local replica of the driver's gate timing under the frozen
  * methodology: every `SparkEntry.queries` entry executed in TWO
  * interleaved passes (listed order, then reversed), per-query min,
  * sorted table + total. Establishes the expected total on a widened
  * gate basis so cross-round comparisons stay honest.
  *
  * Usage: runMain graft.dev.GateTimes [dir=/root/testdata/sf0.01]
  */
object GateTimes {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PART", "64k"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.Registry.init()
    SparkEntry.warmFixtures(spark, dir)

    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    val passA = names.map(n => n -> timeOne(n)).toMap
    val passB = names.reverse.map(n => n -> timeOne(n)).toMap
    val mins = names.map(n => n -> math.min(passA(n), passB(n)))
    mins.sortBy(-_._2).foreach { case (n, s) =>
      println(f"[gatetime] $n%-28s ${s}%7.2f s")
    }
    println(f"[gatetime] TOTAL (${names.size} queries, min of 2) " +
      f"${mins.map(_._2).sum}%.2f s  (passA ${passA.values.sum}%.2f, passB ${passB.values.sum}%.2f)")
    spark.stop()
  }
}
