package graft

import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring `scripts/run_full_benchmark.py --config X`
  * (reference §3.1 primary lifecycle): parse config → BenchmarkRunner →
  * timestamped output dir with JSON/markdown/SVG reports.
  *
  * Usage: runMain graft.Main <config.(yaml|json)> [outputDir]
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Main <config.yaml|json> [outputDir]")
    val configPath = args(0)
    val ts = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
    val outputDir = args.lift(1).getOrElse(s"benchmark_results/benchmark_$ts")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-benchmark")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      harness.BenchmarkRunner.run(spark, configPath, outputDir)
      println(s"[graft] benchmark complete → $outputDir")
    } finally spark.stop()
  }
}
