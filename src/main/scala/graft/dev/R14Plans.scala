package graft.dev

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** r14 optimization-round evidence dumper: writes the
  * `.explain("formatted")` output of named `SparkEntry.queries` entries
  * to `plans/r14/<name>_<tag>.txt` — the before/after plan artifacts the
  * optimization round commits alongside OPTIMIZATION_r14.md.
  *
  * Usage: runMain graft.dev.R14Plans <dir> <tag> [q1,q2,...]
  *   (no query list = every declared query)
  */
object R14Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val tag = args.lift(1).getOrElse("before")
    val names = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PART", "64k"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.warmFixtures(spark, dir)
    catch { case e: Throwable =>
      System.err.println(s"[r14plans] warmFixtures failed: ${e.getMessage}") }

    Files.createDirectories(Paths.get("plans/r14"))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.write(Paths.get(s"plans/r14/${name}_$tag.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        println(s"[r14plans] wrote plans/r14/${name}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[r14plans] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
