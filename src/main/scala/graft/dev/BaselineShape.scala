package graft.dev

import org.apache.spark.sql.SparkSession

import graft.harness.BaselineCompare

/** dev aid: run the reference BASELINE workload shape (random 20k × 64-d,
  * 256 queries, k=20, L2 — BASELINE.md primary run) through every
  * algorithm family and print recall/QPS next to the reference's
  * published numbers. The same comparison feeds the bench artifact via
  * [[graft.harness.BaselineCompare]]. */
object BaselineShape {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(BaselineCompare.table(BaselineCompare.run(spark)))
    spark.stop()
  }
}
