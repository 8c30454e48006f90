package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.KnnJoin

/** dev aid: dump formatted physical plans for the hot operators */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("===== J1 exact kNN join =====")
    KnnJoin.knnJoin(Tables.embQueries(spark, dir), Tables.embBase(spark, dir),
      10, "l2").explain("formatted")

    println("===== scan pruning: projection+filter reach parquet =====")
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_quantity") > 40)
      .select(col("l_orderkey"), col("l_quantity"))
      .explain("formatted")

    spark.stop()
  }
}
