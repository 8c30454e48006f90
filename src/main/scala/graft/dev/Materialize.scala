package graft.dev

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** dev aid: compare materialization strategies for Bench timing */
object Materialize {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("t1_global_topk", "st_window_agg", "text_langid", "j9_pq_adc")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      var t0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
      println(f"[mat] $name%-22s toRdd   ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"[mat] $name%-22s noop    ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    spark.stop()
  }
}
